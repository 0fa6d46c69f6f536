import hashlib
import json
import os

import numpy as np
import pytest

from onebit_tpu.train.data import (
    DatasetInfo,
    batch_iterator,
    checksum,
    chunk_tokens,
    load_registry,
    load_texts,
    prepare_kd_dataset,
    split_dataset,
)


def test_chunk_tokens_reference_semantics():
    """tokenize-concat-chunk: concat + EOS per doc, floor to cutoff_len."""
    lists = [[1, 2, 3], [4, 5], [6, 7, 8, 9]]
    out = chunk_tokens(lists, cutoff_len=4, eos_id=0)
    # stream: 1 2 3 0 4 5 0 6 7 8 9 0  (12 tokens) → 3 blocks of 4
    np.testing.assert_array_equal(
        out, [[1, 2, 3, 0], [4, 5, 0, 6], [7, 8, 9, 0]])


def test_chunk_drops_remainder():
    out = chunk_tokens([[1, 2, 3, 4, 5]], cutoff_len=4, eos_id=None)
    np.testing.assert_array_equal(out, [[1, 2, 3, 4]])


def test_registry_sha1(tmp_path):
    data = [{"text": "hello world"}, {"text": "second doc"}]
    p = tmp_path / "corpus.json"
    p.write_text(json.dumps(data))
    sha = hashlib.sha1(p.read_bytes()).hexdigest()
    (tmp_path / "dataset_info.json").write_text(json.dumps({
        "kd_test": {"file_name": "corpus.json", "file_sha1": sha,
                    "columns": {"prompt": "text"}}}))
    texts = load_texts(str(tmp_path), "kd_test")
    assert texts == ["hello world", "second doc"]


def test_registry_sha1_mismatch(tmp_path):
    (tmp_path / "corpus.json").write_text(json.dumps([{"text": "x"}]))
    (tmp_path / "dataset_info.json").write_text(json.dumps({
        "bad": {"file_name": "corpus.json", "file_sha1": "0" * 40}}))
    with pytest.raises(ValueError, match="checksum"):
        load_texts(str(tmp_path), "bad")


def test_prepare_kd_dataset():
    tokenize = lambda s: [ord(c) % 50 for c in s]
    blocks = prepare_kd_dataset(["abcd", "ef"], tokenize, cutoff_len=4,
                                eos_id=2)
    assert blocks.shape == (2, 4)


def test_split_and_batches():
    blocks = np.arange(40).reshape(10, 4)
    train, val = split_dataset(blocks, val_size=0.2)
    assert len(train) == 8 and len(val) == 2
    it = batch_iterator(train, 3, epochs=1)
    batches = list(it)
    assert len(batches) == 2  # 8 // 3 with drop_last
    assert batches[0]["input_ids"].shape == (3, 4)
    np.testing.assert_array_equal(batches[0]["input_ids"],
                                  batches[0]["labels"])


def test_run_kd_smoke(tmp_path):
    """Two KD steps end-to-end through the driver, with resume."""
    import jax
    import jax.numpy as jnp
    from onebit_tpu.model.bitllama import init_params, pack_model_params
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.train.losses import KDConfig
    from onebit_tpu.train.run_kd import KDRunConfig, run_kd
    from onebit_tpu.train.trainer import TrainConfig

    config = BitLlamaConfig.named("tiny")
    student = init_params(config, jax.random.PRNGKey(0), mode="latent")
    teacher = pack_model_params(init_params(config, jax.random.PRNGKey(1),
                                            mode="latent"))
    blocks = np.random.default_rng(0).integers(
        0, config.vocab_size, (8, 16)).astype(np.int32)
    out = str(tmp_path / "run")
    state = run_kd(config, student, teacher, blocks,
                   kd_cfg=KDConfig(),
                   train_cfg=TrainConfig(warmup_steps=0),
                   run_cfg=KDRunConfig(output_dir=out, batch_size=2,
                                       max_steps=2, log_steps=1,
                                       save_steps=2, mesh_shape=(1, 1),
                                       compute_dtype=jnp.float32,
                                       plot=False))
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(out, "trainer_log.jsonl"))
    assert os.path.exists(os.path.join(out, "checkpoint-2",
                                       "train_state.npz"))
    # resume continues from step 2
    state2 = run_kd(config, student, teacher, blocks,
                    kd_cfg=KDConfig(),
                    train_cfg=TrainConfig(warmup_steps=0),
                    run_cfg=KDRunConfig(
                        output_dir=out, batch_size=2, max_steps=3,
                        log_steps=1, save_steps=10, mesh_shape=(1, 1),
                        compute_dtype=jnp.float32, plot=False,
                        resume_from=os.path.join(out, "checkpoint-2")))
    assert int(state2.step) == 3
