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


@pytest.mark.slow
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


def test_prepare_sft_dataset_masks_prompt():
    from onebit_tpu.train.data import IGNORE_INDEX, prepare_sft_dataset
    tokenize = lambda s: [ord(c) % 90 + 3 for c in s]
    batch = prepare_sft_dataset([("ab", "xyz"), ("long prompt", "r")],
                                tokenize, cutoff_len=32, eos_id=2, pad_id=0)
    ids, labels, attn = (batch["input_ids"], batch["labels"],
                         batch["attention_mask"])
    assert ids.shape == labels.shape == attn.shape
    # prompt region masked
    assert (labels[0, :2] == IGNORE_INDEX).all()
    # response region present and ends with eos
    resp = labels[0][labels[0] != IGNORE_INDEX]
    assert resp[-1] == 2 and len(resp) == 4  # xyz + eos
    # padding masked in both labels and attention
    pad_start = attn[0].sum()
    assert (labels[0, pad_start:] == IGNORE_INDEX).all()


def test_sft_train_step_no_teacher():
    """Pure-CE step (SFT stage): runs without a teacher, loss decreases
    frozen-param invariants hold."""
    import jax
    import jax.numpy as jnp
    from onebit_tpu.model.bitllama import init_params
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.train.losses import KDConfig
    from onebit_tpu.train.trainer import (TrainConfig, init_train_state,
                                          make_train_step)

    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    cfg = KDConfig(kd_alpha=0.0, kd_loss_scale=0.0, kd_beta=0.0)
    tr = TrainConfig(warmup_steps=0, total_steps=10)
    state = init_train_state(params, tr)
    step = make_train_step(config, cfg, tr, compute_dtype=jnp.float32,
                           donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                             config.vocab_size)
    batch = {"input_ids": ids, "labels": ids}
    new_state, metrics = step(state, None, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) == pytest.approx(
        float(metrics["student_loss"]))


@pytest.mark.slow
def test_run_sft_and_predictions(tmp_path):
    import jax
    import jax.numpy as jnp
    from onebit_tpu.model.bitllama import init_params
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.train.run_kd import KDRunConfig
    from onebit_tpu.train.run_sft import run_sft, save_predictions
    from onebit_tpu.train.trainer import TrainConfig

    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    tokenize = lambda s: [ord(c) % 200 + 5 for c in s]
    pairs = [("what is", "an answer"), ("compute", "42")]
    state = run_sft(config, params, pairs, tokenize,
                    train_cfg=TrainConfig(warmup_steps=0),
                    run_cfg=KDRunConfig(output_dir=str(tmp_path),
                                        batch_size=2, max_steps=2,
                                        log_steps=1, mesh_shape=(1, 1),
                                        compute_dtype=jnp.float32,
                                        plot=False))
    assert int(state.step) == 2

    path = save_predictions(str(tmp_path), state.params, config,
                            ["a prompt"], ["gold"], tokenize,
                            lambda toks: " ".join(map(str, toks)),
                            max_new_tokens=4)
    line = json.loads(open(path).read().strip())
    assert set(line) == {"label", "predict"}


def test_template_registry():
    from onebit_tpu.train.templates import REGISTRY, get_template
    assert len(REGISTRY) == 18
    assert get_template("vanilla").render("hi") == "hi"
    assert get_template("vicuna").render("hi").endswith("USER: hi ASSISTANT:")
    out = get_template("default").render("q2", history=[("q1", "a1")])
    assert "q1" in out and "a1" in out and out.index("q1") < out.index("q2")
    # data pipeline still resolves template names
    from onebit_tpu.train.data import TEMPLATES
    assert TEMPLATES["alpaca"]("do x").startswith("Below is an instruction")
