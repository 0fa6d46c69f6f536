"""Rejection paths of the pre-flight arg cross-validation
(train/validate.py — the reference get_train_args equivalent,
llama_factory/llamafactory/core.py:81-215)."""

import dataclasses

import numpy as np
import pytest

from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.train.losses import KDConfig
from onebit_tpu.train.run_kd import KDRunConfig
from onebit_tpu.train.trainer import TrainConfig
from onebit_tpu.train.validate import (
    ConfigError,
    validate_kd,
    validate_model_config,
    validate_run,
    validate_train,
    validate_train_run,
)

TINY = BitLlamaConfig.named("tiny")


def _expect(rule, fn, *args, **kwargs):
    with pytest.raises(ConfigError, match=rf"\[{rule}\]"):
        fn(*args, **kwargs)


def test_model_geometry_rules():
    validate_model_config(TINY)  # baseline passes
    # head/GQA divisibility already rejected at config construction
    with pytest.raises(ValueError, match="divisible by num_attention"):
        dataclasses.replace(TINY, num_attention_heads=3)
    with pytest.raises(ValueError, match="multiple of num_key_value"):
        dataclasses.replace(TINY, num_key_value_heads=3)
    _expect("pack-divisibility", validate_model_config,
            dataclasses.replace(TINY, hidden_size=48,
                                num_attention_heads=4,
                                num_key_value_heads=2))


def test_kd_rules():
    validate_kd(KDConfig(), TINY)
    _expect("kd-alpha-range", validate_kd, KDConfig(kd_alpha=1.5), TINY)
    _expect("kd-scale-positive", validate_kd,
            KDConfig(kd_loss_scale=0.0), TINY)
    _expect("kd-beta-gamma-sign", validate_kd, KDConfig(kd_beta=-1.0), TINY)


def test_kd_teacher_cross_rules():
    wide = dataclasses.replace(TINY, hidden_size=TINY.hidden_size * 2,
                               num_attention_heads=8, num_key_value_heads=4)
    _expect("teacher-vocab-match", validate_kd, KDConfig(), TINY,
            dataclasses.replace(TINY, vocab_size=TINY.vocab_size + 1))
    _expect("teacher-hidden-match", validate_kd, KDConfig(kd_beta=1.0),
            TINY, wide)
    _expect("teacher-depth-match", validate_kd, KDConfig(kd_beta=1.0),
            TINY, dataclasses.replace(TINY, num_hidden_layers=5))
    _expect("teacher-heads-match", validate_kd, KDConfig(kd_gamma=1.0),
            TINY, dataclasses.replace(TINY, num_attention_heads=8,
                                      num_key_value_heads=2))
    # hidden/attn losses off -> only vocab must match
    validate_kd(KDConfig(), TINY, wide)


def test_train_schedule_rules():
    validate_train(TrainConfig())
    _expect("lr-positive", validate_train, TrainConfig(learning_rate=0))
    _expect("adam-beta-range", validate_train, TrainConfig(adam_beta2=1.0))
    _expect("wd-sign", validate_train, TrainConfig(weight_decay=-0.1))
    _expect("accum-positive", validate_train, TrainConfig(grad_accum_steps=0))
    _expect("schedule-known", validate_train, TrainConfig(lr_schedule="warp"))
    _expect("min-lr-range", validate_train, TrainConfig(min_lr_ratio=2.0))
    _expect("warmup-vs-total", validate_train,
            TrainConfig(warmup_steps=100, total_steps=100))
    _expect("clip-positive", validate_train, TrainConfig(max_grad_norm=0.0))


def test_run_shape_rules(tmp_path):
    run = KDRunConfig(output_dir=str(tmp_path / "out"))
    validate_run(run, TINY, n_blocks=8, block_len=16)
    _expect("batch-positive", validate_run,
            dataclasses.replace(run, batch_size=0), TINY)
    _expect("steps-positive", validate_run,
            dataclasses.replace(run, save_steps=0), TINY)
    _expect("max-steps-positive", validate_run,
            dataclasses.replace(run, max_steps=0), TINY)
    _expect("val-split-range", validate_run,
            dataclasses.replace(run, val_split=1.0), TINY)
    _expect("batch-vs-mesh", validate_run, run, TINY, n_data_devices=3)
    _expect("dataset-vs-batch", validate_run, run, TINY, n_blocks=2)
    _expect("cutoff-vs-ctx", validate_run, run, TINY,
            block_len=TINY.max_position_embeddings + 1)
    _expect("resume-exists", validate_run,
            dataclasses.replace(run, resume_from=str(tmp_path / "nope")),
            TINY)


def test_output_dir_clobber_protection(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    run = KDRunConfig(output_dir=str(out))
    validate_run(run, TINY)  # empty dir is fine
    np.savez(out / "train_state.npz", leaf_0=np.zeros(1))
    _expect("output-dir-clobber", validate_run, run, TINY)
    # explicit resume re-allows it
    validate_run(dataclasses.replace(run, resume_from=str(out)), TINY)


def test_run_kd_rejects_before_any_device_work(tmp_path):
    """The full pre-flight fires from run_kd itself."""
    from onebit_tpu.model.bitllama import init_params
    from onebit_tpu.train.run_kd import run_kd
    import jax

    params = init_params(TINY, jax.random.PRNGKey(0), mode="latent")
    teacher = init_params(TINY, jax.random.PRNGKey(1), mode="latent")
    blocks = np.zeros((4, TINY.max_position_embeddings + 4), np.int32)
    with pytest.raises(ConfigError, match=r"\[cutoff-vs-ctx\]"):
        run_kd(TINY, params, teacher, blocks,
               run_cfg=KDRunConfig(output_dir=str(tmp_path / "o"),
                                   batch_size=2, max_steps=2))


def test_validate_train_run_composes():
    validate_train_run(
        TINY, KDConfig(), TrainConfig(total_steps=10, warmup_steps=1),
        KDRunConfig(output_dir="/tmp/definitely-not-there-xyz"),
        teacher_config=TINY, n_blocks=8, block_len=16)
