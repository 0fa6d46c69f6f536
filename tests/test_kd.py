"""KD loss parity vs torch (the reference's loss definitions, kd.py:34-111)
and a sharded end-to-end train-step smoke test."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from onebit_tpu.model.bitllama import forward, init_params, pack_model_params
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.train.losses import (
    KDConfig,
    causal_ce_loss,
    hidden_state_loss,
    kd_kl_loss,
)
from onebit_tpu.train.trainer import (
    TrainConfig,
    init_train_state,
    make_train_step,
    trainable_mask,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_kl_loss_matches_torch_batchmean():
    s = _rand((3, 7, 11), 0)
    t = _rand((3, 7, 11), 1)
    ref = F.kl_div(F.log_softmax(torch.from_numpy(s), dim=2),
                   F.softmax(torch.from_numpy(t), dim=2),
                   reduction="batchmean").item()
    got = float(kd_kl_loss(jnp.asarray(s), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ce_loss_matches_torch():
    logits = _rand((2, 9, 13), 2)
    labels = np.random.default_rng(3).integers(0, 13, (2, 9))
    labels[0, -2:] = -100
    # HF causal LM loss: shift, ignore -100, mean over valid
    lt = torch.from_numpy(logits)[:, :-1].reshape(-1, 13)
    yt = torch.from_numpy(labels)[:, 1:].reshape(-1)
    ref = F.cross_entropy(lt, yt, ignore_index=-100).item()
    got = float(causal_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_hidden_loss_matches_torch():
    L = 3
    sh = _rand((L + 1, 2, 5, 8), 4)
    th = _rand((L + 1, 2, 5, 8), 5)
    # reference loop (kd.py:85-98)
    ref = 0.0
    for i in range(L):
        t = torch.from_numpy(th[i]).view(-1, 8)
        s = torch.from_numpy(sh[i]).view(-1, 8)
        t = F.normalize(t, p=2, dim=1)
        s = F.normalize(s, p=2, dim=1)
        ref += torch.mean(torch.norm(t - s, p=2, dim=1) ** 2).item()
    got = float(hidden_state_loss(jnp.asarray(sh), jnp.asarray(th), L))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_train_step_smoke():
    """One KD train step on the tiny model: loss finite, only BitLinear
    params move, frozen params unchanged."""
    config = BitLlamaConfig.named("tiny")
    key = jax.random.PRNGKey(0)
    student = init_params(config, key, mode="latent")
    teacher = pack_model_params(init_params(config, jax.random.PRNGKey(1),
                                            mode="latent"))
    kd_cfg = KDConfig(kd_alpha=1.0, kd_beta=1.0, kd_loss_scale=0.01)
    # warmup_steps=0: warmup starts at lr=0, which would make the very first
    # update exactly zero and defeat the "params moved" check below.
    tr_cfg = TrainConfig(total_steps=100, warmup_steps=0)
    state = init_train_state(student, tr_cfg)
    step = make_train_step(config, kd_cfg, tr_cfg,
                           compute_dtype=jnp.float32, donate=False)

    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0,
                             config.vocab_size)
    batch = {"input_ids": ids, "labels": ids}
    new_state, metrics = step(state, teacher, batch)

    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kd_loss"]))
    assert np.isfinite(float(metrics["pkd_loss"]))
    assert int(new_state.step) == 1

    # frozen params identical
    np.testing.assert_array_equal(np.asarray(new_state.params["embed_tokens"]),
                                  np.asarray(state.params["embed_tokens"]))
    np.testing.assert_array_equal(np.asarray(new_state.params["lm_head"]),
                                  np.asarray(state.params["lm_head"]))
    # trainable latent moved
    old_w = np.asarray(state.params["layers"]["q_proj"].latent)
    new_w = np.asarray(new_state.params["layers"]["q_proj"].latent)
    assert not np.array_equal(old_w, new_w)

    # second step runs too
    new_state2, _ = step(new_state, teacher, batch)
    assert int(new_state2.step) == 2


def test_trainable_mask_structure():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    mask = trainable_mask(params)
    flat_p = jax.tree.leaves(params)
    flat_m = jax.tree.leaves(mask)
    assert len(flat_p) == len(flat_m)
    assert any(flat_m) and not all(flat_m)


@pytest.mark.slow
def test_grad_accum_matches_full_batch():
    """grad_accum_steps=2 over batch 4 == single step over batch 4
    (same loss gradient; KL batchmean normalizes per micro-batch so we
    compare against the mean of the micro losses)."""
    config = BitLlamaConfig.named("tiny")
    student = init_params(config, jax.random.PRNGKey(0), mode="latent")
    teacher = pack_model_params(init_params(config, jax.random.PRNGKey(1),
                                            mode="latent"))
    kd_cfg = KDConfig(kd_alpha=0.5, kd_loss_scale=1.0)
    tr_cfg1 = TrainConfig(total_steps=10, warmup_steps=0, grad_accum_steps=1)
    tr_cfg2 = TrainConfig(total_steps=10, warmup_steps=0, grad_accum_steps=2)

    ids = jax.random.randint(jax.random.PRNGKey(2), (4, 12), 0,
                             config.vocab_size)
    batch = {"input_ids": ids, "labels": ids}

    s1 = init_train_state(jax.tree.map(jnp.copy, student), tr_cfg1)
    s2 = init_train_state(jax.tree.map(jnp.copy, student), tr_cfg2)
    step1 = make_train_step(config, kd_cfg, tr_cfg1,
                            compute_dtype=jnp.float32, donate=False)
    step2 = make_train_step(config, kd_cfg, tr_cfg2,
                            compute_dtype=jnp.float32, donate=False)
    n1, m1 = step1(s1, teacher, batch)
    n2, m2 = step2(s2, teacher, batch)
    # losses agree (KL batchmean is linear in batch splitting here since
    # both micro-batches have equal size)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    a = np.asarray(n1.params["layers"]["q_proj"].latent)
    b = np.asarray(n2.params["layers"]["q_proj"].latent)
    # AdamW normalizes by sqrt(v): near-zero grads amplify fp noise, so a
    # loose atol (update magnitude is ~lr=4e-4)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_attention_map_kd_gamma():
    """kd_gamma adds the attention-map term (reference kd.py:100-111)."""
    config = BitLlamaConfig.named("tiny")
    student = init_params(config, jax.random.PRNGKey(0), mode="latent")
    teacher = pack_model_params(init_params(config, jax.random.PRNGKey(1),
                                            mode="latent"))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0,
                             config.vocab_size)
    batch = {"input_ids": ids, "labels": ids}

    cfg_g = KDConfig(kd_alpha=1.0, kd_loss_scale=0.01, kd_gamma=0.5)
    tr = TrainConfig(warmup_steps=0, total_steps=10)
    state = init_train_state(jax.tree.map(jnp.copy, student), tr)
    step = make_train_step(config, cfg_g, tr, compute_dtype=jnp.float32,
                           donate=False)
    _, metrics = step(state, teacher, batch)
    assert "attn_loss" in metrics
    attn_loss = float(metrics["attn_loss"])
    assert np.isfinite(attn_loss) and attn_loss > 0
    # total includes gamma * attn_loss
    base = float(metrics["kd_loss"]) * 0.01
    np.testing.assert_allclose(float(metrics["loss"]),
                               base + 0.5 * attn_loss, rtol=1e-5)


def test_prune_checkpoints(tmp_path):
    """save_total_limit rotation: newest N survive (HF Trainer semantics)."""
    import os
    from onebit_tpu.train.run_kd import _prune_checkpoints

    for step in (5, 10, 15, 200):
        os.makedirs(tmp_path / f"checkpoint-{step}")
    os.makedirs(tmp_path / "not-a-checkpoint")
    _prune_checkpoints(str(tmp_path), keep=2)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["checkpoint-15", "checkpoint-200", "not-a-checkpoint"]
