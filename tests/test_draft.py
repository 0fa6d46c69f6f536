"""Draft-model recipe (train/draft.py): slice → distill → serve.

The speculative-decoding correctness guarantee (any draft ⇒ identical
greedy output) is covered by tests/test_speculative.py; here we test the
recipe that builds GOOD drafts from a trained student.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.model.bitllama import forward, init_params, pack_model_params
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.train.draft import (build_draft, draft_layer_ids,
                                    latentize_params, slice_draft_params)


@pytest.fixture(scope="module")
def student():
    config = BitLlamaConfig.named("tiny", num_hidden_layers=4)
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def test_layer_ids():
    assert draft_layer_ids(32, 2, "spread") == (0, 31)
    assert draft_layer_ids(32, 2, "first") == (0, 1)
    assert draft_layer_ids(32, 4, "spread") == (0, 10, 21, 31)
    assert draft_layer_ids(4, 4) == (0, 1, 2, 3)          # full = identity
    assert draft_layer_ids(8, 1, "spread") == (7,)
    ids = draft_layer_ids(6, 4, "spread")                 # collisions forced
    assert ids[0] == 0 and ids[-1] == 5
    assert all(b > a for a, b in zip(ids, ids[1:]))
    with pytest.raises(ValueError):
        draft_layer_ids(8, 2, "nope")


def test_slice_picks_layers_and_shares_head(student):
    config, params = student
    ids = (0, 3)
    d = slice_draft_params(params, ids)
    np.testing.assert_array_equal(
        d["layers"]["q_proj"].latent,
        np.asarray(params["layers"]["q_proj"].latent)[list(ids)])
    np.testing.assert_array_equal(
        d["layers"]["input_layernorm"],
        np.asarray(params["layers"]["input_layernorm"])[list(ids)])
    assert d["embed_tokens"] is params["embed_tokens"]
    assert d["lm_head"] is params["lm_head"]

    d_config, d2 = build_draft(params, config, 2, strategy="spread")
    assert d_config.num_hidden_layers == 2
    logits = forward(d2, jnp.zeros((1, 8), jnp.int32), d_config,
                     compute_dtype=jnp.float32)
    assert logits.shape == (1, 8, config.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_latentize_packed_slice(student):
    config, params = student
    packed = pack_model_params(params)
    lat = latentize_params(slice_draft_params(packed, (0, 3)))
    w = lat["layers"]["q_proj"]
    assert w.latent is not None and w.packed is None
    want = np.sign(np.asarray(params["layers"]["q_proj"].latent)[[0, 3]])
    np.testing.assert_array_equal(np.sign(np.asarray(w.latent)), want)
    np.testing.assert_allclose(np.abs(np.asarray(w.latent)), 0.01, atol=1e-7)


@pytest.mark.slow
def test_distill_smoke(student, tmp_path):
    """A few KD steps against the 1-bit student: finite loss, projections
    train, shared/frozen leaves don't."""
    from onebit_tpu.train.draft import distill_draft
    from onebit_tpu.train.run_kd import KDRunConfig
    from onebit_tpu.train.trainer import TrainConfig

    config, params = student
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, config.vocab_size, (16, 32)).astype(np.int32)

    d_config, state = distill_draft(
        params, config, blocks, num_layers=2,
        train_cfg=TrainConfig(learning_rate=1e-3, warmup_steps=1),
        run_cfg=KDRunConfig(output_dir=str(tmp_path), batch_size=4,
                            max_steps=3, save_steps=1000, plot=False,
                            compute_dtype=jnp.float32))
    assert d_config.num_hidden_layers == 2
    assert int(state.step) == 3

    start = slice_draft_params(params, draft_layer_ids(4, 2))
    moved = np.abs(np.asarray(state.params["layers"]["q_proj"].latent)
                   - np.asarray(start["layers"]["q_proj"].latent)).max()
    assert moved > 0
    np.testing.assert_array_equal(np.asarray(state.params["embed_tokens"]),
                                  np.asarray(params["embed_tokens"]))
    np.testing.assert_array_equal(np.asarray(state.params["lm_head"]),
                                  np.asarray(params["lm_head"]))


def test_distill_rejects_hidden_losses(student):
    from onebit_tpu.train.draft import distill_draft
    from onebit_tpu.train.losses import KDConfig

    config, params = student
    with pytest.raises(ValueError, match="logits-only"):
        distill_draft(params, config, np.zeros((8, 16), np.int32),
                      kd_cfg=KDConfig(kd_alpha=1.0, kd_beta=1.0))


def test_engine_spec_with_recipe_draft(student):
    """A sliced draft drives the speculative engine; greedy output is
    token-identical to plain decoding (and the draft is a REAL relative of
    the target, unlike test_speculative's adversarial random draft)."""
    from onebit_tpu.engine.batching import ContinuousBatchingEngine

    config, params = student
    packed = pack_model_params(params)
    d_config, d_params = build_draft(packed, config, 2)

    prompts = [[5, 17, 42, 9], [100, 3, 7]]

    def run(**kw):
        eng = ContinuousBatchingEngine(packed, config, max_batch=4,
                                       max_len=64,
                                       compute_dtype=jnp.float32, **kw)
        uids = [eng.add_request(p, max_new_tokens=8) for p in prompts]
        out = eng.run()
        return [out[u] for u in uids]

    want = run()
    got = run(draft_params=d_params, draft_config=d_config, n_draft=3)
    assert got == want
