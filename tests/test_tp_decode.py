"""Full TP decode (shard_map, explicit collectives) == single-device decode."""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.model.bitllama import (
    decode_step,
    init_kv_cache,
    init_params,
    pack_model_params,
)
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.tp_decode import make_tp_decode_step, shard_tp_params
from onebit_tpu.parallel.mesh import create_mesh


def test_tp_decode_matches_single_device():
    config = BitLlamaConfig.named("tiny")  # 4 heads, 2 kv heads
    params = pack_model_params(
        init_params(config, jax.random.PRNGKey(0), mode="latent"))
    B, S = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0,
                             config.vocab_size)

    # single-device ground truth: prefill then one decode step
    cache = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    ref_logits, ref_cache = decode_step(params, cache, ids, jnp.int32(0),
                                        config, compute_dtype=jnp.float32)

    mesh = create_mesh((1, 2))
    sparams, _ = shard_tp_params(params, mesh)
    tp_step = make_tp_decode_step(mesh, config, params,
                                  compute_dtype=jnp.float32, impl="xla")
    tp_cache = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    tp_logits, tp_cache = tp_step(sparams, tp_cache, ids, jnp.int32(0))

    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits), rtol=3e-4, atol=3e-4)

    # continue decoding one token on both paths
    nxt = jnp.argmax(ref_logits[:, -1:], axis=-1).astype(jnp.int32)
    ref2, _ = decode_step(params, ref_cache, nxt, jnp.int32(S), config,
                          compute_dtype=jnp.float32)
    tp2, _ = tp_step(sparams, tp_cache, nxt, jnp.int32(S))
    np.testing.assert_allclose(np.asarray(tp2), np.asarray(ref2),
                               rtol=3e-4, atol=3e-4)


def test_tp_greedy_step_token_exact():
    """Local-argmax greedy TP step == argmax of the full-logits path,
    through a 3-token greedy rollout (cache state must stay in sync)."""
    from onebit_tpu.model.tp_decode import make_tp_greedy_step
    config = BitLlamaConfig.named("tiny")
    params = pack_model_params(
        init_params(config, jax.random.PRNGKey(2), mode="latent"))
    B, S = 3, 5
    ids = jax.random.randint(jax.random.PRNGKey(3), (B, S), 0,
                             config.vocab_size)

    mesh = create_mesh((1, 2))
    sparams, _ = shard_tp_params(params, mesh)
    greedy = make_tp_greedy_step(mesh, config, params,
                                 compute_dtype=jnp.float32, impl="xla")

    ref_cache = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    tp_cache = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    step_ids, idx = ids, jnp.int32(0)
    for _ in range(3):
        ref_logits, ref_cache = decode_step(params, ref_cache, step_ids,
                                            idx, config,
                                            compute_dtype=jnp.float32)
        want = jnp.argmax(ref_logits[:, -1], axis=-1).astype(jnp.int32)
        got, tp_cache = greedy(sparams, tp_cache, step_ids, idx)
        assert got.shape == (B,)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        idx = idx + step_ids.shape[1]
        step_ids = want[:, None]


def test_tp_decode_13b_widths():
    """Full 13B widths (5120/13824, 40 heads) on a 4-way TP mesh —
    validates tiling + sharding math at the real dimensions (depth 1)."""
    config = BitLlamaConfig.named("llama2-13b", num_hidden_layers=1,
                                  vocab_size=1024)
    from onebit_tpu.utils.randinit import host_random_packed_params
    params = host_random_packed_params(config, dtype=jnp.float32)

    mesh = create_mesh((1, 4))
    sparams, _ = shard_tp_params(params, mesh)
    tp_step = make_tp_decode_step(mesh, config, params,
                                  compute_dtype=jnp.float32, impl="xla")
    cache = init_kv_cache(config, 2, max_len=8, dtype=jnp.float32)
    ids = jnp.ones((2, 4), jnp.int32)
    logits, _ = tp_step(sparams, cache, ids, jnp.int32(0))
    assert logits.shape == (2, 4, 1024)
    # ground truth on one device
    ref, _ = decode_step(params, init_kv_cache(config, 2, 8,
                                               dtype=jnp.float32),
                         ids, jnp.int32(0), config,
                         compute_dtype=jnp.float32, impl="xla")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
