"""decode_step_flat ≡ decode_step (the scan path) — same semantics, flat
HBM profile (scalar-prefetch stacked kernels + in-place cache writes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.model.bitllama import (
    decode_step,
    decode_step_flat,
    fuse_for_decode,
    init_kv_cache,
    init_params,
    pack_model_params,
)
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.kv_cache import init_quant_kv_cache


@pytest.fixture(scope="module")
def tiny_packed():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, pack_model_params(params)


@pytest.fixture(scope="module")
def tiny_mha_fused():
    # MHA so qkv fuses too (fuse_for_decode requires equal widths)
    config = BitLlamaConfig.named("tiny", num_key_value_heads=4)
    params = init_params(config, jax.random.PRNGKey(1), mode="latent")
    return config, fuse_for_decode(pack_model_params(params), config)


def _run_both(config, params, cache_a, cache_b, impl, steps=4, prefill=6):
    B = 2
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, prefill + steps), 0,
                             config.vocab_size)
    la, cache_a = decode_step(params, cache_a, ids[:, :prefill],
                              jnp.int32(0), config, impl=impl,
                              compute_dtype=jnp.float32)
    lb, cache_b = decode_step_flat(params, cache_b, ids[:, :prefill],
                                   jnp.int32(0), config, impl=impl,
                                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-5, atol=2e-5)
    for t in range(prefill, prefill + steps):
        la, cache_a = decode_step(params, cache_a, ids[:, t:t + 1],
                                  jnp.int32(t), config, impl=impl,
                                  compute_dtype=jnp.float32)
        lb, cache_b = decode_step_flat(params, cache_b, ids[:, t:t + 1],
                                       jnp.int32(t), config, impl=impl,
                                       compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-5, err_msg=f"step {t}")


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_flat_matches_scan(tiny_packed, impl):
    config, params = tiny_packed
    a = init_kv_cache(config, 2, max_len=16, dtype=jnp.float32)
    b = init_kv_cache(config, 2, max_len=16, dtype=jnp.float32)
    _run_both(config, params, a, b, impl)


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_flat_matches_scan_fused(tiny_mha_fused, impl):
    config, params = tiny_mha_fused
    a = init_kv_cache(config, 2, max_len=16, dtype=jnp.float32)
    b = init_kv_cache(config, 2, max_len=16, dtype=jnp.float32)
    _run_both(config, params, a, b, impl)


@pytest.mark.slow
def test_flat_matches_scan_quant_cache(tiny_packed):
    config, params = tiny_packed
    a = init_quant_kv_cache(config, 2, max_len=16)
    b = init_quant_kv_cache(config, 2, max_len=16)
    _run_both(config, params, a, b, "pallas")


@pytest.mark.slow
def test_flat_key_start_positions(tiny_packed):
    """Left-padded rows: key_start/positions handling matches the scan path."""
    config, params = tiny_packed
    B, pad = 2, 3
    a = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    b = init_kv_cache(config, B, max_len=16, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(3), (B, 6), 0,
                             config.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(6)[None, :] - pad, (B, 6))
    pos = jnp.maximum(pos, 0)
    ks = jnp.full((B,), pad, jnp.int32)
    la, _ = decode_step(params, a, ids, jnp.int32(0), config, impl="pallas",
                        compute_dtype=jnp.float32, positions=pos,
                        key_start=ks)
    lb, _ = decode_step_flat(params, b, ids, jnp.int32(0), config,
                             impl="pallas", compute_dtype=jnp.float32,
                             positions=pos, key_start=ks)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-5, atol=2e-5)


def test_ragged_window_ladder_matches_flat():
    """The length-aware attention window (lax.switch over power-of-two
    widths) is numerically equivalent to the full-cache read (the fp
    reduction tree regroups with width, ~1e-6): ragged_decode_step at
    max_len 256 (multi-width ladder) matches decode_step_flat across
    positions that cross a width boundary (127 -> 128)."""
    import numpy as np

    from onebit_tpu.model.bitllama import (decode_step_flat, init_kv_cache,
                                           init_params)
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.model.ragged_decode import ragged_decode_step

    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    b, max_len = 2, 256
    cache_r = init_kv_cache(config, b, max_len, dtype=jnp.float32)
    cache_f = init_kv_cache(config, b, max_len, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    active = jnp.ones(b, bool)
    toks = jnp.asarray(rng.randint(1, config.vocab_size, (b, 1)), jnp.int32)
    for step, pos0 in enumerate([0, 126, 127, 128, 200]):
        pos = jnp.full((b,), pos0, jnp.int32)
        lr, cache_r = ragged_decode_step(
            params, cache_r, toks, pos, active, config,
            compute_dtype=jnp.float32)
        lf, cache_f = decode_step_flat(
            params, cache_f, toks, jnp.int32(pos0), config,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(lr), np.asarray(lf),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"pos {pos0}")
        toks = jnp.argmax(lf[:, -1:], -1).astype(jnp.int32)


def test_flat_window_ladder_left_padded():
    """Regression (round 5): the flat step's attention-window ladder must
    size the window from the cache WRITE frontier (cache_index + s), not
    max(positions) — with the left-padded convention (explicit positions
    = cache_index - pad, key_start = pad) a position-based window would
    silently drop valid trailing keys.  Oracle: decode_step (full-width
    mask, no ladder)."""
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    B, pad, ci = 2, 80, 140  # positions 60 < 128-boundary, frontier 141
    a = init_kv_cache(config, B, max_len=256, dtype=jnp.float32)
    b = init_kv_cache(config, B, max_len=256, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(3), (B, 1), 0,
                             config.vocab_size)
    pos = jnp.full((B, 1), ci - pad, jnp.int32)
    ks = jnp.full((B,), pad, jnp.int32)
    la, _ = decode_step(params, a, ids, jnp.int32(ci), config, impl="xla",
                        compute_dtype=jnp.float32, positions=pos,
                        key_start=ks)
    lb, _ = decode_step_flat(params, b, ids, jnp.int32(ci), config,
                             impl="xla", compute_dtype=jnp.float32,
                             positions=pos, key_start=ks)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-5, atol=2e-5)
