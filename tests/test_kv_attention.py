"""Fused quantized-KV decode attention kernel vs the jnp reference
(model.bitllama._attention_quant) — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.kernels.kv_attention import kv_attention_decode
from onebit_tpu.model import bitllama


def _mk(L=3, B=2, T=256, nkv=4, g=1, hd=128, seed=0):
    rng = np.random.RandomState(seed)
    nh = nkv * g
    q = jnp.asarray(rng.randn(B, nh, hd), jnp.float32).astype(jnp.bfloat16)
    k_q = jnp.asarray(rng.randint(-127, 128, (L, B, T, nkv, hd)), jnp.int8)
    v_q = jnp.asarray(rng.randint(-127, 128, (L, B, T, nkv, hd)), jnp.int8)
    k_s = jnp.asarray(rng.rand(L, B, T, nkv) * 0.02 + 0.001, jnp.float32)
    v_s = jnp.asarray(rng.rand(L, B, T, nkv) * 0.02 + 0.001, jnp.float32)
    return q, k_q, k_s, v_q, v_s


@pytest.mark.parametrize("g", [1, 2])
@pytest.mark.parametrize("layer", [0, 2])
def test_matches_attention_quant(g, layer):
    q, k_q, k_s, v_q, v_s = _mk(g=g)
    B, T = 2, 256
    lengths = jnp.asarray([T, 100], jnp.int32)
    got = kv_attention_decode(q, k_q, k_s, v_q, v_s, lengths,
                              jnp.int32(layer), inv_scale=1.0, t_blk=128)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
    want = bitllama._attention_quant(
        q[:, None], k_q[layer], k_s[layer], v_q[layer], v_s[layer], mask,
        num_kv_groups=g)[:, 0]
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(want, jnp.float32),
                               rtol=2e-2, atol=2e-2)


def test_single_block_and_short_lengths():
    q, k_q, k_s, v_q, v_s = _mk(T=128)
    lengths = jnp.asarray([1, 128], jnp.int32)
    got = kv_attention_decode(q, k_q, k_s, v_q, v_s, lengths, jnp.int32(1),
                              inv_scale=1.0, t_blk=128)
    mask = (jnp.arange(128)[None, :] < lengths[:, None])[:, None, None, :]
    want = bitllama._attention_quant(
        q[:, None], k_q[1], k_s[1], v_q[1], v_s[1], mask,
        num_kv_groups=1)[:, 0]
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(want, jnp.float32),
                               rtol=2e-2, atol=2e-2)


def test_plain_bf16_pool():
    """quant=False path: bf16 pools, no scales."""
    rng = np.random.RandomState(3)
    L, B, T, nkv, hd = 2, 2, 256, 4, 128
    q = jnp.asarray(rng.randn(B, nkv, hd), jnp.float32).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(L, B, T, nkv, hd), jnp.float32).astype(
        jnp.bfloat16)
    v = jnp.asarray(rng.randn(L, B, T, nkv, hd), jnp.float32).astype(
        jnp.bfloat16)
    lengths = jnp.asarray([200, 64], jnp.int32)
    got = kv_attention_decode(q, k, None, v, None, lengths, jnp.int32(0),
                              t_blk=128)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
    want = bitllama._attention(q[:, None], k[0], v[0], mask,
                               num_kv_groups=1)[:, 0]
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(want, jnp.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("g", [1, 2])
def test_kt_variant_matches(g):
    from onebit_tpu.kernels.kv_attention import kv_attention_decode_kt
    q, k_q, k_s, v_q, v_s = _mk(g=g, seed=5)
    B, T = 2, 256
    lengths = jnp.asarray([T, 77], jnp.int32)
    k_qt = jnp.moveaxis(k_q, 2, 4)       # [L,B,T,nkv,hd] -> [L,B,nkv,hd,T]
    k_st = jnp.moveaxis(k_s, 2, 3)       # [L,B,T,nkv]    -> [L,B,nkv,T]
    got = kv_attention_decode_kt(q, k_qt, k_st, v_q, v_s, lengths,
                                 jnp.int32(1), inv_scale=1.0, t_blk=128)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
    want = bitllama._attention_quant(
        q[:, None], k_q[1], k_s[1], v_q[1], v_s[1], mask,
        num_kv_groups=g)[:, 0]
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(want, jnp.float32),
                               rtol=2e-2, atol=2e-2)


def test_kt_variant_starts():
    """starts[b] masks left-pad slots — the key_start convention."""
    from onebit_tpu.kernels.kv_attention import kv_attention_decode_kt
    q, k_q, k_s, v_q, v_s = _mk(g=2, seed=7)
    T = 256
    lengths = jnp.asarray([T, 200], jnp.int32)
    starts = jnp.asarray([3, 50], jnp.int32)
    k_qt = jnp.moveaxis(k_q, 2, 4)
    k_st = jnp.moveaxis(k_s, 2, 3)
    got = kv_attention_decode_kt(q, k_qt, k_st, v_q, v_s, lengths,
                                 jnp.int32(0), starts=starts,
                                 inv_scale=1.0, t_blk=128)
    cols = jnp.arange(T)[None, :]
    mask = ((cols < lengths[:, None]) &
            (cols >= starts[:, None]))[:, None, None, :]
    want = bitllama._attention_quant(
        q[:, None], k_q[0], k_s[0], v_q[0], v_s[0], mask,
        num_kv_groups=2)[:, 0]
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(want, jnp.float32),
                               rtol=2e-2, atol=2e-2)


def test_append_kt_inserts_and_attends():
    """Fused append+attend == manual insert + plain kt kernel; the pool
    output is the input with exactly the one column replaced."""
    from onebit_tpu.kernels.kv_attention import (kv_attention_append_kt,
                                                 kv_attention_decode_kt)
    q, k_q, k_s, v_q, v_s = _mk(g=2, seed=11)
    k_qt = jnp.moveaxis(k_q, 2, 4)
    k_st = jnp.moveaxis(k_s, 2, 3)
    rng = np.random.RandomState(12)
    pos, layer = 131, 1
    k_new = jnp.asarray(rng.randint(-127, 128, (2, 4, 128)), jnp.int8)
    lengths = jnp.asarray([pos + 1, pos + 1], jnp.int32)

    ctx, k_qt_new = kv_attention_append_kt(
        q, k_new, k_qt, k_st, v_q, v_s, lengths, jnp.int32(layer),
        jnp.int32(pos), inv_scale=1.0, t_blk=128)
    k_qt_ref = k_qt.at[layer, :, :, :, pos].set(k_new)
    want = kv_attention_decode_kt(q, k_qt_ref, k_st, v_q, v_s, lengths,
                                  jnp.int32(layer), inv_scale=1.0,
                                  t_blk=128)
    np.testing.assert_allclose(np.asarray(ctx, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k_qt_new),
                                  np.asarray(k_qt_ref))


def test_decode_step_flat_kt_matches_quant():
    """decode_step_flat on QuantKVCacheKT == on QuantKVCache, greedy
    multi-step (the integrated fused-kernel path, interpret mode)."""
    from onebit_tpu.model.bitllama import decode_step_flat
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.model.kv_cache import (init_quant_kv_cache,
                                           init_quant_kv_cache_kt,
                                           kt_from_quant, quant_from_kt)
    from onebit_tpu.utils.randinit import host_random_packed_params

    config = BitLlamaConfig.named("tiny")
    params = host_random_packed_params(config, seed=0)
    b, max_len = 2, 128
    cache_q = init_quant_kv_cache(config, b, max_len)
    cache_kt = init_quant_kv_cache_kt(config, b, max_len)

    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(1, config.vocab_size, (b, 1)), jnp.int32)
    for step in range(3):
        lq, cache_q = decode_step_flat(params, cache_q, toks,
                                       jnp.int32(step), config, impl="xla")
        lkt, cache_kt = decode_step_flat(params, cache_kt, toks,
                                         jnp.int32(step), config, impl="xla")
        np.testing.assert_allclose(np.asarray(lkt), np.asarray(lq),
                                   rtol=2e-2, atol=2e-2)
        assert jnp.argmax(lkt[:, -1], -1).tolist() == \
            jnp.argmax(lq[:, -1], -1).tolist()
        toks = jnp.argmax(lq[:, -1:], -1).astype(jnp.int32)

    # cache contents agree through the relayout round trip (±1: layer i's
    # kernel-vs-XLA attention residual feeds layer i+1's V quantization)
    back = quant_from_kt(cache_kt)
    np.testing.assert_allclose(np.asarray(back.v_q, np.int32),
                               np.asarray(cache_q.v_q, np.int32), atol=3)
    np.testing.assert_allclose(np.asarray(back.k_q, np.int32),
                               np.asarray(cache_q.k_q, np.int32), atol=3)
    # kt_from_quant itself is an exact relayout
    np.testing.assert_array_equal(
        np.asarray(kt_from_quant(cache_q).v_q), np.asarray(cache_q.v_q))


def test_append_kt_per_row_positions():
    """Ragged append: per-row ``pos [B]`` in different T blocks — each
    row's column lands at its own position (the continuous-batching
    engine's decode step)."""
    from onebit_tpu.kernels.kv_attention import (kv_attention_append_kt,
                                                 kv_attention_decode_kt)
    rng = np.random.RandomState(21)
    L, B, nkv, hd, T, g = 2, 3, 4, 128, 384, 2
    nh = nkv * g
    q = jnp.asarray(rng.randn(B, nh, hd), jnp.float32)
    k_qt = jnp.asarray(rng.randint(-127, 128, (L, B, nkv, hd, T)), jnp.int8)
    k_st = jnp.asarray(rng.rand(L, B, nkv, T), jnp.float32)
    v_q = jnp.asarray(rng.randint(-127, 128, (L, B, T, nkv, hd)), jnp.int8)
    v_s = jnp.asarray(rng.rand(L, B, T, nkv), jnp.float32)
    k_new = jnp.asarray(rng.randint(-127, 128, (B, nkv, hd)), jnp.int8)
    pos = jnp.asarray([5, 131, 300], jnp.int32)   # three different blocks
    lengths = pos + 1
    layer = 1

    ctx, k_qt_new = kv_attention_append_kt(
        q, k_new, k_qt, k_st, v_q, v_s, lengths, jnp.int32(layer), pos,
        inv_scale=1.0, t_blk=128)
    k_qt_ref = k_qt
    for b in range(B):
        k_qt_ref = k_qt_ref.at[layer, b, :, :, int(pos[b])].set(k_new[b])
    want = kv_attention_decode_kt(q, k_qt_ref, k_st, v_q, v_s, lengths,
                                  jnp.int32(layer), inv_scale=1.0,
                                  t_blk=128)
    np.testing.assert_allclose(np.asarray(ctx, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k_qt_new),
                                  np.asarray(k_qt_ref))


def test_append_kt_inactive_row_zeros():
    """length 0 (inactive engine slot) yields a FINITE context row, not
    NaNs (fully-masked flash softmax degenerates to uniform attention —
    garbage, but the engine never reads inactive slots)."""
    from onebit_tpu.kernels.kv_attention import kv_attention_append_kt
    rng = np.random.RandomState(22)
    L, B, nkv, hd, T, g = 1, 2, 2, 128, 128, 2
    nh = nkv * g
    q = jnp.asarray(rng.randn(B, nh, hd), jnp.float32)
    k_qt = jnp.asarray(rng.randint(-127, 128, (L, B, nkv, hd, T)), jnp.int8)
    k_st = jnp.asarray(rng.rand(L, B, nkv, T), jnp.float32)
    v_q = jnp.asarray(rng.randint(-127, 128, (L, B, T, nkv, hd)), jnp.int8)
    v_s = jnp.asarray(rng.rand(L, B, T, nkv), jnp.float32)
    k_new = jnp.asarray(rng.randint(-127, 128, (B, nkv, hd)), jnp.int8)
    pos = jnp.asarray([3, 7], jnp.int32)
    lengths = jnp.asarray([4, 0], jnp.int32)      # row 1 inactive
    ctx, _ = kv_attention_append_kt(
        q, k_new, k_qt, k_st, v_q, v_s, lengths, jnp.int32(0), pos,
        inv_scale=1.0, t_blk=128)
    out = np.asarray(ctx, np.float32)
    assert np.isfinite(out).all()
