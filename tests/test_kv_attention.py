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
    """Fused append+attend == manual insert + plain kt kernel; every pool
    output is the input with exactly the one column/row replaced."""
    from onebit_tpu.kernels.kv_attention import (kv_attention_append_kt,
                                                 kv_attention_decode_kt)
    q, k_q, k_s, v_q, v_s = _mk(g=2, seed=11)
    k_qt = jnp.moveaxis(k_q, 2, 4)
    k_st = jnp.moveaxis(k_s, 2, 3)
    rng = np.random.RandomState(12)
    pos, layer = 131, 1
    k_new = jnp.asarray(rng.randint(-127, 128, (2, 4, 128)), jnp.int8)
    k_snew = jnp.asarray(rng.rand(2, 4) * 0.3 + 0.01, jnp.float32)
    v_new = jnp.asarray(rng.randint(-127, 128, (2, 4, 128)), jnp.int8)
    v_snew = jnp.asarray(rng.rand(2, 4) * 0.3 + 0.01, jnp.float32)
    lengths = jnp.asarray([pos + 1, pos + 1], jnp.int32)

    ctx, k_qt_new, k_st_new, v_q_new, v_s_new = kv_attention_append_kt(
        q, k_new, k_snew, v_new, v_snew, k_qt, k_st, v_q, v_s, lengths,
        jnp.int32(layer), jnp.int32(pos), inv_scale=1.0, t_blk=128)
    k_qt_ref = k_qt.at[layer, :, :, :, pos].set(k_new)
    k_st_ref = k_st.at[layer, :, :, pos].set(k_snew)
    v_q_ref = v_q.at[layer, :, pos].set(v_new)
    v_s_ref = v_s.at[layer, :, pos].set(v_snew)
    want = kv_attention_decode_kt(q, k_qt_ref, k_st_ref, v_q_ref, v_s_ref,
                                  lengths, jnp.int32(layer), inv_scale=1.0,
                                  t_blk=128)
    np.testing.assert_allclose(np.asarray(ctx, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k_qt_new),
                                  np.asarray(k_qt_ref))
    np.testing.assert_array_equal(np.asarray(k_st_new),
                                  np.asarray(k_st_ref))
    np.testing.assert_array_equal(np.asarray(v_q_new),
                                  np.asarray(v_q_ref))
    np.testing.assert_array_equal(np.asarray(v_s_new),
                                  np.asarray(v_s_ref))


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


def test_decode_step_flat_kt4_matches_quant():
    """decode_step_flat on the INT4 cache tracks the int8 KT path: same
    greedy tokens on a tiny model, logits close (int4 carries ~4.3 bits of
    the int8 signal; tolerance reflects that)."""
    from onebit_tpu.model.bitllama import decode_step_flat
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.model.kv_cache import (init_quant_kv_cache_kt,
                                           init_quant_kv_cache_kt4)
    from onebit_tpu.utils.randinit import host_random_packed_params

    config = BitLlamaConfig.named("tiny")
    params = host_random_packed_params(config, seed=0)
    b = 2
    # max_len 512: multiple of 256 → the fused int4 kernel path runs
    cache_kt = init_quant_kv_cache_kt(config, b, 512)
    cache_kt4 = init_quant_kv_cache_kt4(config, b, 512)

    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(1, config.vocab_size, (b, 1)), jnp.int32)
    for step in range(3):
        lkt, cache_kt = decode_step_flat(params, cache_kt, toks,
                                         jnp.int32(step), config, impl="xla")
        lkt4, cache_kt4 = decode_step_flat(params, cache_kt4, toks,
                                           jnp.int32(step), config,
                                           impl="xla")
        np.testing.assert_allclose(np.asarray(lkt4), np.asarray(lkt),
                                   rtol=0.3, atol=0.3)
        # random tiny-model logits sit in near-ties, so token-exact greedy
        # vs the LESS lossy int8 cache is not a fair bar; require the int8
        # winner to stay within a small logit gap of the int4 winner
        l4 = np.asarray(lkt4[:, -1], np.float32)
        winner8 = np.asarray(jnp.argmax(lkt[:, -1], -1))
        for row in range(b):
            assert l4[row].max() - l4[row, winner8[row]] < 0.2
        toks = jnp.argmax(lkt[:, -1:], -1).astype(jnp.int32)


def test_decode_step_flat_kt4_fallback_matches_kernel():
    """The multi-token unpack-repack fallback and the fused s=1 kernel
    agree: prefill a window via the fallback, then decode one token and
    compare against a cache built token-by-token through the kernel."""
    from onebit_tpu.model.bitllama import decode_step_flat
    from onebit_tpu.model.config import BitLlamaConfig
    from onebit_tpu.model.kv_cache import init_quant_kv_cache_kt4
    from onebit_tpu.utils.randinit import host_random_packed_params

    config = BitLlamaConfig.named("tiny")
    params = host_random_packed_params(config, seed=1)
    b, T0 = 2, 4
    rng = np.random.RandomState(1)
    prompt = jnp.asarray(rng.randint(1, config.vocab_size, (b, T0)),
                         jnp.int32)

    cache_a = init_quant_kv_cache_kt4(config, b, 512)
    la, cache_a = decode_step_flat(params, cache_a, prompt, jnp.int32(0),
                                   config, impl="xla")   # fallback path
    cache_b = init_quant_kv_cache_kt4(config, b, 512)
    for t in range(T0):
        lb, cache_b = decode_step_flat(params, cache_b, prompt[:, t:t + 1],
                                       jnp.int32(t), config, impl="xla")
    np.testing.assert_allclose(np.asarray(la[:, -1]), np.asarray(lb[:, -1]),
                               rtol=0.08, atol=0.08)
    tok = jnp.argmax(la[:, -1:], -1).astype(jnp.int32)
    la2, _ = decode_step_flat(params, cache_a, tok, jnp.int32(T0), config,
                              impl="xla")
    lb2, _ = decode_step_flat(params, cache_b, tok, jnp.int32(T0), config,
                              impl="xla")
    np.testing.assert_allclose(np.asarray(la2), np.asarray(lb2),
                               rtol=0.08, atol=0.08)


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
    k_snew = jnp.asarray(rng.rand(B, nkv) * 0.3 + 0.01, jnp.float32)
    v_new = jnp.asarray(rng.randint(-127, 128, (B, nkv, hd)), jnp.int8)
    v_snew = jnp.asarray(rng.rand(B, nkv) * 0.3 + 0.01, jnp.float32)
    pos = jnp.asarray([5, 131, 300], jnp.int32)   # three different blocks
    lengths = pos + 1
    layer = 1

    ctx, k_qt_new, k_st_new, v_q_new, v_s_new = kv_attention_append_kt(
        q, k_new, k_snew, v_new, v_snew, k_qt, k_st, v_q, v_s, lengths,
        jnp.int32(layer), pos, inv_scale=1.0, t_blk=128)
    k_qt_ref, k_st_ref, v_q_ref, v_s_ref = k_qt, k_st, v_q, v_s
    for b in range(B):
        p = int(pos[b])
        k_qt_ref = k_qt_ref.at[layer, b, :, :, p].set(k_new[b])
        k_st_ref = k_st_ref.at[layer, b, :, p].set(k_snew[b])
        v_q_ref = v_q_ref.at[layer, b, p].set(v_new[b])
        v_s_ref = v_s_ref.at[layer, b, p].set(v_snew[b])
    want = kv_attention_decode_kt(q, k_qt_ref, k_st_ref, v_q_ref, v_s_ref,
                                  lengths, jnp.int32(layer), inv_scale=1.0,
                                  t_blk=128)
    np.testing.assert_allclose(np.asarray(ctx, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k_qt_new),
                                  np.asarray(k_qt_ref))
    np.testing.assert_array_equal(np.asarray(k_st_new),
                                  np.asarray(k_st_ref))
    np.testing.assert_array_equal(np.asarray(v_q_new),
                                  np.asarray(v_q_ref))
    np.testing.assert_array_equal(np.asarray(v_s_new),
                                  np.asarray(v_s_ref))


def _mk4(L=3, B=2, T=512, nkv=4, g=1, hd=128, seed=31):
    """Random int4 pools in both the row-major (for the jnp reference) and
    packed-KT layouts, with quantize_kv4-convention scales."""
    from onebit_tpu.model.kv_cache import pack_int4_halfplane
    rng = np.random.RandomState(seed)
    nh = nkv * g
    q = jnp.asarray(rng.randn(B, nh, hd), jnp.float32).astype(jnp.bfloat16)
    k_q = jnp.asarray(rng.randint(-7, 8, (L, B, T, nkv, hd)), jnp.int8)
    v_q = jnp.asarray(rng.randint(-7, 8, (L, B, T, nkv, hd)), jnp.int8)
    k_s = jnp.asarray(rng.rand(L, B, T, nkv) * 0.3 + 0.01, jnp.float32)
    v_s = jnp.asarray(rng.rand(L, B, T, nkv) * 0.3 + 0.01, jnp.float32)
    k_qp = pack_int4_halfplane(jnp.moveaxis(k_q, 2, 4), axis=4)
    k_st = jnp.moveaxis(k_s, 2, 3)
    v_qp = pack_int4_halfplane(v_q, axis=2)
    return q, k_q, k_s, v_q, v_s, k_qp, k_st, v_qp


@pytest.mark.parametrize("g", [1, 2])
def test_kt4_matches_attention_quant(g):
    """INT4 packed kernel == the jnp int8-style reference on the same
    int4-valued pools (dequant math is identical: q·scale)."""
    from onebit_tpu.kernels.kv_attention import kv_attention_decode_kt4
    q, k_q, k_s, v_q, v_s, k_qp, k_st, v_qp = _mk4(g=g)
    T = 512
    lengths = jnp.asarray([T, 77], jnp.int32)
    got = kv_attention_decode_kt4(q, k_qp, k_st, v_qp, v_s, lengths,
                                  jnp.int32(1), inv_scale=1.0, t_blk=256)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
    want = bitllama._attention_quant(
        q[:, None], k_q[1], k_s[1], v_q[1], v_s[1], mask,
        num_kv_groups=g)[:, 0]
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(want, jnp.float32),
                               rtol=2e-2, atol=2e-2)


def test_kt4_starts_and_roundtrip():
    from onebit_tpu.kernels.kv_attention import kv_attention_decode_kt4
    from onebit_tpu.model.kv_cache import (pack_int4_halfplane,
                                           unpack_int4_halfplane)
    q, k_q, k_s, v_q, v_s, k_qp, k_st, v_qp = _mk4(g=2, seed=33)
    T = 512
    # pack/unpack round trip is exact
    np.testing.assert_array_equal(
        np.asarray(unpack_int4_halfplane(k_qp, axis=4)),
        np.asarray(jnp.moveaxis(k_q, 2, 4)))
    np.testing.assert_array_equal(
        np.asarray(unpack_int4_halfplane(v_qp, axis=2)), np.asarray(v_q))
    lengths = jnp.asarray([T, 300], jnp.int32)
    starts = jnp.asarray([3, 50], jnp.int32)
    got = kv_attention_decode_kt4(q, k_qp, k_st, v_qp, v_s, lengths,
                                  jnp.int32(0), starts=starts,
                                  inv_scale=1.0, t_blk=256)
    cols = jnp.arange(T)[None, :]
    mask = ((cols < lengths[:, None]) &
            (cols >= starts[:, None]))[:, None, None, :]
    want = bitllama._attention_quant(
        q[:, None], k_q[0], k_s[0], v_q[0], v_s[0], mask,
        num_kv_groups=2)[:, 0]
    np.testing.assert_allclose(np.asarray(got, jnp.float32),
                               np.asarray(want, jnp.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("positions", [[5, 131, 300], [250, 259, 450]])
def test_append_kt4_per_row_positions(positions):
    """INT4 FULLY-fused append+attend: per-row positions across BOTH
    nibble planes (pos < T/2 → low nibble, pos ≥ T/2 → high) — ctx
    matches the decode kernel on manually-written pools, and ALL FOUR
    in-kernel write-backs (K nibble, K scale, V nibble, V scale) touch
    exactly the target column/row."""
    from onebit_tpu.kernels.kv_attention import (kv_attention_append_kt4,
                                                 kv_attention_decode_kt4)
    from onebit_tpu.model.kv_cache import (pack_int4_halfplane,
                                           unpack_int4_halfplane)
    rng = np.random.RandomState(41)
    q, k_q, k_s, v_q, v_s, k_qp, k_st, v_qp = _mk4(B=3, g=2, seed=41)
    layer = 1
    k_new = jnp.asarray(rng.randint(-7, 8, (3, 4, 128)), jnp.int8)
    v_new = jnp.asarray(rng.randint(-7, 8, (3, 4, 128)), jnp.int8)
    k_snew = jnp.asarray(rng.rand(3, 4) * 0.3 + 0.01, jnp.float32)
    v_snew = jnp.asarray(rng.rand(3, 4) * 0.3 + 0.01, jnp.float32)
    pos = jnp.asarray(positions, jnp.int32)
    lengths = pos + 1

    ctx, k_qp_new, k_st_new, v_qp_new, v_s_new = kv_attention_append_kt4(
        q, k_new, k_snew, v_new, v_snew, k_qp, k_st, v_qp, v_s, lengths,
        jnp.int32(layer), pos, inv_scale=1.0, t_blk=256)
    # reference pools: insert into the unpacked layouts, repack
    k_qt_ref = jnp.moveaxis(k_q, 2, 4)
    v_q_ref, k_st_ref, v_s_ref = v_q, k_st, v_s
    for b in range(3):
        p = int(pos[b])
        k_qt_ref = k_qt_ref.at[layer, b, :, :, p].set(k_new[b])
        v_q_ref = v_q_ref.at[layer, b, p].set(v_new[b])
        k_st_ref = k_st_ref.at[layer, b, :, p].set(k_snew[b])
        v_s_ref = v_s_ref.at[layer, b, p].set(v_snew[b])
    k_qp_ref = pack_int4_halfplane(k_qt_ref, axis=4)
    v_qp_ref = pack_int4_halfplane(v_q_ref, axis=2)
    want = kv_attention_decode_kt4(q, k_qp_ref, k_st_ref, v_qp_ref,
                                   v_s_ref, lengths,
                                   jnp.int32(layer), inv_scale=1.0,
                                   t_blk=256)
    np.testing.assert_allclose(np.asarray(ctx, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(k_qp_new),
                                  np.asarray(k_qp_ref))
    np.testing.assert_array_equal(np.asarray(v_qp_new),
                                  np.asarray(v_qp_ref))
    np.testing.assert_allclose(np.asarray(k_st_new),
                               np.asarray(k_st_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v_s_new),
                               np.asarray(v_s_ref), rtol=1e-6)
    # and the unpacked views confirm only the target columns changed
    np.testing.assert_array_equal(
        np.asarray(unpack_int4_halfplane(k_qp_new, axis=4)),
        np.asarray(k_qt_ref))
    np.testing.assert_array_equal(
        np.asarray(unpack_int4_halfplane(v_qp_new, axis=2)),
        np.asarray(v_q_ref))


def test_append_kt4_inactive_row_finite():
    from onebit_tpu.kernels.kv_attention import kv_attention_append_kt4
    from onebit_tpu.model.kv_cache import pack_int4_halfplane
    rng = np.random.RandomState(42)
    L, B, nkv, hd, T, g = 1, 2, 2, 128, 256, 2
    nh = nkv * g
    q = jnp.asarray(rng.randn(B, nh, hd), jnp.float32)
    k_qt = jnp.asarray(rng.randint(-7, 8, (L, B, nkv, hd, T)), jnp.int8)
    k_st = jnp.asarray(rng.rand(L, B, nkv, T), jnp.float32)
    v_q = jnp.asarray(rng.randint(-7, 8, (L, B, T, nkv, hd)), jnp.int8)
    v_s = jnp.asarray(rng.rand(L, B, T, nkv), jnp.float32)
    k_new = jnp.asarray(rng.randint(-7, 8, (B, nkv, hd)), jnp.int8)
    v_new = jnp.asarray(rng.randint(-7, 8, (B, nkv, hd)), jnp.int8)
    k_snew = jnp.asarray(rng.rand(B, nkv), jnp.float32)
    v_snew = jnp.asarray(rng.rand(B, nkv), jnp.float32)
    pos = jnp.asarray([3, 7], jnp.int32)
    lengths = jnp.asarray([4, 0], jnp.int32)
    ctx, *_ = kv_attention_append_kt4(
        q, k_new, k_snew, v_new, v_snew,
        pack_int4_halfplane(k_qt, axis=4), k_st,
        pack_int4_halfplane(v_q, axis=2), v_s, lengths, jnp.int32(0), pos,
        inv_scale=1.0, t_blk=256)
    assert np.isfinite(np.asarray(ctx, np.float32)).all()


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
    k_snew = jnp.asarray(rng.rand(B, nkv) * 0.3 + 0.01, jnp.float32)
    v_new = jnp.asarray(rng.randint(-127, 128, (B, nkv, hd)), jnp.int8)
    v_snew = jnp.asarray(rng.rand(B, nkv) * 0.3 + 0.01, jnp.float32)
    pos = jnp.asarray([3, 7], jnp.int32)
    lengths = jnp.asarray([4, 0], jnp.int32)      # row 1 inactive
    ctx, _, _, _, _ = kv_attention_append_kt(
        q, k_new, k_snew, v_new, v_snew, k_qt, k_st, v_q, v_s, lengths,
        jnp.int32(0), pos, inv_scale=1.0, t_blk=128)
    out = np.asarray(ctx, np.float32)
    assert np.isfinite(out).all()
