"""Native flat paged-attention kernel == jnp gather reference (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.engine.paged import (
    _gather_seq_kv,
    _jnp_paged_attention,
    _quantize_kv_int8,
)
from onebit_tpu.kernels.paged_attention import paged_attention_flat


def _mk(key, L, P, nkv, ps, hd):
    k1, k2 = jax.random.split(key)
    kp = jax.random.normal(k1, (L, P, nkv, ps, hd), jnp.float32)
    vp = jax.random.normal(k2, (L, P, nkv, ps, hd), jnp.float32)
    return kp, vp


@pytest.mark.parametrize("nh,nkv", [(4, 4), (8, 4)])
def test_kernel_matches_reference(nh, nkv):
    L, P, ps, hd = 3, 9, 4, 128
    B, mp = 2, 2
    kp, vp = _mk(jax.random.PRNGKey(0), L, P, nkv, ps, hd)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, nh, hd), jnp.float32)
    tables = jnp.asarray([[3, 7], [5, 1]], jnp.int32)
    lengths = jnp.asarray([6, 3], jnp.int32)
    for layer in (0, 2):
        out = paged_attention_flat(q, kp, vp, lengths=lengths,
                                   page_indices=tables,
                                   layer=jnp.int32(layer), interpret=True)
        ref = _jnp_paged_attention(
            q, _gather_seq_kv(kp[layer], tables),
            _gather_seq_kv(vp[layer], tables), lengths)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"layer={layer}")


def test_kernel_multiblock_online_softmax():
    """pages_per_block < mp exercises the cross-block online-softmax."""
    L, P, nkv, ps, hd = 2, 17, 4, 4, 128
    B, mp, nh = 3, 4, 4
    kp, vp = _mk(jax.random.PRNGKey(2), L, P, nkv, ps, hd)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, nh, hd), jnp.float32)
    tables = jnp.asarray([[3, 7, 2, 9], [5, 1, 8, 4], [10, 11, 12, 13]],
                         jnp.int32)
    lengths = jnp.asarray([14, 9, 16], jnp.int32)
    out = paged_attention_flat(q, kp, vp, lengths=lengths,
                               page_indices=tables, layer=jnp.int32(1),
                               pages_per_block=2, interpret=True)
    ref = _jnp_paged_attention(
        q, _gather_seq_kv(kp[1], tables),
        _gather_seq_kv(vp[1], tables), lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_quant_matches_reference():
    from onebit_tpu.engine.paged import _dequantize_kv_int8

    L, P, nkv, ps, hd = 2, 9, 4, 4, 128
    B, mp, nh = 2, 2, 4
    kp, vp = _mk(jax.random.PRNGKey(4), L, P, nkv, ps, hd)
    kq, ks = _quantize_kv_int8(kp)
    vq, vs = _quantize_kv_int8(vp)
    q = jax.random.normal(jax.random.PRNGKey(5), (B, nh, hd), jnp.float32)
    tables = jnp.asarray([[3, 7], [5, 1]], jnp.int32)
    lengths = jnp.asarray([7, 4], jnp.int32)
    out = paged_attention_flat(q, kq, ks, vq, vs, lengths=lengths,
                               page_indices=tables, layer=jnp.int32(0),
                               quant=True, interpret=True)
    ref = _jnp_paged_attention(
        q,
        _dequantize_kv_int8(_gather_seq_kv(kq[0], tables),
                            _gather_seq_kv(ks[0], tables)),
        _dequantize_kv_int8(_gather_seq_kv(vq[0], tables),
                            _gather_seq_kv(vs[0], tables)),
        lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_paged_decode_step_kernel_path_matches_jnp(monkeypatch):
    """paged_decode_step with the forced kernel path (interpret on CPU)
    produces the jnp path's logits — integration through the flat layer
    loop, GQA geometry, int8 quantized pages."""
    from onebit_tpu.engine.paged import init_paged_kv_cache, paged_decode_step
    from onebit_tpu.model.bitllama import init_params
    from onebit_tpu.model.config import BitLlamaConfig

    config = BitLlamaConfig.named(
        "tiny", hidden_size=512, num_attention_heads=4,
        num_key_value_heads=2)   # head_dim 128 (kernel geometry), GQA g=2
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    B, ps = 2, 4
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, 6), 0,
                             config.vocab_size)
    tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)

    for quant in (False, True):
        outs = {}
        for mode in ("jnp", "kernel"):
            monkeypatch.setenv("ONEBIT_PAGED_ATTN", mode)
            # the env knob is read at trace time: drop the jit cache so
            # the second mode actually re-traces
            paged_decode_step.clear_cache()
            cache = init_paged_kv_cache(config, num_pages=8, page_size=ps,
                                        quantized=quant)
            logits = None
            for t in range(6):
                lens = jnp.full((B,), t, jnp.int32)
                logits, cache = paged_decode_step(
                    params, cache, ids[:, t:t + 1], lens, tables, config,
                    compute_dtype=jnp.float32)
            outs[mode] = np.asarray(logits)
        # int8 pages: the kernel scales AFTER the int8-magnitude dot (the
        # _attention_quant convention) while the jnp path dequantizes
        # before it — identical math, ~1e-3 fp32 rounding skew
        tol = 5e-3 if quant else 2e-4
        np.testing.assert_allclose(outs["kernel"], outs["jnp"],
                                   rtol=tol, atol=tol,
                                   err_msg=f"quant={quant}")
        assert (outs["kernel"][:, 0].argmax(-1) ==
                outs["jnp"][:, 0].argmax(-1)).all()
