"""Golden tests: Pallas kernel (interpret mode on CPU) vs the jnp reference
bitlinear math. The same kernel code compiles for TPU; bench.py exercises it
on hardware."""

import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.core.bitlinear import bitlinear_fwd
from onebit_tpu.core.packing import pack_signs_device
from onebit_tpu.kernels.bitlinear_pallas import bitlinear_packed_pallas


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _case(m, n, k, seed, bias=False, dtype=jnp.float32):
    x = jnp.asarray(_rand((m, k), seed)).astype(dtype)
    w = jnp.asarray(_rand((n, k), seed + 1))
    g = jnp.asarray(_rand((k,), seed + 2))
    h = jnp.asarray(_rand((n,), seed + 3))
    b = jnp.asarray(_rand((n,), seed + 4)) if bias else None
    packed = pack_signs_device(w)
    ref = bitlinear_fwd(x, jnp.sign(w).astype(dtype), g, h, bias=b)
    got = bitlinear_packed_pallas(x, packed, g, h, bias=b, interpret=True)
    return np.asarray(ref, np.float32), np.asarray(got, np.float32)


@pytest.mark.parametrize("m", [1, 4, 16, 128])
def test_small_m_fused(m):
    ref, got = _case(m, 256, 128, seed=m)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_small_m_bias():
    ref, got = _case(8, 128, 256, seed=50, bias=True)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_large_m_path():
    ref, got = _case(300, 256, 128, seed=60)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_large_m_nondivisible_batch():
    ref, got = _case(200, 128, 128, seed=70)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_bf16_input():
    x = jnp.asarray(_rand((8, 128), 80)).astype(jnp.bfloat16)
    w = jnp.asarray(_rand((128, 128), 81))
    g = jnp.asarray(_rand((128,), 82))
    h = jnp.asarray(_rand((128,), 83))
    packed = pack_signs_device(w)
    ref = bitlinear_fwd(x, jnp.sign(w).astype(jnp.bfloat16), g, h)
    got = bitlinear_packed_pallas(x, packed, g, h, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_3d_input():
    x = jnp.asarray(_rand((2, 5, 128), 90))
    w = jnp.asarray(_rand((256, 128), 91))
    g = jnp.asarray(_rand((128,), 92))
    h = jnp.asarray(_rand((256,), 93))
    ref = bitlinear_fwd(x, jnp.sign(w), g, h)
    got = bitlinear_packed_pallas(x, pack_signs_device(w), g, h, interpret=True)
    assert got.shape == (2, 5, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_odd_tile_sizes():
    # N=11008-like non-power-of-two tiling (divisible by 128 only via 256/43)
    ref, got = _case(4, 1408, 256, seed=100)  # 1408 = 11*128
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_large_m_bf16_output():
    """bf16 inputs take the bf16-z fast path (regression: dtype of the
    kernel store must match the out ref)."""
    x = jnp.asarray(_rand((300, 128), 110)).astype(jnp.bfloat16)
    w = jnp.asarray(_rand((256, 128), 111))
    g = jnp.asarray(_rand((128,), 112))
    h = jnp.asarray(_rand((256,), 113))
    ref = bitlinear_fwd(x, jnp.sign(w).astype(jnp.bfloat16), g, h)
    got = bitlinear_packed_pallas(x, pack_signs_device(w), g, h,
                                  interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_small_m_b01_variant(monkeypatch):
    """The 0/1-bit unpack variant (rowsum - 2*(y.B) correction) must match
    the +-1 variant bit-for-bit in math."""
    from onebit_tpu.kernels import bitlinear_pallas as bp
    x = jnp.asarray(_rand((4, 64), 0))
    w = jnp.asarray(_rand((128, 64), 1))
    g = jnp.asarray(_rand((64,), 2))
    h = jnp.asarray(_rand((128,), 3))
    packed = pack_signs_device(w)
    ref = bitlinear_fwd(x, jnp.sign(w).astype(x.dtype), g, h)
    got = bp._call_small_m(x, packed, g, h, None, 1e-5, True,
                           variant="b01")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_multiseg_kernel_small_and_large():
    """Fused qkv/gate+up kernel vs per-projection reference, incl. a
    padded segment width (n_true=384 -> seg_pad=512)."""
    from onebit_tpu.kernels.bitlinear_pallas import bitlinear_packed_fused
    k, n_true, ns = 64, 384, 3
    seg_pad = 512
    ws = [jnp.asarray(_rand((n_true, k), 10 + j)) for j in range(ns)]
    gs = [jnp.asarray(_rand((k,), 20 + j)) for j in range(ns)]
    hs = [jnp.asarray(_rand((n_true,), 30 + j)) for j in range(ns)]
    packed = jnp.concatenate(
        [jnp.pad(pack_signs_device(w), ((0, 0), (0, seg_pad - n_true)))
         for w in ws], axis=-1)
    g = jnp.stack(gs)
    h = jnp.concatenate([jnp.pad(x, (0, seg_pad - n_true)) for x in hs])
    for m in (4, 200):  # small-M (fused LN) and large-M schedules
        x = jnp.asarray(_rand((m, k), 40))
        outs = bitlinear_packed_fused(x, packed, g, h, n_true=n_true,
                                      interpret=True)
        assert len(outs) == ns
        for j in range(ns):
            ref = bitlinear_fwd(x, jnp.sign(ws[j]).astype(x.dtype), gs[j],
                                hs[j])
            np.testing.assert_allclose(np.asarray(outs[j]),
                                       np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_fuse_for_decode_model_equivalence():
    """fuse_for_decode params produce identical logits via decode_step."""
    import jax
    from onebit_tpu.model.bitllama import (decode_step, fuse_for_decode,
                                           init_kv_cache, init_params)
    from onebit_tpu.model.config import BitLlamaConfig
    config = BitLlamaConfig(
        vocab_size=64, hidden_size=128, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=32)
    params = init_params(config, jax.random.PRNGKey(3), mode="packed")
    fused = fuse_for_decode(params, config)
    assert "qkv_proj" in fused["layers"] and "q_proj" not in fused["layers"]
    ids = jnp.asarray([[5, 9], [7, 1]], jnp.int32)
    cache_a = init_kv_cache(config, 2, 16, dtype=jnp.float32)
    cache_b = init_kv_cache(config, 2, 16, dtype=jnp.float32)
    la, _ = decode_step(params, cache_a, ids, jnp.int32(0), config,
                        compute_dtype=jnp.float32)
    lb, _ = decode_step(fused, cache_b, ids, jnp.int32(0), config,
                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=2e-5, rtol=2e-5)
