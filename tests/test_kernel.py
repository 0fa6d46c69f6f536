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
