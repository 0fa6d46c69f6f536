"""shard_map TP BitLinear: sharded output == single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.core.bitlinear import bitlinear_fwd
from onebit_tpu.core.packing import pack_signs_device
from onebit_tpu.kernels.bitlinear_sharded import make_tp_bitlinear
from onebit_tpu.parallel.mesh import create_mesh


def test_tp_bitlinear_matches_reference():
    mesh = create_mesh((1, 4))
    rng = np.random.default_rng(0)
    m, n, k = 6, 512, 256
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(k).astype(np.float32))
    h = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    ref = bitlinear_fwd(x, jnp.sign(w), g, h)

    packed = pack_signs_device(w)
    tp = make_tp_bitlinear(mesh, impl="xla")
    got = jax.jit(tp)(x, packed, g, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_bitlinear_pallas_interpret():
    mesh = create_mesh((1, 2))
    rng = np.random.default_rng(1)
    m, n, k = 4, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(k).astype(np.float32))
    h = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    ref = bitlinear_fwd(x, jnp.sign(w), g, h)
    tp = make_tp_bitlinear(mesh, impl="pallas")
    got = jax.jit(tp)(x, pack_signs_device(w), g, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
