"""Tensor-parallel BitLinear under shard_map (explicit-collective TP).

GSPMD auto-partitions the XLA unpack-then-dot path, but Pallas kernels
need explicit sharding: this module runs the fused kernel per-shard inside
``shard_map`` with the out-feature axis split over the ``model`` mesh axis
(SURVEY.md §2.2 TP row: sign planes + ``h`` sharded by out-features).

The interesting part is the LayerNorm: it reduces over the *sharded*
out-feature axis.  Instead of all-gathering the activations, only the two
scalar moments per row cross the interconnect:

    local:  s1 = Σ z_local,  s2 = Σ z_local²       (per row)
    psum:   S1, S2 over the model axis             (2 scalars/row on ICI)
    local:  y = (z - S1/N) * rsqrt(S2/N - (S1/N)² + eps)

so the per-token collective payload is O(rows), not O(rows × features) —
the latency-friendly schedule for decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from onebit_tpu.core.bitlinear import LN_EPS
from onebit_tpu.parallel.mesh import MODEL_AXIS


def bitlinear_tp_shard(x, packed, g, h, bias=None, *, axis_name: str,
                       eps: float = LN_EPS, impl: str = "auto"):
    """Per-shard body: call inside shard_map.

    x [..., K] replicated; packed [K//32, N/mp] (K-major device layout),
    h [N/mp] sharded.  Returns the local [..., N/mp] shard of the full
    BitLinear output.
    """
    mp = jax.lax.psum(1, axis_name)
    n_total = packed.shape[1] * mp

    # local partial projection WITHOUT LayerNorm: z = ((x⊙g)·S_localᵀ)⊙h
    if impl == "pallas" or (impl == "auto" and
                            jax.default_backend() == "tpu"):
        from onebit_tpu.kernels.bitlinear_pallas import bitlinear_packed_raw
        z = bitlinear_packed_raw(x, packed, g, h)
    else:
        from onebit_tpu.core.packing import unpack_signs_device
        sign_w = unpack_signs_device(packed, dtype=x.dtype)
        y = (x * g.astype(x.dtype))
        z = jnp.matmul(y, sign_w.T, preferred_element_type=jnp.float32)
        z = z * h.astype(jnp.float32)

    z = z.astype(jnp.float32)
    # distributed LayerNorm: psum of per-row moments only
    s1 = jax.lax.psum(jnp.sum(z, axis=-1, keepdims=True), axis_name)
    s2 = jax.lax.psum(jnp.sum(jnp.square(z), axis=-1, keepdims=True),
                      axis_name)
    mean = s1 / n_total
    var = s2 / n_total - jnp.square(mean)
    out = (z - mean) * jax.lax.rsqrt(var + eps)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)


def make_tp_bitlinear(mesh, *, eps: float = LN_EPS, impl: str = "auto"):
    """Build a jit-able TP BitLinear over ``mesh``'s model axis.

    Input x replicated over ``model``; packed/h/bias sharded on their
    out-feature axis; output sharded on the out-feature axis.
    """
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, MODEL_AXIS), P(), P(MODEL_AXIS)),
        out_specs=P(None, MODEL_AXIS),
        check_vma=False,
    )
    def tp_apply(x, packed, g, h):
        return bitlinear_tp_shard(x, packed, g, h, axis_name=MODEL_AXIS,
                                  eps=eps, impl=impl)

    return tp_apply
