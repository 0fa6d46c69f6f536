"""Fused Pallas TPU kernel for the packed OneBit linear.

Computes ``LayerNorm(((x ⊙ g) · sign(W)ᵀ) ⊙ h) (+ bias)`` with ``sign(W)``
stored as packed int32 words in the **K-major byte-plane device layout**
(``core.packing.pack_signs_device``: shape ``[K//32, N]``).  This replaces
the reference's unpack-everything-every-forward (bitnet.py:98-115), which
materializes the dense ±1 matrix in HBM on each call: here packed words
stream HBM→VMEM (16x less traffic than bf16 weights) and each tile is
materialized as a ±1 **int8** tile in VMEM exactly once per call, feeding
the MXU's mixed bf16×int8 dot directly.

Why K-major: the unpacked tile is the dot's **contraction-major** operand
``S [K, TN]``, so ``(x⊙g) [M, K] · S`` hits the MXU with no transposition,
and every unpack store writes a contiguous *sublane* slab.  Why byte-plane
int8: 4x-packed stores + 3 VPU ops per 4 elements (see ``_unpack_planes``)
— measured 1.6x the int32-bitplane/bf16 strategy at 7B decode shapes and
faster than a bf16 weight operand even at prefill (scripts/ubench_unpack.py,
scripts/probe_primitives.py).

Two schedules:

* ``small-M (decode)``: grid over N tiles; a fp32 accumulator holds the
  full ``[M, N]`` result in VMEM so the row LayerNorm (+h, +bias) epilogue
  runs fused in the final grid step.  Unpack cost = one pass over the
  matrix (the roofline floor for 1-bit weights at small batch).
* ``large-M (prefill/eval)``: grid ``(n_tiles, m_tiles)`` with the unpacked
  ``[K, TN]`` sign tile cached in VMEM scratch across the inner m loop —
  unpack again runs once per matrix, MXU-bound for large M.  LayerNorm is
  applied by the caller (XLA fuses it); the kernel returns
  ``((x⊙g)·Sᵀ)⊙h`` in fp32.

Roofline notes (v5e): at batch B the per-token cost is
``max(unpack VPU ≈ 3 ops/weight / B, MXU 2 FLOPs/weight, HBM 1/8 B/weight)``
so decode is VPU-unpack-bound at small B and MXU-bound above — either way
strictly faster than dense bf16 decode (HBM-bound at 2 B/weight).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onebit_tpu.core.bitlinear import LN_EPS

WORD_BITS = 32
_SMALL_M = 128          # threshold for the fused-LN decode schedule
_LANE = 128


def _unpack_planes(words, s_ref, nw: int):
    """Unpack [K/32, TN] int32 (K-major **byte-plane** layout,
    core.packing.pack_signs_device) into s_ref [K, TN] as ±1 **int8**.

    Per byte-plane p: ``(w >> p) & 0x01010101`` extracts 4 bits/lane, then
    ``0x01010101 + bits*0xFE`` turns each byte into +1 (bit 0) or 0xFF = -1
    (bit 1) with no cross-byte carry; a single int32→int8 bitcast scatters
    byte c of int32 sublane i to int8 sublane 4i+c — matching the pack
    layout, so each iteration stores one contiguous [4*nw, TN] slab.  Cost:
    ~3 VPU ops per 4 elements + int8 (4x-packed) stores — measured the
    fastest of 6 materialization strategies on v5e
    (scripts/ubench_unpack.py); the MXU consumes the int8 tile via the
    mixed bf16×int8 dot at full (or better) bf16 throughput.
    """
    w = pltpu.bitcast(words, jnp.uint32)
    msk = jnp.uint32(0x01010101)
    for p in range(8):
        bits = (w >> p) & msk
        t = msk + bits * jnp.uint32(0xFE)
        s_ref[pl.ds(p * 4 * nw, 4 * nw), :] = pltpu.bitcast(t, jnp.int8)


def _pick_tile(n: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    raise ValueError(f"dimension {n} not divisible by 128")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# small-M fused kernel (decode): grid (n_tiles,), LN epilogue in-kernel
# ---------------------------------------------------------------------------

def _fused_small_m_kernel(x_ref, g_ref, packed_ref, h_ref, bias_ref, out_ref,
                          acc_ref, y_ref, s_ref, *, tn: int, k: int,
                          eps: float, has_bias: bool, fuse_ln: bool = True):
    ni = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(ni == 0)
    def _():
        y_ref[:] = x_ref[:] * g_ref[:]

    _unpack_planes(packed_ref[:], s_ref, k // WORD_BITS)     # [K, TN] int8
    s = s_ref[:]
    if y_ref.dtype == jnp.float32:   # f32 parity path: no f32xint8 MXU mode
        s = s.astype(jnp.float32)
    z = jax.lax.dot_general(
        y_ref[:], s, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [M, TN]
    acc_ref[:, pl.ds(ni * tn, tn)] = z * h_ref[:]

    @pl.when(ni == n_tiles - 1)
    def _():
        a = acc_ref[:]
        if fuse_ln:
            mean = jnp.mean(a, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(a - mean), axis=1, keepdims=True)
            a = (a - mean) * jax.lax.rsqrt(var + eps)
            if has_bias:
                a = a + bias_ref[:]
        out_ref[:] = a.astype(out_ref.dtype)


def _call_small_m(x2, packed, g, h, bias, eps, interpret,
                  fuse_ln: bool = True):
    m, k = x2.shape
    nw, n = packed.shape
    tn = _pick_tile(n)
    while tn * k * x2.dtype.itemsize > 4 * 1024 * 1024 and tn > 128:
        tn //= 2
    m_pad = max(_round_up(m, 16), 16)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    has_bias = bias is not None
    g2 = g.reshape(1, k).astype(x2.dtype)
    h2 = h.reshape(1, n).astype(jnp.float32)
    inputs = [x2, g2, packed, h2]
    in_specs = [
        pl.BlockSpec((m_pad, k), lambda ni: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda ni: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nw, tn), lambda ni: (0, ni), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn), lambda ni: (0, ni), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        inputs.append(bias.reshape(1, n).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, n), lambda ni: (0, 0),
                                     memory_space=pltpu.VMEM))
    else:
        inputs.append(jnp.zeros((1, 1), jnp.float32))
        in_specs.append(pl.BlockSpec((1, 1), lambda ni: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_fused_small_m_kernel, tn=tn, k=k, eps=eps,
                               has_bias=has_bias, fuse_ln=fuse_ln)
    out_dtype = x2.dtype if fuse_ln else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(n // tn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, n), lambda ni: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((m_pad, n), jnp.float32),
            pltpu.VMEM((m_pad, k), x2.dtype),
            pltpu.VMEM((k, tn), jnp.int8),
        ],
        interpret=interpret,
    )(*inputs)
    return out[:m]


# ---------------------------------------------------------------------------
# large-M kernel (prefill): grid (n_tiles, m_tiles), unpack cached per n tile
# ---------------------------------------------------------------------------

def _matmul_large_m_kernel(x_ref, g_ref, packed_ref, h_ref, out_ref, s_ref,
                           *, k: int):
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _():
        _unpack_planes(packed_ref[:], s_ref, k // WORD_BITS)

    y = x_ref[:] * g_ref[:]
    s = s_ref[:]
    if y.dtype == jnp.float32:       # f32 parity path: no f32xint8 MXU mode
        s = s.astype(jnp.float32)
    z = jax.lax.dot_general(
        y, s, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = (z * h_ref[:]).astype(out_ref.dtype)


def _call_large_m(x2, packed, g, h, eps, interpret):
    m, k = x2.shape
    nw, n = packed.shape
    # tile choice: tn from the largest divisor (isolated sweeps favored
    # tn=128 but in-model eval throughput measured ~12% faster with the
    # larger tiles); shrink under VMEM pressure for fp32/large-K
    itemsize = x2.dtype.itemsize
    tn = _pick_tile(n)
    while tn * k * itemsize > 8 * 1024 * 1024 and tn > 128:
        tn //= 2
    tm = 256
    while tm > 64 and (tm * k * itemsize * 2 + tn * k * itemsize) > 12 * 1024 * 1024:
        tm //= 2
    m_pad = _round_up(m, tm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    g2 = g.reshape(1, k).astype(x2.dtype)
    h2 = h.reshape(1, n).astype(jnp.float32)
    # bf16 inputs write bf16 z (halves output HBM traffic; LN stats still
    # fp32 in the caller); fp32 inputs keep fp32 out for the parity path
    out_dtype = jnp.float32 if x2.dtype == jnp.float32 else x2.dtype
    out = pl.pallas_call(
        functools.partial(_matmul_large_m_kernel, k=k),
        grid=(n // tn, m_pad // tm),
        in_specs=[
            pl.BlockSpec((tm, k), lambda ni, mi: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda ni, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, tn), lambda ni, mi: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, mi: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda ni, mi: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((k, tn), jnp.int8)],
        interpret=interpret,
    )(x2, g2, packed, h2)
    return out[:m]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def bitlinear_packed_pallas(x, packed, g, h, bias=None, *,
                            eps: float = LN_EPS,
                            interpret: Optional[bool] = None):
    """Packed OneBit linear: ``x [..., K]`` → ``[..., N]`` (x.dtype).

    ``packed``: int32 ``[K//32, N]`` sign words (K-major device layout,
    core.packing.pack_signs_device).  ``g [K]``, ``h [N]``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, k = x.shape
    n = packed.shape[1]
    if packed.shape[0] * WORD_BITS != k:
        raise ValueError(f"packed words {packed.shape} mismatch K={k}")
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    if m <= _SMALL_M:
        out = _call_small_m(x2, packed, g, h, bias, eps, interpret)
    else:
        z = _call_large_m(x2, packed, g, h, eps, interpret)
        z32 = z.astype(jnp.float32)
        mean = jnp.mean(z32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z32 - mean), axis=-1, keepdims=True)
        r = (z32 - mean) * jax.lax.rsqrt(var + eps)
        if bias is not None:
            r = r + bias.astype(r.dtype)
        out = r.astype(x.dtype)
    return out.reshape(*lead, n)


def bitlinear_packed_raw(x, packed, g, h, *, interpret: Optional[bool] = None):
    """``((x⊙g)·Sᵀ)⊙h`` WITHOUT LayerNorm, fp32 out — the per-shard body
    for tensor parallelism (LN happens after the cross-shard reduction).
    Dispatches small-M (decode) vs large-M schedules like the fused entry.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, k = x.shape
    n = packed.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if m <= _SMALL_M:
        z = _call_small_m(x2, packed, g, h, None, LN_EPS, interpret,
                          fuse_ln=False)
    else:
        z = _call_large_m(x2, packed, g, h, LN_EPS, interpret)
    return z.reshape(*lead, n)
