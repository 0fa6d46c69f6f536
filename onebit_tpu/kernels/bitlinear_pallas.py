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

# Mosaic's default scoped-VMEM budget is 16 MiB of the chip's 128 MiB;
# the small-M fused-LN schedule legitimately holds a full [m_pad, n_cat]
# f32 accumulator (cross-tile LayerNorm epilogue), which crosses 16 MiB
# at m_pad=128 x 7B MLP width.  32 MiB keeps every supported geometry
# compiling with ample headroom for the pipeline's own buffers.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)

# decode-schedule unpack variant; override with ONEBIT_UNPACK_VARIANT
import os as _os
DECODE_UNPACK_VARIANT = _os.environ.get("ONEBIT_UNPACK_VARIANT", "sgn")
# small-M dot schedule: split the 8 byte-planes into this many
# superplane groups, each unpacked into one of two alternating slabs and
# multiplied immediately (groups=1 == the monolithic unpack-then-dot).
# More groups -> more VPU-store/MXU-read overlap but more dot launches
# and accumulator traffic; swept on-chip via ONEBIT_PLANE_GROUPS.
PLANE_GROUPS = int(_os.environ.get("ONEBIT_PLANE_GROUPS", "1"))
if PLANE_GROUPS not in (1, 2, 4, 8):
    raise ValueError(
        f"ONEBIT_PLANE_GROUPS={PLANE_GROUPS} must be 1, 2, 4, or 8 "
        "(groups must divide the 8 byte-planes)")


def _fused_small_fits(m_pad: int, n_cat: int, out_bytes: int = 2) -> bool:
    """Scoped-VMEM gate for the fused small-M schedule: its LN epilogue
    needs the FULL ``[m_pad, n_cat]`` f32 accumulator plus the same-shape
    output block resident, which dominates the kernel's VMEM stack
    (measured: Mosaic reports acc+out + ~1.2 MB at 7B gate+up m_pad=128
    = 17.71 M).  _VMEM_PARAMS raises the scoped budget to 32 M; the gate
    caps acc+out at 24 M (leaving headroom for the y/slab scratch) so
    outsized geometries (m_pad=128 at >=65B MLP widths) fall back to the
    per-segment large-M schedule, which tiles M and is competitive there
    — m is prefill-ish, so unpack already amortizes."""
    return m_pad * n_cat * (4 + out_bytes) <= 24 * 1024 * 1024


def _slab_shapes(k: int, tn: int):
    """VMEM scratch slabs for _plane_dot at the current PLANE_GROUPS."""
    rows = k // PLANE_GROUPS
    n_slabs = 1 if PLANE_GROUPS == 1 else 2
    return [pltpu.VMEM((rows, tn), jnp.int8)] * n_slabs


def _unpack_planes(words, s_ref, nw: int, variant: str = "sgn"):
    """Unpack [K/32, TN] int32 (K-major **byte-plane** layout,
    core.packing.pack_signs_device) into s_ref [K, TN] int8.

    ``variant="sgn"``: ±1 tiles.  Per byte-plane p: ``(w >> p) & 0x01010101``
    extracts 4 bits/lane, then ``0x01010101 + bits*0xFE`` turns each byte
    into +1 (bit 0) or 0xFF = -1 (bit 1) with no cross-byte carry; a single
    int32→int8 bitcast scatters byte c of int32 sublane i to int8 sublane
    4i+c — matching the pack layout, so each iteration stores one contiguous
    [4*nw, TN] slab.  ~3 VPU ops per 4 elements + 4x-packed int8 stores —
    measured fastest of 6 strategies on v5e (scripts/ubench_unpack.py).

    ``variant="b01"``: raw 0/1 **bit** tiles (2 VPU ops per 4 elements);
    the consumer must apply the sign correction
    ``z = rowsum(y) - 2*(y·B)`` (since ``s = 1 - 2b``), which folds into
    the epilogue as one rank-1 update (scripts/probe_kernel_v2.py).
    """
    w = pltpu.bitcast(words, jnp.uint32)
    msk = jnp.uint32(0x01010101)
    for p in range(8):
        bits = (w >> p) & msk
        t = bits if variant == "b01" else msk + bits * jnp.uint32(0xFE)
        s_ref[pl.ds(p * 4 * nw, 4 * nw), :] = pltpu.bitcast(t, jnp.int8)


def _plane_dot(packed, y, slabs, nw: int, variant: str):
    """``y · Sᵀ`` for one packed tile, scheduled as ``PLANE_GROUPS``
    superplane groups of per-group partial dots on alternating slabs.

    Byte-plane p materializes rows ``[4nw·p, 4nw·(p+1))`` of S (a
    contiguous sublane slab, matching y's natural K order by the
    pack_signs_device layout), so ``z = Σ_p y[:, rows_p] · S_p`` exactly.
    groups=1 reproduces the monolithic unpack-all-then-dot schedule;
    groups>1 alternates two slabs so Mosaic can overlap group g+1's VPU
    unpack stores with group g's MXU operand reads (an isolated-tile
    probe measured 4.3x for groups=8, scripts/probe_plane_pipeline.py,
    but in-model the grid's own DMA pipelining and the extra dot
    launches/accumulator traffic shift the optimum — swept on-chip via
    ONEBIT_PLANE_GROUPS).
    """
    groups = PLANE_GROUPS
    per = 8 // groups
    w = pltpu.bitcast(packed, jnp.uint32)
    msk = jnp.uint32(0x01010101)
    z = None
    rows_per_group = 4 * nw * per
    for gi in range(groups):
        slab = slabs[gi % len(slabs)]
        for q in range(per):
            p = gi * per + q
            bits = (w >> p) & msk
            t = bits if variant == "b01" else msk + bits * jnp.uint32(0xFE)
            slab[pl.ds(q * 4 * nw, 4 * nw), :] = pltpu.bitcast(t, jnp.int8)
        s = slab[:]
        if y.dtype == jnp.float32:   # f32 parity path: no f32xint8 MXU mode
            s = s.astype(jnp.float32)
        y_g = y[:, gi * rows_per_group:(gi + 1) * rows_per_group]
        zp = jax.lax.dot_general(
            y_g, s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = zp if z is None else z + zp
    if variant == "b01":
        # planes held bits b = (1-sign)/2: true z = rowsum(y) - 2*(y·B)
        rs = jnp.sum(y.astype(jnp.float32), axis=1, keepdims=True)
        z = rs - 2.0 * z
    return z


def _drop_scalar(kernel):
    """Absorb the scalar-prefetch ref (layer index) — it is consumed only
    by the BlockSpec index maps, not the kernel body."""
    def wrapped(layer_ref, *refs):
        return kernel(*refs)
    return wrapped


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
                          acc_ref, y_ref, *slabs, tn: int, k: int,
                          eps: float, has_bias: bool, fuse_ln: bool = True,
                          variant: str = "sgn", stacked: bool = False):
    ni = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    # stacked refs carry a leading layer-block axis of size 1
    g = g_ref[0] if stacked else g_ref[:]
    h = h_ref[0] if stacked else h_ref[:]

    @pl.when(ni == 0)
    def _():
        y_ref[:] = x_ref[:] * g

    packed = packed_ref[0] if stacked else packed_ref[:]
    z = _plane_dot(packed, y_ref[:], slabs, k // WORD_BITS,
                   variant)                                  # [M, TN]
    acc_ref[:, pl.ds(ni * tn, tn)] = z * h

    @pl.when(ni == n_tiles - 1)
    def _():
        a = acc_ref[:]
        if fuse_ln:
            mean = jnp.mean(a, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(a - mean), axis=1, keepdims=True)
            a = (a - mean) * jax.lax.rsqrt(var + eps)
            if has_bias:
                a = a + (bias_ref[0] if stacked else bias_ref[:])
        out_ref[:] = a.astype(out_ref.dtype)


def _call_small_m(x2, packed, g, h, bias, eps, interpret,
                  fuse_ln: bool = True, variant: str = None):
    if variant is None:
        variant = DECODE_UNPACK_VARIANT
    m, k = x2.shape
    nw, n = packed.shape
    # s_ref is int8: cap its VMEM footprint at 8 MB (the round-1 cap sized
    # it as bf16, silently forcing tn=128 for K=11008 — 2x slower unpack)
    tn = _pick_tile(n)
    while tn * k > 8 * 1024 * 1024 and tn > 128:
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
                               has_bias=has_bias, fuse_ln=fuse_ln,
                               variant=variant)
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
            *_slab_shapes(k, tn),
        ],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*inputs)
    return out[:m]


def _call_small_m_stacked(x2, packed, g, h, bias, layer, eps, interpret,
                          fuse_ln: bool = True, variant: str = None):
    """Small-M schedule over STACKED per-layer weights.

    ``packed [L, K//32, N]``, ``g [L, K]``, ``h [L, N]`` stay whole in HBM;
    the int32 ``layer`` scalar is threaded through scalar-prefetch into the
    BlockSpec index maps, so each grid step DMAs layer ``layer``'s weight
    tile directly — no per-layer XLA slice materialization.  Inside a
    scan/fori over layers this removes a full extra read+write of the
    packed weights per decode step (~2 ms at 7B) that dynamic-slicing
    stacked params into custom-call operands costs.
    """
    if variant is None:
        variant = DECODE_UNPACK_VARIANT
    m, k = x2.shape
    L, nw, n = packed.shape
    tn = _pick_tile(n)
    while tn * k > 8 * 1024 * 1024 and tn > 128:
        tn //= 2
    m_pad = max(_round_up(m, 16), 16)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    has_bias = bias is not None
    # vectors carry a size-1 sublane axis so the (1, 1, tn) blocks satisfy
    # the TPU block rule (sublane block == array dim)
    g2 = g.reshape(L, 1, k).astype(x2.dtype)
    h2 = h.reshape(L, 1, n).astype(jnp.float32)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    inputs = [x2, g2, packed, h2]
    in_specs = [
        pl.BlockSpec((m_pad, k), lambda ni, lr: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, k), lambda ni, lr: (lr[0], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nw, tn), lambda ni, lr: (lr[0], 0, ni),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda ni, lr: (lr[0], 0, ni),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        inputs.append(bias.reshape(L, 1, n).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, 1, n), lambda ni, lr: (lr[0], 0, 0),
                                     memory_space=pltpu.VMEM))
    else:
        inputs.append(jnp.zeros((1, 1, 1), jnp.float32))
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda ni, lr: (0, 0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = _drop_scalar(functools.partial(
        _fused_small_m_kernel, tn=tn, k=k, eps=eps, has_bias=has_bias,
        fuse_ln=fuse_ln, variant=variant, stacked=True))
    out_dtype = x2.dtype if fuse_ln else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tn,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((m_pad, n), lambda ni, lr: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((m_pad, n), jnp.float32),
                pltpu.VMEM((m_pad, k), x2.dtype),
                *_slab_shapes(k, tn),
            ]),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(lidx, *inputs)
    return out[:m]


def bitlinear_packed_pallas_stacked(x, packed, g, h, layer, bias=None, *,
                                    eps: float = LN_EPS,
                                    interpret: Optional[bool] = None):
    """Packed OneBit linear with stacked per-layer weights selected on
    device: ``x [..., K]``, ``packed [L, K//32, N]``, ``g [L, K]``,
    ``h [L, N]``, ``layer`` a traced int32 scalar → ``[..., N]``.

    Decode-path companion of :func:`bitlinear_packed_pallas` for
    scan/fori-over-layers model bodies (see _call_small_m_stacked).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, k = x.shape
    n = packed.shape[2]
    if packed.shape[1] * WORD_BITS != k:
        raise ValueError(f"stacked packed {packed.shape} mismatch K={k}")
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if m > _SMALL_M:
        # prefill shapes: fall back to slicing + the large-M schedule (the
        # slice copy is negligible against large-M compute)
        pick = functools.partial(jax.lax.dynamic_index_in_dim, index=layer,
                                 axis=0, keepdims=False)
        z = _call_large_m(x2, pick(packed), pick(g), pick(h), eps, interpret)
        z32 = z.astype(jnp.float32)
        mean = jnp.mean(z32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z32 - mean), axis=-1, keepdims=True)
        r = (z32 - mean) * jax.lax.rsqrt(var + eps)
        if bias is not None:
            r = r + pick(bias).astype(r.dtype)
        return r.astype(x.dtype).reshape(*lead, n)
    out = _call_small_m_stacked(x2, packed, g, h, bias, layer, eps, interpret)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# fused multi-projection kernels: ns same-shape projections sharing one x
# (qkv / gate+up).  Segments are concatenated along N (each zero-padded to
# seg_pad); one kernel dispatch unpacks each packed tile once and selects
# the segment's y = x*g_j for the dot.  Replaces 3 (or 2) dispatches + 3
# x-loads with 1 — the per-call overhead dominates decode at batch<=16
# (scripts/probe_kernel_v2.py).
# ---------------------------------------------------------------------------

def _fused_multiseg_small_kernel(x_ref, g_ref, packed_ref, h_ref, out_ref,
                                 acc_ref, y_ref, *slabs, tn: int,
                                 k: int, ns: int, seg_pad: int, n_true: int,
                                 m_pad: int, eps: float, variant: str,
                                 fuse_ln: bool, stacked: bool = False):
    ni = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    g = g_ref[0] if stacked else g_ref
    h = h_ref[0] if stacked else h_ref[:]

    @pl.when(ni == 0)
    def _():
        for j in range(ns):
            y_ref[pl.ds(j * m_pad, m_pad), :] = \
                x_ref[:] * g[j, :][None, :]

    packed = packed_ref[0] if stacked else packed_ref[:]
    seg = ni * tn // seg_pad              # tiles never straddle segments
    y = y_ref[pl.ds(seg * m_pad, m_pad), :]
    z = _plane_dot(packed, y, slabs, k // WORD_BITS, variant)
    acc_ref[:, pl.ds(ni * tn, tn)] = z * h

    @pl.when(ni == n_tiles - 1)
    def _():
        if fuse_ln:
            inv_n = 1.0 / n_true
            for j in range(ns):
                a = acc_ref[:, j * seg_pad:(j + 1) * seg_pad]
                # moment-form LN over the TRUE width: pads have h=0 so they
                # contribute 0 to both sums
                s1 = jnp.sum(a, axis=1, keepdims=True) * inv_n
                s2 = jnp.sum(jnp.square(a), axis=1, keepdims=True) * inv_n
                var = s2 - jnp.square(s1)
                out_ref[:, j * seg_pad:(j + 1) * seg_pad] = \
                    ((a - s1) * jax.lax.rsqrt(var + eps)).astype(out_ref.dtype)
        else:
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def bitlinear_packed_fused(x, packed, g, h, *, n_true: int,
                           eps: float = LN_EPS,
                           interpret: Optional[bool] = None):
    """ns same-width projections fused along N: ``x [..., K]`` →
    list of ns arrays ``[..., n_true]``, each LayerNorm'd.

    ``packed``: int32 ``[K//32, ns*seg_pad]`` (segments zero-padded to
    ``seg_pad``), ``g [ns, K]``, ``h [ns*seg_pad]`` (zero on pads).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, k = x.shape
    ns, gk = g.shape
    n_cat = packed.shape[1]
    seg_pad = n_cat // ns
    if gk != k or packed.shape[0] * WORD_BITS != k or seg_pad * ns != n_cat:
        raise ValueError(f"fused shape mismatch: x K={k}, g {g.shape}, "
                         f"packed {packed.shape}")
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    variant = DECODE_UNPACK_VARIANT
    tn = 128
    for cand in (1024, 512, 256):
        if seg_pad % cand == 0 and cand * k <= 8 * 1024 * 1024:
            tn = cand
            break

    g2 = g.astype(x2.dtype)
    h2 = h.reshape(1, n_cat).astype(jnp.float32)

    if m <= _SMALL_M and _fused_small_fits(max(_round_up(m, 16), 16), n_cat):
        m_pad = max(_round_up(m, 16), 16)
        if m_pad != m:
            x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        out = pl.pallas_call(
            functools.partial(
                _fused_multiseg_small_kernel, tn=tn, k=k, ns=ns,
                seg_pad=seg_pad, n_true=n_true, m_pad=m_pad, eps=eps,
                variant=variant, fuse_ln=True),
            grid=(n_cat // tn,),
            in_specs=[
                pl.BlockSpec((m_pad, k), lambda ni: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ns, k), lambda ni: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k // WORD_BITS, tn), lambda ni: (0, ni),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda ni: (0, ni),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, n_cat), lambda ni: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, n_cat), x2.dtype),
            scratch_shapes=[
                pltpu.VMEM((m_pad, n_cat), jnp.float32),
                pltpu.VMEM((ns * m_pad, k), x2.dtype),
                *_slab_shapes(k, tn),
            ],
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(x2, g2, packed, h2)
        out = out[:m]
    else:
        # large-M: per-segment large-M kernels (column slices of the
        # concatenated packed words ARE each projection's packed array).
        # Unpack amortizes over m here, so the fused shared-unpack win is
        # gone anyway and ns separate dispatches cost nothing — while a
        # single fused large-M kernel would need a dynamic g-row index
        # Mosaic cannot prove aligned (bug found at m=512 batched prefill).
        outs = []
        for j in range(ns):
            packed_j = packed[:, j * seg_pad:j * seg_pad + n_true]
            h_j = h[j * seg_pad:j * seg_pad + n_true]
            z = _call_large_m(x2, packed_j, g[j], h_j, eps, interpret)
            a = z.astype(jnp.float32)
            mean = jnp.mean(a, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(a - mean), axis=-1, keepdims=True)
            outs.append(((a - mean) * jax.lax.rsqrt(var + eps))
                        .astype(x.dtype).reshape(*lead, n_true))
        return outs
    return [out[:, j * seg_pad:j * seg_pad + n_true].reshape(*lead, n_true)
            for j in range(ns)]


def bitlinear_packed_fused_stacked(x, packed, g, h, layer, *, n_true: int,
                                   eps: float = LN_EPS,
                                   interpret: Optional[bool] = None):
    """Stacked-layer variant of :func:`bitlinear_packed_fused` (small-M /
    decode only): ``packed [L, K//32, ns*seg_pad]``, ``g [L, ns, K]``,
    ``h [L, ns*seg_pad]``, ``layer`` a traced int32 scalar.  The layer's
    weight tiles are DMA'd straight from the stacked HBM arrays via
    scalar-prefetch index maps (see _call_small_m_stacked)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, k = x.shape
    L, nwords, n_cat = packed.shape
    ns = g.shape[1]
    seg_pad = n_cat // ns
    if g.shape[2] != k or nwords * WORD_BITS != k or seg_pad * ns != n_cat:
        raise ValueError(f"fused stacked shape mismatch: x K={k}, "
                         f"g {g.shape}, packed {packed.shape}")
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if m > _SMALL_M or \
            not _fused_small_fits(max(_round_up(m, 16), 16), n_cat):
        pick = functools.partial(jax.lax.dynamic_index_in_dim, index=layer,
                                 axis=0, keepdims=False)
        return bitlinear_packed_fused(x, pick(packed), pick(g), pick(h),
                                      n_true=n_true, eps=eps,
                                      interpret=interpret)
    variant = DECODE_UNPACK_VARIANT
    tn = 128
    for cand in (1024, 512, 256):
        if seg_pad % cand == 0 and cand * k <= 8 * 1024 * 1024:
            tn = cand
            break
    m_pad = max(_round_up(m, 16), 16)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    g2 = g.astype(x2.dtype)                        # [L, ns, K]
    h2 = h.reshape(L, 1, n_cat).astype(jnp.float32)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        _drop_scalar(functools.partial(
            _fused_multiseg_small_kernel, tn=tn, k=k, ns=ns,
            seg_pad=seg_pad, n_true=n_true, m_pad=m_pad, eps=eps,
            variant=variant, fuse_ln=True, stacked=True)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_cat // tn,),
            in_specs=[
                pl.BlockSpec((m_pad, k), lambda ni, lr: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns, k), lambda ni, lr: (lr[0], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nwords, tn), lambda ni, lr: (lr[0], 0, ni),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tn), lambda ni, lr: (lr[0], 0, ni),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, n_cat), lambda ni, lr: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((m_pad, n_cat), jnp.float32),
                pltpu.VMEM((ns * m_pad, k), x2.dtype),
                *_slab_shapes(k, tn),
            ]),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_cat), x2.dtype),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(lidx, x2, g2, packed, h2)
    out = out[:m]
    return [out[:, j * seg_pad:j * seg_pad + n_true].reshape(*lead, n_true)
            for j in range(ns)]


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
    # larger tiles); shrink under VMEM pressure for fp32/large-K.
    # ONEBIT_LARGEM_TM / ONEBIT_LARGEM_TN override for on-chip sweeps
    # (scripts/probe_largem_sweep.py).
    itemsize = x2.dtype.itemsize
    tn_env = int(_os.environ.get("ONEBIT_LARGEM_TN", "0"))
    tn = tn_env if tn_env and n % tn_env == 0 else _pick_tile(n)
    while tn * k * itemsize > 8 * 1024 * 1024 and tn > 128:
        tn //= 2
    tm = int(_os.environ.get("ONEBIT_LARGEM_TM", "0")) or 256
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
        compiler_params=_VMEM_PARAMS,
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


def bitlinear_packed_raw_stacked(x, packed, g, h, layer, *,
                                 interpret: Optional[bool] = None):
    """Stacked-layer ``((x⊙g)·Sᵀ)⊙h`` WITHOUT LayerNorm, fp32 out.

    The tensor-parallel companion of :func:`bitlinear_packed_pallas_stacked`:
    inside a shard_map TP body each device holds the LOCAL shard of the
    stacked weights (``packed [L, K//32, N/mp]`` column-parallel, or
    ``[L, K_local//32, N]`` row-parallel) and the LayerNorm happens after
    the cross-shard moment/activation psum — so the kernel must return the
    raw projection.  Same scalar-prefetch layer selection as the fused
    path: no per-layer weight-slice materialization inside fori-over-layers
    bodies (the ~2x decode step cost the scan path pays, PERF.md).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, k = x.shape
    n = packed.shape[2]
    if packed.shape[1] * WORD_BITS != k:
        raise ValueError(f"stacked packed {packed.shape} mismatch K={k}")
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if m > _SMALL_M:
        pick = functools.partial(jax.lax.dynamic_index_in_dim, index=layer,
                                 axis=0, keepdims=False)
        z = _call_large_m(x2, pick(packed), pick(g), pick(h), LN_EPS,
                          interpret).astype(jnp.float32)
    else:
        z = _call_small_m_stacked(x2, packed, g, h, None, layer, LN_EPS,
                                  interpret, fuse_ln=False)
    return z.reshape(*lead, n)


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
