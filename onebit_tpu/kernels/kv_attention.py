"""Fused decode attention over the quantized FLAT KV cache (Pallas).

Deep-context decode (VERDICT r2 item 4): at 7B b=4 T=2048 the XLA int8
attention path costs 4.6 ms/step against a 2.7 ms HBM floor — ~1.9 ms of
VPU dequantization (int8→bf16 convert + scale math) that exists only
because XLA's dot wants uniform operand dtypes.  The MXU itself takes an
int8 operand directly (the packed-sign kernels live on that), so this
kernel streams the int8 pools tile-by-tile and feeds them to the MXU
as-is:

* per grid cell ``(b, tb)``: DMA one ``[T_BLK, nkv, hd]`` int8 K tile, V
  tile and their ``[T_BLK, nkv]`` scale tiles from the STACKED pools
  ``[L, B, T, nkv, hd]`` — the layer index arrives via scalar prefetch,
  so no per-layer pool slice is ever materialized;
* per head: ``scores = q_n [g, hd] · K_nᵀ`` as a transposed-rhs mixed
  bf16×s8 ``dot_general`` (fp32 accumulate), absmax scales folded into
  the score rows, positions ≥ length masked;
* flash-style online softmax across T blocks (running max / denom /
  accumulator in VMEM scratch), ``P·V`` again as mixed bf16×s8 dots with
  the V scales folded into P;
* the output block writes once, on each row's final T block.

Numerics: identical quantization convention to
``model.kv_cache.quantize_kv`` / ``model.bitllama._attention_quant``
(absmax over head_dim; the stored scale is PRE-DIVIDED, scale =
absmax/127, so dequant is int8 · scale and ``inv_scale`` defaults to
1.0); softmax in fp32.  Tested against the XLA path in interpret mode
(tests/test_kv_attention.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# T-block size: perf knob (swept on-chip, scripts/probe_kt_step.py); 512
# balances DMA size (2 MB K + 2 MB V tiles at 7B) against grid overhead
DEFAULT_T_BLK = int(os.environ.get("ONEBIT_KV_TBLK", "512"))

# Raised scoped-VMEM budget (default 16 MiB of the 128 MiB chip VMEM):
# unlocks t_blk=1024 tiles, whose K+V+scores stack measured 18.4 M
# (PERF.md deep-context sweep).
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _kernel(lidx_ref, lengths_ref, starts_ref, q_ref, kq_ref, ks_ref,
            vq_ref, vs_ref, out_ref, s_scr, m_scr, l_scr, acc_scr, *,
            nkv: int, g: int, hd: int, t_blk: int, inv_scale: float,
            quant: bool):
    b = pl.program_id(0)
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)
    nh = nkv * g

    @pl.when(tb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [nh, hd] bf16
    kt = kq_ref[0, 0]                  # [T_BLK, nkv, hd] s8 (or bf16/fp8)
    vt = vq_ref[0, 0]
    if quant:
        # [T_BLK, nkv] absmax scales → [nkv, T_BLK] rows (per-head)
        ks_t = ks_ref[0, 0].T * jnp.float32(inv_scale)
        vs_t = vs_ref[0, 0].T * jnp.float32(inv_scale)

    # scores for every head → S [nh, T_BLK] f32
    for n in range(nkv):
        k_n = kt[:, n, :]                              # [T_BLK, hd]
        if k_n.dtype != q.dtype and not quant:
            k_n = k_n.astype(q.dtype)                  # fp8 pools
        s_n = jax.lax.dot_general(
            q[n * g:(n + 1) * g], k_n,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, T_BLK]
        if quant:
            s_n = s_n * ks_t[n][None, :]
        s_scr[n * g:(n + 1) * g, :] = s_n * (hd ** -0.5)

    length = lengths_ref[b]
    start = starts_ref[b]
    col = tb * t_blk + jax.lax.broadcasted_iota(jnp.int32, (nh, t_blk), 1)
    s = jnp.where((col >= start) & (col < length), s_scr[:],
                  jnp.float32(-1e30))

    # online softmax update (batched over all heads)
    m_old = m_scr[:]                                   # [nh, 1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                             # [nh, T_BLK]
    alpha = jnp.exp(m_old - m_new)                     # [nh, 1]
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_new

    if quant:
        # fold V scales into P so the PV dot consumes raw int8 V
        p = p * jnp.repeat(vs_t, g, axis=0)
    p16 = p.astype(q.dtype)
    for n in range(nkv):
        v_n = vt[:, n, :]                              # [T_BLK, hd]
        if v_n.dtype != q.dtype and not quant:
            v_n = v_n.astype(q.dtype)
        pv = jax.lax.dot_general(
            p16[n * g:(n + 1) * g], v_n,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, hd]
        rows = slice(n * g, (n + 1) * g)
        acc_scr[rows, :] = acc_scr[rows, :] * alpha[rows] + pv

    @pl.when(tb == n_tb - 1)
    def _():
        # max(l, tiny) guards 0/0: a fully-masked row (length 0 — an
        # inactive engine slot) stays FINITE (the all-masked softmax
        # degenerates to uniform attention — garbage, but inactive slots
        # are never read); parity with _kernel_kt
        out_ref[0] = (acc_scr[:] /
                      jnp.maximum(l_scr[:], 1e-30)).astype(out_ref.dtype)


def _kernel_kt(lidx_ref, lengths_ref, starts_ref, q_ref, kq_ref, ks_ref,
               vq_ref, vs_ref, out_ref, s_scr, m_scr, l_scr, acc_scr, *,
               nkv: int, g: int, hd: int, t_blk: int, inv_scale: float):
    """Transposed-K variant: K pool ``[L, B, nkv, hd, T]`` and K scales
    ``[L, B, nkv, T]`` so EVERY dot is the Mosaic-native bf16-LHS × s8-RHS
    standard orientation (the packed-sign kernels' proven MXU mode) — the
    layout-agnostic variant pays per-head s8 relayouts for its transposed
    contraction (measured 6.2 vs 4.6 ms XLA at 7B b4 T2048; this one wins,
    see scripts/probe_kv_kernel.py)."""
    b = pl.program_id(0)
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)
    nh = nkv * g

    @pl.when(tb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [nh, hd] bf16
    kt = kq_ref[0, 0]                  # [nkv, hd, T_BLK] s8
    vt = vq_ref[0, 0]                  # [T_BLK, nkv, hd] s8
    ks_t = ks_ref[0, 0] * jnp.float32(inv_scale)       # [nkv, T_BLK]
    vs_t = vs_ref[0, 0].T * jnp.float32(inv_scale)     # [nkv, T_BLK]

    for n in range(nkv):
        s_n = jax.lax.dot_general(
            q[n * g:(n + 1) * g], kt[n],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, T_BLK]
        s_scr[n * g:(n + 1) * g, :] = \
            s_n * ks_t[n][None, :] * (hd ** -0.5)

    length = lengths_ref[b]
    start = starts_ref[b]
    col = tb * t_blk + jax.lax.broadcasted_iota(jnp.int32, (nh, t_blk), 1)
    s = jnp.where((col >= start) & (col < length), s_scr[:],
                  jnp.float32(-1e30))

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_old - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_new

    p16 = (p * jnp.repeat(vs_t, g, axis=0)).astype(q.dtype)
    for n in range(nkv):
        pv = jax.lax.dot_general(
            p16[n * g:(n + 1) * g], vt[:, n, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, hd]
        rows = slice(n * g, (n + 1) * g)
        acc_scr[rows, :] = acc_scr[rows, :] * alpha[rows] + pv

    @pl.when(tb == n_tb - 1)
    def _():
        # max(l, tiny) guards 0/0; a fully-masked row (length 0 — an
        # inactive engine slot) stays finite (degenerates to uniform
        # attention; inactive slots are never read)
        out_ref[0] = (acc_scr[:] /
                      jnp.maximum(l_scr[:], 1e-30)).astype(out_ref.dtype)


def _kernel_append_kt(lidx_ref, lengths_ref, starts_ref, pos_ref, q_ref,
                      knew_ref, ksnew_ref, vnew_ref, vsnew_ref, vsnewt_ref,
                      kq_ref, ks_ref, vq_ref, vs_ref, out_ref,
                      kqout_ref, ksout_ref, vqout_ref, vsout_ref,
                      s_scr, m_scr, l_scr, acc_scr, *, nkv: int,
                      g: int, hd: int, t_blk: int, wb: int,
                      inv_scale: float):
    """Transposed-K attention that ALSO appends this step's K/V column
    and both scale columns — the cache update happens entirely in-kernel
    through input/output aliases; the caller issues ZERO XLA writes.

    Why: the one-token K write into a ``[.., hd, T]`` pool as an XLA
    dynamic_update_slice is a stride-T scatter (~1.2 ms/step at 7B b4
    T2048, scripts/probe_kt_step.py), and per-row VECTOR-index scatters
    for V/scales around the aliased custom call defeat XLA's in-place
    buffer forwarding entirely — measured +6.5 ms/step of pool copies in
    the ragged engine step (scripts/probe_ragged_kt.py: scatters alone
    0.14 ms, scatters+kernel 17.26 vs 10.80 with the writes moved).

    Mechanics per row ``b`` at its (possibly ragged) ``pos``:

    * K column: at the grid step whose tile contains ``pos`` the kernel
      recomputes that column's scores from ``knew``/``ksnew`` directly
      and writes back ONE ``wb``-wide aliased sub-block (masked insert
      in the 32-bit domain — Mosaic supports neither non-no-op minor-dim
      insertion on int8 nor unaligned dynamic lane stores).
    * K scale column: same wb-wide aliased write-back on the RAW
      (un-``inv_scale``-d) scale tile.
    * V row + V scale row: T is a LEADING dim of the V pools, so the
      fresh row is one contiguous block — aliased out blocks of T-size 1
      pinned at ``pos`` write ``vnew``/``vsnew`` straight through.
    * PV fix-up: the V tile still holds stale bytes at ``pos``, so the
      ``pos`` column of P is zeroed for the tile dot and its
      contribution re-added as a rank-1 update ``p_pos · dequant(vnew)``.
    """
    b = pl.program_id(0)
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)
    nh = nkv * g

    @pl.when(tb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [nh, hd] bf16
    kt = kq_ref[0, 0]                  # [nkv, hd, T_BLK] s8
    vt = vq_ref[0, 0]                  # [T_BLK, nkv, hd] s8
    ks_t = ks_ref[0, 0] * jnp.float32(inv_scale)       # [nkv, T_BLK]
    vs_t = vs_ref[0, 0].T * jnp.float32(inv_scale)     # [nkv, T_BLK]

    for n in range(nkv):
        s_n = jax.lax.dot_general(
            q[n * g:(n + 1) * g], kt[n],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, T_BLK]
        s_scr[n * g:(n + 1) * g, :] = \
            s_n * ks_t[n][None, :] * (hd ** -0.5)

    pos = pos_ref[b]                   # per-row write position (ragged)
    jb = pos // t_blk
    col = pos - jb * t_blk

    @pl.when(tb == jb)
    def _():
        knew = knew_ref[0]                             # [nkv, hd] s8
        # sub-block write-back: copy the wb-wide slice containing pos,
        # insert the column, store to the aliased out ref
        off = (col // wb) * wb
        sub32 = kq_ref[0, 0, :, :, pl.ds(off, wb)].astype(jnp.int32)
        colsel = jax.lax.broadcasted_iota(
            jnp.int32, (nkv, hd, wb), 2) == (col - off)
        ins = jnp.where(colsel, knew.astype(jnp.int32)[:, :, None], sub32)
        kqout_ref[0, 0] = ins.astype(jnp.int8)
        # K scale column: same wb-wide insert on the raw scale tile
        ks_sub = ks_ref[0, 0, :, pl.ds(off, wb)]       # [nkv, wb] f32 raw
        sel2 = jax.lax.broadcasted_iota(
            jnp.int32, (nkv, wb), 1) == (col - off)
        ksout_ref[0, 0] = jnp.where(sel2, ksnew_ref[0], ks_sub)
        # V row: the aliased T-size-1 block pinned at pos takes the
        # fresh row whole
        vqout_ref[0, 0, 0] = vnew_ref[0]
        # V scale row: the Mosaic block rule needs an 8-row T sub-block
        # ((1,...,1,nkv) blocks are illegal on a [..., T, nkv] array) —
        # masked insert into the 8 rows around pos from the resident tile
        off8 = (col // 8) * 8
        vs_sub = vs_ref[0, 0, pl.ds(off8, 8), :]       # [8, nkv] f32 raw
        sel8 = jax.lax.broadcasted_iota(
            jnp.int32, (8, nkv), 0) == (col - off8)
        vsout_ref[0, 0] = jnp.where(sel8, vsnewt_ref[0], vs_sub)

    # fresh-column score fix-up: the pool tiles hold stale bytes at pos,
    # so recompute that one column from knew/ksnew directly.  All masked
    # elementwise math — no unaligned dynamic lane load/store.
    length = lengths_ref[b]
    start = starts_ref[b]
    cols = tb * t_blk + jax.lax.broadcasted_iota(jnp.int32, (nh, t_blk), 1)
    ks_pos = ksnew_ref[0] * jnp.float32(inv_scale)     # [nkv, 1]
    s_col = jnp.sum(
        q.astype(jnp.float32)
        * jnp.repeat(knew_ref[0].astype(jnp.float32), g, axis=0),
        axis=-1, keepdims=True)                        # [nh, 1]
    s_col = s_col * jnp.repeat(ks_pos, g, axis=0) * (hd ** -0.5)
    valid = (cols >= start) & (cols < length)
    s = jnp.where(valid, s_scr[:], jnp.float32(-1e30))
    s = jnp.where(valid & (cols == pos),
                  jnp.broadcast_to(s_col, s.shape), s)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_old - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_new

    # stale-V guard: zero the pos column for the tile dot, re-add its
    # true contribution from vnew (p at pos is nonzero only when
    # tb == jb AND pos is valid, so the rank-1 term vanishes elsewhere)
    live = valid & (cols == pos)
    p_pos = jnp.sum(jnp.where(live, p, 0.0), axis=1,
                    keepdims=True)                     # [nh, 1]
    p_dot = jnp.where(cols == pos, 0.0, p)
    vnew_deq = vnew_ref[0].astype(jnp.float32) * \
        (vsnew_ref[0] * jnp.float32(inv_scale))        # [nkv, hd]

    p16 = (p_dot * jnp.repeat(vs_t, g, axis=0)).astype(q.dtype)
    for n in range(nkv):
        pv = jax.lax.dot_general(
            p16[n * g:(n + 1) * g], vt[:, n, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, hd]
        rows = slice(n * g, (n + 1) * g)
        acc_scr[rows, :] = acc_scr[rows, :] * alpha[rows] + pv + \
            p_pos[rows] * vnew_deq[n][None, :]

    @pl.when(tb == n_tb - 1)
    def _():
        out_ref[0] = (acc_scr[:] /
                      jnp.maximum(l_scr[:], 1e-30)).astype(out_ref.dtype)


def kv_attention_append_kt(q, k_new, k_snew, v_new, v_snew, k_qt, k_st,
                           v_q, v_s, lengths, layer, pos, *, starts=None,
                           inv_scale: float = 1.0,
                           t_blk: int = DEFAULT_T_BLK, wb: int = 128,
                           interpret: Optional[bool] = None):
    """Fused append+attend over the transposed-K quantized pool.

    Like :func:`kv_attention_decode_kt` but additionally inserts this
    step's quantized K/V column — ``k_new/v_new [B, nkv, hd]`` int8 with
    raw scales ``k_snew/v_snew [B, nkv]`` f32 — at each row's ``pos`` of
    layer ``layer``.  ALL four pool returns alias their input buffers:
    the caller must not issue any XLA cache write (per-row vector-index
    scatters around this call defeat XLA's in-place buffer forwarding
    and cost multi-GB pool copies — scripts/probe_ragged_kt.py).

    ``pos`` is a scalar (lockstep decode) or ``[B]`` per-row positions
    (the continuous-batching engine's ragged decode); the aliased
    write-back block indices are scalar-prefetched per row.
    ``lengths[b]`` must be > pos for rows that attend the new token
    (``lengths[b] == 0`` fully masks an inactive row → finite garbage,
    never read by the engine; its cache writes still land at that row's
    ``pos``, which the engine holds fixed for frozen rows, so the
    rewrite is idempotent).
    Returns ``(ctx [B, nh, hd], k_qt', k_st', v_q', v_s')``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nh, hd = q.shape
    nkv = k_qt.shape[2]
    t = k_qt.shape[4]
    g = nh // nkv
    while t % t_blk and t_blk > 128:
        t_blk //= 2
    if t % t_blk:
        raise ValueError(f"T={t} not divisible by a supported block")
    if t_blk % wb:
        raise ValueError(f"wb={wb} must divide t_blk={t_blk}")

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts = jnp.asarray(starts, jnp.int32).reshape(b)
    posv = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    # scale operands in the orientations the kernel consumes ([nkv, 1]
    # for score/PV math, [1, nkv] for the vs-row insert) — Mosaic block
    # rules forbid (1, nkv) blocks on a [B, nkv] array and tiny in-kernel
    # transposes are relayouts
    k_snew = jnp.asarray(k_snew, jnp.float32).reshape(b, nkv, 1)
    v_snew = jnp.asarray(v_snew, jnp.float32).reshape(b, nkv, 1)
    v_snew_t = v_snew.reshape(b, 1, nkv)
    ctx, k_qt_new, k_st_new, v_q_new, v_s_new = pl.pallas_call(
        functools.partial(_kernel_append_kt, nkv=nkv, g=g, hd=hd,
                          t_blk=t_blk, wb=wb, inv_scale=inv_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, t // t_blk),
            in_specs=[
                pl.BlockSpec((1, nh, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, 1),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, 1),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, hd, t_blk),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, 0, tb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, t_blk),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, tb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t_blk, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, tb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t_blk, nkv),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, tb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nh, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                # ONE wb-wide sub-block of each K pool, pinned to the
                # row's pos//wb — revisited across tb, written at tb==jb
                pl.BlockSpec((1, 1, nkv, hd, wb),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, 0, ps[bb] // wb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, wb),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, ps[bb] // wb),
                             memory_space=pltpu.VMEM),
                # V pool: T is a leading dim, so the fresh row is one
                # contiguous T-size-1 block pinned at the row's pos
                pl.BlockSpec((1, 1, 1, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, ps[bb], 0, 0),
                             memory_space=pltpu.VMEM),
                # V scales: T is SECOND-TO-LAST here, so the legal block
                # is an 8-row T window containing pos (masked insert)
                pl.BlockSpec((1, 1, 8, nkv),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, ps[bb] // 8, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((nh, t_blk), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, hd), jnp.float32),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
            jax.ShapeDtypeStruct(k_qt.shape, k_qt.dtype),
            jax.ShapeDtypeStruct(k_st.shape, k_st.dtype),
            jax.ShapeDtypeStruct(v_q.shape, v_q.dtype),
            jax.ShapeDtypeStruct(v_s.shape, v_s.dtype),
        ],
        # pool inputs (after 4 scalars + q, k_new, k_snew, v_new, v_snew,
        # v_snew_t) alias the pool outputs
        input_output_aliases={10: 1, 11: 2, 12: 3, 13: 4},
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(lidx, lengths, starts, posv, q, k_new, k_snew, v_new, v_snew,
      v_snew_t, k_qt, k_st, v_q, v_s)
    return ctx, k_qt_new, k_st_new, v_q_new, v_s_new


def kv_attention_decode_kt(q, k_qt, k_st, v_q, v_s, lengths, layer, *,
                           starts=None, inv_scale: float = 1.0,
                           t_blk: int = DEFAULT_T_BLK,
                           interpret: Optional[bool] = None):
    """Fused decode attention over the TRANSPOSED-K quantized pool.

    q ``[B, nh, hd]`` bf16; ``k_qt [L, B, nkv, hd, T]`` int8 (K stored
    head-major, hd × T — the MXU-native rhs orientation),
    ``k_st [L, B, nkv, T]`` fp32, ``v_q [L, B, T, nkv, hd]`` int8,
    ``v_s [L, B, T, nkv]`` fp32; ``lengths [B]``; ``layer`` traced int32.
    ``starts [B]`` (optional) masks positions below it per row — the
    ``key_start`` left-pad convention of ``bitllama.decode_step``.
    Returns ``[B, nh, hd]`` in q.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nh, hd = q.shape
    L = k_qt.shape[0]
    nkv = k_qt.shape[2]
    t = k_qt.shape[4]
    g = nh // nkv
    while t % t_blk and t_blk > 128:
        t_blk //= 2
    if t % t_blk:
        raise ValueError(f"T={t} not divisible by a supported block")

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts = jnp.asarray(starts, jnp.int32).reshape(b)
    out = pl.pallas_call(
        functools.partial(_kernel_kt, nkv=nkv, g=g, hd=hd, t_blk=t_blk,
                          inv_scale=inv_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, t // t_blk),
            in_specs=[
                pl.BlockSpec((1, nh, hd),
                             lambda bb, tb, lr, ln, st: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, hd, t_blk),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, 0, 0, tb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, t_blk),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, 0, tb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t_blk, nkv, hd),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, tb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t_blk, nkv),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, tb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nh, hd),
                                   lambda bb, tb, lr, ln, st: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nh, t_blk), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, hd), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(lidx, lengths, starts, q, k_qt, k_st, v_q, v_s)
    return out


def _unpack_nibbles(p32):
    """Sign-extended int32 bytes → (low nibble, high nibble) int8 planes."""
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)   # bytes arrive sign-extended: >>4 is exact
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _kernel_kt4(lidx_ref, lengths_ref, starts_ref, q_ref, kqp_ref, ksa_ref,
                ksb_ref, vqp_ref, vsa_ref, vsb_ref, out_ref, s_scr, m_scr,
                l_scr, acc_scr, *, nkv: int, g: int, hd: int, t_blk: int,
                t_half: int, inv_scale: float):
    """INT4 (nibble-packed) variant of ``_kernel_kt``.

    Pools are packed two columns per byte in the HALF-PLANE layout
    (``model.kv_cache.pack_int4_halfplane``): the packed tile at byte
    columns [tb·tbp, (tb+1)·tbp) unpacks to unpacked columns
    [tb·tbp, ...) (low nibbles, plane A) and [T/2 + tb·tbp, ...) (high
    nibbles, plane B) — two CONTIGUOUS groups, no lane interleave.  The
    flash-style online softmax is column-order-independent, so each grid
    step simply scores both groups with their true column indices for
    masking.  Scales keep full T resolution in the int8 cache's layout;
    the two plane tiles arrive as separate offset BlockSpecs.
    """
    b = pl.program_id(0)
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)
    nh = nkv * g
    tbp = t_blk // 2                   # packed bytes per grid step

    @pl.when(tb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                       # [nh, hd] bf16
    k_lo, k_hi = _unpack_nibbles(
        kqp_ref[0, 0].astype(jnp.int32))               # [nkv, hd, tbp] s8
    ksa = ksa_ref[0, 0] * jnp.float32(inv_scale)       # [nkv, tbp]
    ksb = ksb_ref[0, 0] * jnp.float32(inv_scale)

    for n in range(nkv):
        qn = q[n * g:(n + 1) * g]
        sa = jax.lax.dot_general(
            qn, k_lo[n], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, tbp]
        sb = jax.lax.dot_general(
            qn, k_hi[n], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_scr[n * g:(n + 1) * g, :tbp] = sa * ksa[n][None, :] * (hd ** -0.5)
        s_scr[n * g:(n + 1) * g, tbp:] = sb * ksb[n][None, :] * (hd ** -0.5)

    length = lengths_ref[b]
    start = starts_ref[b]
    ii = jax.lax.broadcasted_iota(jnp.int32, (nh, t_blk), 1)
    col = jnp.where(ii < tbp, tb * tbp + ii,
                    t_half + tb * tbp + (ii - tbp))
    s = jnp.where((col >= start) & (col < length), s_scr[:],
                  jnp.float32(-1e30))

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_old - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_new

    v_lo, v_hi = _unpack_nibbles(
        vqp_ref[0, 0].astype(jnp.int32))               # [tbp, nkv, hd] s8
    vsa = vsa_ref[0, 0].T * jnp.float32(inv_scale)     # [nkv, tbp]
    vsb = vsb_ref[0, 0].T * jnp.float32(inv_scale)
    pa = (p[:, :tbp] * jnp.repeat(vsa, g, axis=0)).astype(q.dtype)
    pb = (p[:, tbp:] * jnp.repeat(vsb, g, axis=0)).astype(q.dtype)
    for n in range(nkv):
        rows = slice(n * g, (n + 1) * g)
        pva = jax.lax.dot_general(
            pa[rows], v_lo[:, n, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, hd]
        pvb = jax.lax.dot_general(
            pb[rows], v_hi[:, n, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[rows, :] = acc_scr[rows, :] * alpha[rows] + pva + pvb

    @pl.when(tb == n_tb - 1)
    def _():
        out_ref[0] = (acc_scr[:] /
                      jnp.maximum(l_scr[:], 1e-30)).astype(out_ref.dtype)


def _kernel_append_kt4(lidx_ref, lengths_ref, starts_ref, pos_ref, q_ref,
                       knew_ref, ksnew_ref, vnew_ref, vsnew_ref, vsnewt_ref,
                       kqp_ref, kst_ref, vqp_ref, vs_ref,
                       out_ref, kqpout_ref, kstout_ref, vqpout_ref,
                       vsout_ref, s_scr, m_scr, l_scr,
                       acc_scr, *, nkv: int, g: int, hd: int, t_blk: int,
                       t_half: int, wb: int, inv_scale: float):
    """INT4 append+attend: ``_kernel_append_kt`` over nibble-packed pools.

    FULLY fused (round 5): the K nibble, the K scale column, the V nibble
    row (read-modify-write preserving the partner plane's nibble) and the
    V scale row ALL land in-kernel through aliased write-backs — XLA
    scatters around the aliased call defeat in-place buffer forwarding
    and cost pool copies (the int8 lesson, scripts/probe_ragged_kt.py;
    re-measured for int4 at engine level: 0.61x the int8 rate with the
    V/scale writes outside vs ~0.9x fused).

    Scale operands arrive PLANE-SPLIT as zero-copy reshapes —
    ``kst [L, B, nkv, 2, T/2]`` and ``vs [L, B, 2, T/2, nkv]`` — so each
    array is passed ONCE (both plane tiles through one BlockSpec) and can
    be cleanly aliased; passing the same buffer twice with plane-offset
    specs would force XLA to copy the second (read) operand of the
    donated buffer.

    The fresh K column at ``pos`` targets byte column ``c = pos % (T/2)``
    nibble ``pos // (T/2)``; merges preserve the byte's OTHER nibble via
    masked byte math in the 32-bit domain.  Scores AND the PV product are
    fixed up at ``pos``: the pool tiles hold stale bytes there, so that
    column's score is recomputed from ``knew``/``ksnew`` directly and its
    PV contribution is re-added as a rank-1 update from ``vnew``.
    """
    b = pl.program_id(0)
    tb = pl.program_id(1)
    n_tb = pl.num_programs(1)
    nh = nkv * g
    tbp = t_blk // 2

    @pl.when(tb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k_lo, k_hi = _unpack_nibbles(kqp_ref[0, 0].astype(jnp.int32))
    kst = kst_ref[0, 0]                               # [nkv, 2, tbp] raw
    ksa = kst[:, 0, :] * jnp.float32(inv_scale)
    ksb = kst[:, 1, :] * jnp.float32(inv_scale)

    for n in range(nkv):
        qn = q[n * g:(n + 1) * g]
        sa = jax.lax.dot_general(
            qn, k_lo[n], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sb = jax.lax.dot_general(
            qn, k_hi[n], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_scr[n * g:(n + 1) * g, :tbp] = sa * ksa[n][None, :] * (hd ** -0.5)
        s_scr[n * g:(n + 1) * g, tbp:] = sb * ksb[n][None, :] * (hd ** -0.5)

    pos = pos_ref[b]
    hi_plane = pos >= t_half           # traced bool: which nibble
    c = pos - jnp.where(hi_plane, t_half, 0)   # byte column in [0, T/2)
    jb = c // tbp
    col_in_tile = c - jb * tbp

    @pl.when(tb == jb)
    def _():
        # K nibble: wb-wide aliased sub-block, masked byte merge
        knew4 = knew_ref[0].astype(jnp.int32) & 0xF    # [nkv, hd]
        off = (col_in_tile // wb) * wb
        sub32 = kqp_ref[0, 0, :, :, pl.ds(off, wb)].astype(jnp.int32)
        bytesel = jax.lax.broadcasted_iota(
            jnp.int32, (nkv, hd, wb), 2) == (col_in_tile - off)
        # preserve the other plane's nibble; bits ≥8 die in the s8 cast
        merged_lo = (sub32 & 0xF0) | knew4[:, :, None]
        merged_hi = (sub32 & 0x0F) | (knew4[:, :, None] << 4)
        merged = jnp.where(hi_plane, merged_hi, merged_lo)
        kqpout_ref[0, 0] = jnp.where(bytesel, merged, sub32).astype(jnp.int8)
        # K scale column: wb-window of the CURRENT plane's raw scale tile
        # (wb | tbp | t_half keeps the window inside one plane tile, and
        # the out block pinned at (plane, c//wb) lands on the same
        # columns)
        # the out block spans BOTH planes (Mosaic's block rule forbids a
        # size-1 second-to-last block on the size-2 plane axis): insert
        # into the live plane, copy the other plane's window through
        ksa_w = kst_ref[0, 0, :, 0, pl.ds(off, wb)]    # raw (un-scaled)
        ksb_w = kst_ref[0, 0, :, 1, pl.ds(off, wb)]
        sel2 = jax.lax.broadcasted_iota(
            jnp.int32, (nkv, wb), 1) == (col_in_tile - off)
        kstout_ref[0, 0, :, 0] = jnp.where(sel2 & ~hi_plane,
                                           ksnew_ref[0], ksa_w)
        kstout_ref[0, 0, :, 1] = jnp.where(sel2 & hi_plane,
                                           ksnew_ref[0], ksb_w)
        # V nibble row RMW: the old byte row is extracted from the
        # resident tile by a masked reduce (no unaligned dynamic sublane
        # load), merged, and written through the T/2-size-1 aliased block
        rowsel = jax.lax.broadcasted_iota(
            jnp.int32, (tbp, nkv, hd), 0) == col_in_tile
        old32 = jnp.sum(jnp.where(rowsel, vqp_ref[0, 0].astype(jnp.int32),
                                  0), axis=0)          # [nkv, hd]
        n4v = vnew_ref[0].astype(jnp.int32) & 0xF
        merged_v = jnp.where(hi_plane, (old32 & 0x0F) | (n4v << 4),
                             (old32 & 0xF0) | n4v)
        vqpout_ref[0, 0, 0] = merged_v.astype(jnp.int8)
        # V scale row: 8-row window of the current plane's raw tile
        off8 = (col_in_tile // 8) * 8
        vsa_w = vs_ref[0, 0, 0, pl.ds(off8, 8), :]
        vsb_w = vs_ref[0, 0, 1, pl.ds(off8, 8), :]
        sub_vs = jnp.where(hi_plane, vsb_w, vsa_w)
        sel8 = jax.lax.broadcasted_iota(
            jnp.int32, (8, nkv), 0) == (col_in_tile - off8)
        vsout_ref[0, 0, 0] = jnp.where(sel8, vsnewt_ref[0], sub_vs)

    length = lengths_ref[b]
    start = starts_ref[b]
    ii = jax.lax.broadcasted_iota(jnp.int32, (nh, t_blk), 1)
    cols = jnp.where(ii < tbp, tb * tbp + ii,
                     t_half + tb * tbp + (ii - tbp))
    # fresh-column score fix-up straight from knew/ksnew (the pool holds
    # stale bytes AND a stale scale at pos now)
    ks_pos = ksnew_ref[0] * jnp.float32(inv_scale)     # [nkv, 1]
    s_col = jnp.sum(
        q.astype(jnp.float32)
        * jnp.repeat(knew_ref[0].astype(jnp.float32), g, axis=0),
        axis=-1, keepdims=True)                        # [nh, 1]
    s_col = s_col * jnp.repeat(ks_pos, g, axis=0) * (hd ** -0.5)
    valid = (cols >= start) & (cols < length)
    s = jnp.where(valid, s_scr[:], jnp.float32(-1e30))
    s = jnp.where(valid & (cols == pos),
                  jnp.broadcast_to(s_col, s.shape), s)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_old - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_new

    # stale-V guard: zero the pos column for the tile dots, re-add its
    # true contribution from vnew/vsnew as a rank-1 update
    live = valid & (cols == pos)
    p_pos = jnp.sum(jnp.where(live, p, 0.0), axis=1,
                    keepdims=True)                     # [nh, 1]
    p_dot = jnp.where(cols == pos, 0.0, p)
    vnew_deq = vnew_ref[0].astype(jnp.float32) * \
        (vsnew_ref[0] * jnp.float32(inv_scale))        # [nkv, hd]

    v_lo, v_hi = _unpack_nibbles(vqp_ref[0, 0].astype(jnp.int32))
    vsa = vs_ref[0, 0, 0].T * jnp.float32(inv_scale)
    vsb = vs_ref[0, 0, 1].T * jnp.float32(inv_scale)
    pa = (p_dot[:, :tbp] * jnp.repeat(vsa, g, axis=0)).astype(q.dtype)
    pb = (p_dot[:, tbp:] * jnp.repeat(vsb, g, axis=0)).astype(q.dtype)
    for n in range(nkv):
        rows = slice(n * g, (n + 1) * g)
        pva = jax.lax.dot_general(
            pa[rows], v_lo[:, n, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        pvb = jax.lax.dot_general(
            pb[rows], v_hi[:, n, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[rows, :] = acc_scr[rows, :] * alpha[rows] + pva + pvb + \
            p_pos[rows] * vnew_deq[n][None, :]

    @pl.when(tb == n_tb - 1)
    def _():
        out_ref[0] = (acc_scr[:] /
                      jnp.maximum(l_scr[:], 1e-30)).astype(out_ref.dtype)


def _kt4_blocks(t: int, t_blk: int):
    """Resolve the unpacked block width for a packed pool of T columns."""
    t_half = t // 2
    while (t_half % (t_blk // 2) or t_blk > t) and t_blk > 256:
        t_blk //= 2
    if t_half % (t_blk // 2):
        raise ValueError(f"T={t} not divisible by a supported int4 block")
    return t_blk, t_half


def kv_attention_decode_kt4(q, k_qp, k_st, v_qp, v_s, lengths, layer, *,
                            starts=None, inv_scale: float = 1.0,
                            t_blk: int = 2 * DEFAULT_T_BLK,
                            interpret: Optional[bool] = None):
    """Fused decode attention over the INT4 nibble-packed KT pool.

    ``k_qp [L, B, nkv, hd, T//2]`` int8 (half-plane packed int4),
    ``k_st [L, B, nkv, T]`` f32, ``v_qp [L, B, T//2, nkv, hd]`` int8,
    ``v_s [L, B, T, nkv]`` f32 — scales in the int8 cache's layout with
    scale = absmax/7 (``model.kv_cache.quantize_kv4``).  ``t_blk`` is in
    UNPACKED columns (each grid step reads t_blk/2 packed bytes); default
    2×DEFAULT_T_BLK keeps the per-step DMA bytes equal to the int8 kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nh, hd = q.shape
    nkv = k_qp.shape[2]
    t = k_st.shape[3]
    g = nh // nkv
    t_blk, t_half = _kt4_blocks(t, t_blk)
    tbp = t_blk // 2
    n_tb = t_half // tbp

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts = jnp.asarray(starts, jnp.int32).reshape(b)
    out = pl.pallas_call(
        functools.partial(_kernel_kt4, nkv=nkv, g=g, hd=hd, t_blk=t_blk,
                          t_half=t_half, inv_scale=inv_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_tb),
            in_specs=[
                pl.BlockSpec((1, nh, hd),
                             lambda bb, tb, lr, ln, st: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, hd, tbp),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, 0, 0, tb),
                             memory_space=pltpu.VMEM),
                # K scale plane tiles: same array, offset block indices
                pl.BlockSpec((1, 1, nkv, tbp),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, 0, tb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, tbp),
                             lambda bb, tb, lr, ln, st:
                             (lr[0], bb, 0, tb + t_half // tbp),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tbp, nkv, hd),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, tb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tbp, nkv),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, tb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tbp, nkv),
                             lambda bb, tb, lr, ln, st:
                             (lr[0], bb, tb + t_half // tbp, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nh, hd),
                                   lambda bb, tb, lr, ln, st: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nh, t_blk), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, hd), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(lidx, lengths, starts, q, k_qp, k_st, k_st, v_qp, v_s, v_s)
    return out


def kv_attention_append_kt4(q, k_new, k_snew, v_new, v_snew, k_qp, k_st,
                            v_qp, v_s, lengths, layer,
                            pos, *, starts=None, inv_scale: float = 1.0,
                            t_blk: int = 2 * DEFAULT_T_BLK, wb: int = 128,
                            interpret: Optional[bool] = None):
    """INT4 FULLY-fused append+attend over the nibble-packed KT pool.

    Like :func:`kv_attention_append_kt` but for int4: ``k_new/v_new
    [B, nkv, hd]`` hold int4-valued int8 (``quantize_kv4`` output, in
    [-7, 7]) with raw scales ``k_snew/v_snew [B, nkv]`` f32, and EVERY
    cache write — both nibble merges at byte column ``pos % (T/2)``
    (partner nibble preserved) and both scale columns — lands in-kernel
    through aliased write-backs.  The caller must issue ZERO XLA cache
    writes: per-row vector-index scatters around the aliased call defeat
    XLA's in-place buffer forwarding (measured at engine level: 0.61x
    the int8 rate with outside writes vs the fused form).
    Returns ``(ctx, k_qp', k_st', v_qp', v_s')`` with all pools aliased.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nh, hd = q.shape
    nkv = k_qp.shape[2]
    t = k_st.shape[3]
    g = nh // nkv
    t_blk, t_half = _kt4_blocks(t, t_blk)
    tbp = t_blk // 2
    n_tb = t_half // tbp
    if tbp % wb:
        raise ValueError(f"wb={wb} must divide packed block {tbp}")

    # plane-split zero-copy views so each scale array is ONE operand
    L, bsz = k_st.shape[0], k_st.shape[1]
    kst2 = k_st.reshape(L, bsz, nkv, 2, t_half)
    vs2 = v_s.reshape(L, bsz, 2, t_half, nkv)
    ctx, k_qp_new, kst2_new, v_qp_new, vs2_new = \
        kv_attention_append_kt4_planar(
            q, k_new, k_snew, v_new, v_snew, k_qp, kst2, v_qp, vs2,
            lengths, layer, pos, starts=starts, inv_scale=inv_scale,
            t_blk=t_blk, wb=wb, interpret=interpret)
    return (ctx, k_qp_new, kst2_new.reshape(k_st.shape), v_qp_new,
            vs2_new.reshape(v_s.shape))


def kv_attention_append_kt4_planar(q, k_new, k_snew, v_new, v_snew, k_qp,
                                   kst2, v_qp, vs2, lengths, layer, pos, *,
                                   starts=None, inv_scale: float = 1.0,
                                   t_blk: int = 2 * DEFAULT_T_BLK,
                                   wb: int = 128,
                                   interpret: Optional[bool] = None):
    """:func:`kv_attention_append_kt4` taking/returning the PLANE-SPLIT
    scale pools directly — ``kst2 [L, B, nkv, 2, T/2]``,
    ``vs2 [L, B, 2, T/2, nkv]``.  The hot decode loops carry the planar
    form so no reshape sits between the aliased call and the loop carry
    (a per-layer reshape around an aliased custom call can defeat XLA's
    in-place buffer forwarding → full scale-pool copies every layer)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nh, hd = q.shape
    nkv = k_qp.shape[2]
    t_half = kst2.shape[4]
    t = 2 * t_half
    g = nh // nkv
    t_blk, t_half = _kt4_blocks(t, t_blk)
    tbp = t_blk // 2
    n_tb = t_half // tbp
    if tbp % wb:
        raise ValueError(f"wb={wb} must divide packed block {tbp}")

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts = jnp.asarray(starts, jnp.int32).reshape(b)
    posv = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    k_snew = jnp.asarray(k_snew, jnp.float32).reshape(b, nkv, 1)
    v_snew = jnp.asarray(v_snew, jnp.float32).reshape(b, nkv, 1)
    v_snew_t = v_snew.reshape(b, 1, nkv)
    ctx, k_qp_new, kst2_new, v_qp_new, vs2_new = pl.pallas_call(
        functools.partial(_kernel_append_kt4, nkv=nkv, g=g, hd=hd,
                          t_blk=t_blk, t_half=t_half, wb=wb,
                          inv_scale=inv_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, n_tb),
            in_specs=[
                pl.BlockSpec((1, nh, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, 1),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nkv, 1),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nkv, hd, tbp),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, 0, tb),
                             memory_space=pltpu.VMEM),
                # both K scale plane tiles through ONE operand
                pl.BlockSpec((1, 1, nkv, 2, tbp),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, 0, tb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tbp, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, tb, 0, 0),
                             memory_space=pltpu.VMEM),
                # both V scale plane tiles through ONE operand
                pl.BlockSpec((1, 1, 2, tbp, nkv),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, tb, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nh, hd),
                             lambda bb, tb, lr, ln, st, ps: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                # one wb-wide packed sub-block pinned to the row's byte col
                pl.BlockSpec((1, 1, nkv, hd, wb),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, 0, (ps[bb] % t_half) // wb),
                             memory_space=pltpu.VMEM),
                # K scale column: wb-window spanning BOTH planes at
                # byte col // wb (in-kernel plane mask picks the live one)
                pl.BlockSpec((1, 1, nkv, 2, wb),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, 0, 0,
                              (ps[bb] % t_half) // wb),
                             memory_space=pltpu.VMEM),
                # V nibble row: T/2-size-1 block pinned at the byte col
                pl.BlockSpec((1, 1, 1, nkv, hd),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, ps[bb] % t_half, 0, 0),
                             memory_space=pltpu.VMEM),
                # V scale row: 8-row window at (plane, byte col // 8)
                pl.BlockSpec((1, 1, 1, 8, nkv),
                             lambda bb, tb, lr, ln, st, ps:
                             (lr[0], bb, ps[bb] // t_half,
                              (ps[bb] % t_half) // 8, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((nh, t_blk), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, 1), jnp.float32),
                pltpu.VMEM((nh, hd), jnp.float32),
            ]),
        out_shape=[
            jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
            jax.ShapeDtypeStruct(k_qp.shape, k_qp.dtype),
            jax.ShapeDtypeStruct(kst2.shape, kst2.dtype),
            jax.ShapeDtypeStruct(v_qp.shape, v_qp.dtype),
            jax.ShapeDtypeStruct(vs2.shape, vs2.dtype),
        ],
        # pool inputs (after 4 scalars + q, k_new, k_snew, v_new, v_snew,
        # v_snew_t) alias the pool outputs
        input_output_aliases={10: 1, 11: 2, 12: 3, 13: 4},
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(lidx, lengths, starts, posv, q, k_new, k_snew, v_new, v_snew,
      v_snew_t, k_qp, kst2, v_qp, vs2)
    return ctx, k_qp_new, kst2_new, v_qp_new, vs2_new


def kv_attention_decode(q, k_q, k_s, v_q, v_s, lengths, layer, *,
                        starts=None, inv_scale: float = 1.0,
                        t_blk: int = DEFAULT_T_BLK,
                        interpret: Optional[bool] = None):
    """Fused decode attention over the stacked flat (quantized) pool.

    q ``[B, nh, hd]`` bf16; pools ``k_q/v_q [L, B, T, nkv, hd]`` (int8, or
    bf16/fp8 with ``k_s=v_s=None``), scales ``k_s/v_s [L, B, T, nkv]``
    fp32 absmax; ``lengths [B]`` valid tokens (attend positions
    ``< lengths[b]``); ``layer`` traced int32.  ``starts [B]`` (optional)
    masks positions below it per row (``key_start`` left-pad convention).
    Returns ``[B, nh, hd]`` in ``q.dtype``.  ``inv_scale``: dequant =
    q · scale · inv_scale.  The default 1.0 matches
    ``model.kv_cache.quantize_kv``, which stores PRE-DIVIDED scales
    (scale = absmax/127) — the convention of every in-repo pool.  A
    1/127-style factor is only for pools whose scales are raw absmax.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nh, hd = q.shape
    L, _, t, nkv, _ = k_q.shape
    g = nh // nkv
    quant = k_s is not None
    while t % t_blk and t_blk > 128:
        t_blk //= 2
    if t % t_blk:
        raise ValueError(f"T={t} not divisible by a supported block")
    n_tb = t // t_blk

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(b)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts = jnp.asarray(starts, jnp.int32).reshape(b)
    if not quant:
        # dummy scale operands (1-element blocks)
        k_s = jnp.zeros((L, b, t, nkv), jnp.float32)[:, :, :1, :1]
        v_s = k_s
        s_specs = [pl.BlockSpec((1, 1, 1, 1), lambda bb, tb, lr, ln, st:
                                (0, 0, 0, 0), memory_space=pltpu.VMEM)] * 2
    else:
        s_specs = [pl.BlockSpec((1, 1, t_blk, nkv),
                                lambda bb, tb, lr, ln, st: (lr[0], bb, tb, 0),
                                memory_space=pltpu.VMEM)] * 2

    pool_spec = pl.BlockSpec((1, 1, t_blk, nkv, hd),
                             lambda bb, tb, lr, ln, st: (lr[0], bb, tb, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, nkv=nkv, g=g, hd=hd, t_blk=t_blk,
                          inv_scale=inv_scale, quant=quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_tb),
            in_specs=[
                pl.BlockSpec((1, nh, hd),
                             lambda bb, tb, lr, ln, st: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pool_spec, s_specs[0], pool_spec, s_specs[1],
            ],
            out_specs=pl.BlockSpec((1, nh, hd),
                                   lambda bb, tb, lr, ln, st: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nh, t_blk), jnp.float32),   # scores
                pltpu.VMEM((nh, 1), jnp.float32),       # running max
                pltpu.VMEM((nh, 1), jnp.float32),       # running denom
                pltpu.VMEM((nh, hd), jnp.float32),      # accumulator
            ]),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(lidx, lengths, starts, q, k_q, k_s, v_q, v_s)
    return out
