"""Native flat paged-attention kernel (decode: one query token per seq).

Replaces the upstream ``jax.experimental.pallas.ops.tpu.paged_attention``
for this engine's MULTI-LAYER page pool.  The upstream kernel takes a 4D
``[nkv, P, ps, hd]`` operand, so feeding one layer of a stacked pool
requires a reshape/slice that XLA materializes as a full multi-GB operand
copy per layer per decode step (measured 225 ms/step at 7B serving
shapes, scripts/probe_serving_step.py).  This kernel instead takes the
pool in the engine's native layout ``[L, P, nkv, ps, hd]`` plus a traced
``layer`` scalar and reads exactly the pages each sequence owns.

Design (round 4 — MXU-oriented rewrite of the original VPU body, which
materialized ppb f32-dequantized K AND V page tiles in-kernel and OOMed
scoped VMEM at serving geometry):

* **Page fetches ride the Mosaic grid pipeline**: each of the ``ppb``
  page slots per grid step is its own input BlockSpec whose index map
  reads the scalar-prefetched page table (``tbl[b, c*ppb + j]``) —
  Mosaic double-buffers these block fetches across grid steps.
* **Concat-convert, then KT-style dots**: each page tile is converted
  once into a contiguous bf16 (= q.dtype) VMEM scratch slab
  ``[nkv, ppb*ps, hd]`` — for INT8 pages the absmax scales are folded
  into the convert (dequant ``q·s/127.5``), so the quantized and plain
  paths share one dot structure.  Scores and PV then run as the proven
  per-kv-head ``dot_general`` pattern of kernels/kv_attention.py
  (``[g, hd]·[tok, hd]ᵀ`` and ``[g, tok]·[tok, hd]``, fp32 accumulate)
  instead of a per-page shower of tiny dots: pages_per_block is chosen
  so one grid step scores ~256 tokens per dot.
* Online-softmax state (m, l, acc) lives in VMEM scratch across the page
  blocks of one sequence; the last block writes ``acc / l``.

INT8 pages (QuantPagedKVCache) use the raw-absmax convention of
engine/paged.py: ``k = k_q * k_s / 127.5``, the same identity as
model.bitllama._attention_quant.  In interpret mode (CPU tests) q is
fp32, so the convert-dequant is exact vs the jnp gather reference; on
TPU the dequantized operands round to bf16 (the dense bf16 path's
precision).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_MAX_INT8 = 127.5    # engine/paged.py quantization convention


def _kernel(layer_ref, len_ref, tbl_ref,           # scalar prefetch
            q_ref, *refs, g: int, nkv: int, ps: int, ppb: int,
            quant: bool, hd: int):
    per_page = 4 if quant else 2
    page_refs = refs[:per_page * ppb]
    o_ref = refs[per_page * ppb]
    k_scr, v_scr, s_scr, m_ref, l_ref, acc_ref = refs[per_page * ppb + 1:]

    b = pl.program_id(0)
    c = pl.program_id(1)
    nb = pl.num_programs(1)
    length = len_ref[b]
    scale = hd ** -0.5
    tok = ppb * ps
    nh = g * nkv

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # concat-convert: page tiles -> contiguous [nkv, tok, hd] q.dtype
    # slabs (scales folded in for int8 pages; elementwise, fused by
    # Mosaic into the store — no f32 materialization survives the step)
    for j in range(ppb):
        if quant:
            kq, ksc, vq, vsc = page_refs[per_page * j:per_page * (j + 1)]
            kj = kq[0, 0].astype(jnp.float32) * \
                (ksc[0, 0].astype(jnp.float32) * (1.0 / _MAX_INT8))
            vj = vq[0, 0].astype(jnp.float32) * \
                (vsc[0, 0].astype(jnp.float32) * (1.0 / _MAX_INT8))
        else:
            kref, vref = page_refs[per_page * j:per_page * (j + 1)]
            kj = kref[0, 0]
            vj = vref[0, 0]
        k_scr[:, j * ps:(j + 1) * ps, :] = kj.astype(k_scr.dtype)
        v_scr[:, j * ps:(j + 1) * ps, :] = vj.astype(v_scr.dtype)

    # scores: one NT dot per kv head over the whole token block
    q = q_ref[0]                                       # [nh, hd]
    for n in range(nkv):
        s_n = jax.lax.dot_general(
            q[n * g:(n + 1) * g], k_scr[n],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, tok]
        s_scr[n * g:(n + 1) * g, :] = s_n * scale

    pos = c * tok + jax.lax.broadcasted_iota(jnp.int32, (nh, tok), 1)
    s = jnp.where(pos < length, s_scr[:], jnp.float32(_NEG))

    # online softmax update (batched over all heads)
    m_prev = m_ref[:]                                  # [nh, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                             # [nh, tok]
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new

    p16 = p.astype(v_scr.dtype)
    for n in range(nkv):
        pv = jax.lax.dot_general(
            p16[n * g:(n + 1) * g], v_scr[n],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [g, hd]
        rows = slice(n * g, (n + 1) * g)
        acc_ref[rows, :] = acc_ref[rows, :] * alpha[rows] + pv

    @pl.when(c == nb - 1)
    def _():
        # max(l, tiny) guards 0/0 on a fully-masked row (inactive slot)
        o_ref[0] = (acc_ref[:] /
                    jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _auto_ppb(ps: int, mp: int) -> int:
    """Pages per grid step: target ~256 tokens per score dot (big enough
    to amortize per-dot MXU latency, small enough for VMEM — at 7B
    serving geometry one 256-token K+V slab pair is 2 MB int8 in + 4 MB
    bf16 scratch)."""
    env = os.environ.get("ONEBIT_PAGED_PPB")
    if env:
        return max(1, min(int(env), mp))
    return max(1, min(-(-256 // ps), mp))


def paged_attention_flat(q, *pool, lengths, page_indices, layer,
                         quant: bool = False, pages_per_block: int = 0,
                         interpret=None):
    """Decode attention against a flat multi-layer page pool.

    q [B, nh, hd]; pool = (k_pages, v_pages) each [L, P, nkv, ps, hd]
    (or the 4 QuantPagedKVCache leaves with scales [L, P, nkv, ps, 1]);
    lengths [B] valid-token counts (incl. the just-written token);
    page_indices [B, mp]; layer a traced int32 scalar.
    ``pages_per_block`` 0 = auto (~256 tokens per block).
    Returns [B, nh, hd] float32.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, nh, hd = q.shape
    if quant:
        kq, _, _, _ = pool
        L, P, nkv, ps, _ = kq.shape
    else:
        k_pages, _ = pool
        L, P, nkv, ps, _ = k_pages.shape
    g = nh // nkv
    mp = page_indices.shape[1]
    ppb = pages_per_block or _auto_ppb(ps, mp)
    ppb = min(ppb, mp)
    nb = -(-mp // ppb)
    tok = ppb * ps

    kernel = functools.partial(_kernel, g=g, nkv=nkv, ps=ps, ppb=ppb,
                               quant=quant, hd=hd)

    def page_spec(j, last):
        # block = one (layer, page) slab; the page coordinate comes from
        # the scalar-prefetched table (flattened 1D — SMEM indexing with
        # two traced indices fails to lower) — Mosaic pipelines these
        # block fetches across grid steps
        def idx(bb, cc, layer_ref, len_ref, tbl_ref):
            jj = jnp.minimum(cc * ppb + j, mp - 1)   # clamp; masked in-kernel
            return (layer_ref[0], tbl_ref[bb * mp + jj], 0, 0, 0)
        return pl.BlockSpec((1, 1, nkv, ps, last), idx,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, nh, hd), lambda bb, cc, *pref: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = []
    for j in range(ppb):
        if quant:
            for arr, last in zip(pool, (hd, 1, hd, 1)):
                in_specs.append(page_spec(j, last))
                operands.append(arr)
        else:
            for arr in pool:
                in_specs.append(page_spec(j, hd))
                operands.append(arr)

    # dequantized-operand dtype: fp32 in interpret mode (tests compare
    # exactly vs the fp32 gather reference), bf16-or-q.dtype on TPU
    op_dtype = q.dtype

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, nb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nh, hd),
                                   lambda bb, cc, *pref: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nkv, tok, hd), op_dtype),           # K slab
                pltpu.VMEM((nkv, tok, hd), op_dtype),           # V slab
                pltpu.VMEM((nh, tok), jnp.float32),             # scores
                pltpu.VMEM((nh, 1), jnp.float32),               # m
                pltpu.VMEM((nh, 1), jnp.float32),               # l
                pltpu.VMEM((nh, hd), jnp.float32),              # acc
            ]),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(lengths, jnp.int32),
      jnp.asarray(page_indices, jnp.int32).reshape(-1),
      q, *operands)
    return out
