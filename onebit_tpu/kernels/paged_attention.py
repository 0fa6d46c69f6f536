"""Native flat paged-attention kernel (decode: one query token per seq).

Replaces the upstream ``jax.experimental.pallas.ops.tpu.paged_attention``
for this engine's MULTI-LAYER page pool.  The upstream kernel takes a 4D
``[nkv, P, ps, hd]`` operand, so feeding one layer of a stacked pool
requires a reshape/slice that XLA materializes as a full multi-GB operand
copy per layer per decode step (measured 225 ms/step at 7B serving
shapes, scripts/probe_serving_step.py).  This kernel instead takes the
pool in the engine's native layout ``[L, P, nkv, ps, hd]`` plus a traced
``layer`` scalar and reads exactly the pages each sequence owns.

Two design points, both measured (scripts/probe_pageattn_kernel.py):

* **Page fetches ride the Mosaic grid pipeline**, not manual in-body
  DMA: each of the ``ppb`` page slots per grid step is its own input
  BlockSpec whose index map reads the scalar-prefetched page table
  (``tbl[b, c*ppb + j]``) — Mosaic double-buffers these block fetches
  across grid steps automatically.  A manual make_async_copy version
  paid ~3.5 us of serial issue cost per page (1.8 ms per 7B layer).
* **Attention is vectorized over all kv heads** on ``[nkv, ps, hd]``
  VPU ops; a per-head loop of tiny MXU dots costs ~2*nkv serial MXU
  pipeline latencies per step.  q arrives group-major ``[g, nkv, hd]``
  so each GQA group is one contiguous sublane block (g=1 for MHA).

Online-softmax state (m, l, acc) lives in VMEM scratch across the page
blocks of one sequence; the last block writes ``acc / l``.

INT8 pages (QuantPagedKVCache) fold their absmax scales exactly:
``k = k_q * k_s / 127.5`` before the score product — the same identity
as model.bitllama._attention_quant.
"""

from __future__ import annotations

import functools

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
    o_ref, m_ref, l_ref, acc_ref = refs[per_page * ppb:]

    b = pl.program_id(0)
    c = pl.program_id(1)
    nb = pl.num_programs(1)
    length = len_ref[b]
    scale = hd ** -0.5

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dequantized per-page K/V tiles [nkv, ps, hd] f32 + validity masks
    ks, vs, valids = [], [], []
    for j in range(ppb):
        if quant:
            kq, ksc, vq, vsc = page_refs[per_page * j:per_page * (j + 1)]
            kj = kq[0, 0].astype(jnp.float32) * \
                (ksc[0, 0].astype(jnp.float32) * (1.0 / _MAX_INT8))
            vj = vq[0, 0].astype(jnp.float32) * \
                (vsc[0, 0].astype(jnp.float32) * (1.0 / _MAX_INT8))
        else:
            kref, vref = page_refs[per_page * j:per_page * (j + 1)]
            kj = kref[0, 0].astype(jnp.float32)
            vj = vref[0, 0].astype(jnp.float32)
        ks.append(kj)
        vs.append(vj)
        pos = (c * ppb + j) * ps + \
            jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        # additive mask [1, ps] computed arithmetically: rowwise adds
        # broadcast over sublanes; Mosaic rejects where() with scalar
        # branches against an array predicate
        valids.append((pos >= length).astype(jnp.float32) * _NEG)

    for j2 in range(g):
        q_j = q_ref[0, j2].astype(jnp.float32)            # [nkv, hd]
        # per-page scores then concat (pages are separate refs)
        s = jnp.concatenate(
            [jnp.sum(q_j[:, None, :] * ks[j], axis=2) * scale + valids[j]
             for j in range(ppb)], axis=1)                # [nkv, tb]

        rows = pl.ds(j2 * nkv, nkv)
        m_prev = m_ref[rows, :]                           # [nkv, 1]
        l_prev = l_ref[rows, :]
        a_prev = acc_ref[rows, :]                         # [nkv, hd]

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                            # [nkv, tb]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = a_prev * alpha
        for j in range(ppb):
            # static slice + expand_dims: a combined [:, a:b, None]
            # getitem lowers through a gather Mosaic rejects
            pj = jax.lax.slice_in_dim(p, j * ps, (j + 1) * ps, axis=1)
            pv = pv + jnp.sum(jnp.expand_dims(pj, 2) * vs[j], axis=1)

        m_ref[rows, :] = m_new
        l_ref[rows, :] = l_new
        acc_ref[rows, :] = pv

    @pl.when(c == nb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def paged_attention_flat(q, *pool, lengths, page_indices, layer,
                         quant: bool = False, pages_per_block: int = 8,
                         interpret=None):
    """Decode attention against a flat multi-layer page pool.

    q [B, nh, hd]; pool = (k_pages, v_pages) each [L, P, nkv, ps, hd]
    (or the 4 QuantPagedKVCache leaves with scales [L, P, nkv, ps, 1]);
    lengths [B] valid-token counts (incl. the just-written token);
    page_indices [B, mp]; layer a traced int32 scalar.
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
    ppb = min(pages_per_block, mp)
    nb = -(-mp // ppb)

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
        pl.BlockSpec((1, g, nkv, hd), lambda bb, cc, *pref: (bb, 0, 0, 0),
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

    # group-major q/out layout: head h = n*g + j lives at row j*nkv + n,
    # so each group j is one contiguous [nkv, hd] sublane block in-kernel
    q_grouped = q.reshape(b, nkv, g, hd).transpose(0, 2, 1, 3)

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
                pltpu.VMEM((nh, 1), jnp.float32),               # m
                pltpu.VMEM((nh, 1), jnp.float32),               # l
                pltpu.VMEM((nh, hd), jnp.float32),              # acc
            ]),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(lengths, jnp.int32),
      jnp.asarray(page_indices, jnp.int32).reshape(-1),
      q_grouped, *operands)
    return out.reshape(b, g, nkv, hd).transpose(0, 2, 1, 3) \
        .reshape(b, nh, hd)
