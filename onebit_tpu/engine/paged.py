"""Paged KV cache + paged decode step (BASELINE north star: paged KV).

vLLM-style block tables on TPU: K/V live in fixed-size pages
``[L, num_pages, n_kv, page_size, head_dim]``; each sequence owns a list
of LOGICAL pages (``page_indices [B, pages_per_seq]``, shared by all
layers) plus its ``length``.  Decode attention gathers the sequences'
pages from the layer slice and runs XLA fused attention with int8
scales folded in (_paged_attend; a native Pallas kernel exists in
kernels/paged_attention.py, opt-in — see _use_kernel for the measured
rationale).  Pages are allocated/freed by a host-side refcounting
free-list — sequences of different lengths share the pool, and prefix
caching shares read-only full prompt pages across sequences.

Flat-loop design (same rationale as ``bitllama.decode_step_flat``): every
program here iterates layers with ``fori_loop`` carrying the FULL page
pool, updated in place with scatters — never ``lax.scan`` with the pool
as xs/ys, which would materialize per-layer slices (an extra read) and
restack the outputs (an extra full-pool write) each step.  A (layer,
page) block is one contiguous ``[n_kv, ps, hd]`` slab.

Program bodies are parameterized by a :class:`PagedProj` projection
strategy so the SAME cores serve single-device (flat scalar-prefetch
stacked kernels) and tensor-parallel (column/row-parallel shards with
psum'd LayerNorm, engine/tp_backend.py) execution — the TP feature
matrix is the same code, not a fork.

The reference has nothing comparable (its cache is per-step torch.cat,
modeling_bitllama.py:379-384).
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.model import bitllama
from onebit_tpu.model.bitllama import (
    _project_flat,
    _project_gateup_flat,
    _project_qkv_flat,
)
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.rope import apply_rope, rope_cos_sin


class PagedKVCache(NamedTuple):
    """Pool layout ``[L, P, n_kv, page_size, head_dim]``: a (layer, page)
    block is a fully CONTIGUOUS ``[n_kv, ps, hd]`` slab — one async DMA
    in the Pallas paged-attention kernel, one gather index in the jnp
    path — and the decode scatter writes ``[B, n_kv, hd]`` rows with no
    transpose."""
    k_pages: jax.Array  # [L, num_pages, n_kv, page_size, head_dim]
    v_pages: jax.Array

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        """Logical pages per layer (the allocator's pool size)."""
        return self.k_pages.shape[1]


class QuantPagedKVCache(NamedTuple):
    """INT8 pages + per-(layer, page, head, slot) absmax scales — the
    combined north star (paged + quantized KV).  Same layout rationale
    as :class:`PagedKVCache`."""
    k_q: jax.Array  # [L, num_pages, n_kv, page_size, head_dim] int8
    k_s: jax.Array  # [L, num_pages, n_kv, page_size, 1] f32
    v_q: jax.Array
    v_s: jax.Array

    @property
    def page_size(self) -> int:
        return self.k_q.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_q.shape[1]


def init_paged_kv_cache(config: BitLlamaConfig, num_pages: int,
                        page_size: int = 16, dtype=jnp.bfloat16,
                        quantized=False):
    """``quantized``: False (bf16/f32 pages), True or "int8" (int8 values
    + per-(page, slot, head) absmax scales), or "fp8" (direct
    float8_e4m3fn pages, no scales — half the scale storage/compute of
    int8 at ~3 mantissa bits; native MXU fp8 on v5p+)."""
    shape = (config.num_hidden_layers, num_pages,
             config.num_key_value_heads, page_size, config.head_dim)
    if quantized == "fp8":
        return PagedKVCache(
            k_pages=jnp.zeros(shape, jnp.float8_e4m3fn),
            v_pages=jnp.zeros(shape, jnp.float8_e4m3fn))
    if quantized:
        sshape = shape[:-1] + (1,)
        return QuantPagedKVCache(
            k_q=jnp.zeros(shape, jnp.int8),
            k_s=jnp.zeros(sshape, jnp.float32),
            v_q=jnp.zeros(shape, jnp.int8),
            v_s=jnp.zeros(sshape, jnp.float32))
    return PagedKVCache(k_pages=jnp.zeros(shape, dtype),
                        v_pages=jnp.zeros(shape, dtype))


_MAX_INT8 = 127.5  # the Pallas kernel's quantization_utils.MAX_INT8


def _quantize_kv_int8(x):
    """[..., hd] → (int8 values, absmax scales [..., 1]) — EXACTLY the
    kernel's quantization_utils convention (rint(x·127.5/h), dequant
    q·h/127.5), with an epsilon floor on the stored scale (self-consistent
    for any positive h; avoids 0/0 on all-zero rows)."""
    scales = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                                 keepdims=True), 1e-6)
    q = jnp.rint(x.astype(jnp.float32) * (_MAX_INT8 / scales)).astype(jnp.int8)
    return q, scales


def _dequantize_kv_int8(q, scales, dtype=jnp.float32):
    return (q.astype(jnp.float32) * (scales / _MAX_INT8)).astype(dtype)


class PageAllocator:
    """Host-side free-list of LOGICAL pages with reference counts
    (page 0 is a reserved null).

    Refcounts enable read-only page SHARING across sequences (prefix
    caching): ``retain`` adds a reference, ``release`` drops one and
    returns the page to the free list only when the last reference
    goes."""

    def __init__(self, num_pages: int):
        self.free: List[int] = list(range(num_pages - 1, 0, -1))
        self.refcount = {}

    def alloc(self) -> int:
        if not self.free:
            raise RuntimeError("out of KV pages")
        p = self.free.pop()
        self.refcount[p] = 1
        return p

    def retain(self, page: int) -> None:
        self.refcount[int(page)] += 1

    def release(self, pages) -> None:
        for p in pages:
            p = int(p)
            if p <= 0:
                continue
            rc = self.refcount.get(p, 1) - 1
            if rc <= 0:
                self.refcount.pop(p, None)
                self.free.append(p)
            else:
                self.refcount[p] = rc


def _gather_seq_kv(pages_l, page_indices):
    """Gather sequences' tokens from ONE layer's pool slice.

    pages_l [P, nkv, ps, hd|1]; page_indices [B, mp] → [B, mp*ps, nkv, *].
    Under jit the gather fuses with the layer slice — the pool is never
    materialized per layer.
    """
    g = jnp.take(pages_l, page_indices, axis=0)   # [B, mp, nkv, ps, *]
    g = g.transpose(0, 1, 3, 2, 4)
    b, mp, ps, nkv, last = g.shape
    return g.reshape(b, mp * ps, nkv, last)


def _jnp_paged_attention(q, k, v, lengths):
    """Reference paged attention on gathered K/V.

    q [B, nh, hd]; k/v [B, T, nkv, hd]; lengths [B] → [B, nh, hd].
    Operands keep their (bf16) dtype with fp32 MXU accumulation — an
    explicit f32 cast would materialize 2x the gathered bytes.
    """
    b, nh, hd = q.shape
    nkv = k.shape[2]
    t = k.shape[1]
    groups = nh // nkv
    qg = q.reshape(b, nkv, groups, hd)
    scores = jnp.einsum("bngh,btnh->bngt", qg, k.astype(q.dtype),
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bngt,btnh->bngh", probs.astype(q.dtype),
                     v.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return ctx.reshape(b, nh, hd).astype(q.dtype)


def _use_kernel(cache, config, impl) -> bool:
    """Whether decode attention runs the native Pallas flat paged kernel
    (kernels/paged_attention.py) — ``ONEBIT_PAGED_ATTN=kernel`` opt-in
    (also used by tests in interpret mode on CPU).

    Default is the jnp gather path: measured on v5e, per-page DMA costs
    ~4.5 us of issue overhead regardless of page size or pipelining
    style (manual async copies and scalar-prefetch BlockSpec fetches
    both; scripts/probe_pageattn_parts.py), so B x mp x 2 page copies
    put the kernel at ~1.2 ms/layer while XLA's fused gather + attention
    runs ~0.43 ms/layer despite 3x the HBM traffic.  Revisit if a
    batched/indexed DMA primitive lands or pages grow >= 1 MB."""
    import os
    if os.environ.get("ONEBIT_PAGED_ATTN") != "kernel":
        return False
    # geometry/dtype guards even under the opt-in: the kernel needs
    # lane-aligned heads and has no fp8 page path
    if config.head_dim % 128 != 0 or impl == "xla":
        return False
    if isinstance(cache, PagedKVCache) and \
            cache.k_pages.dtype == jnp.float8_e4m3fn:
        return False
    return True


def _paged_attend(q1, leaves, quant, use_kernel, lengths, page_indices,
                  layer, compute_dtype, hd):
    """Attention for one layer of the paged pool (single query position).

    q1 [B, nh, hd]; ``leaves`` are the full pool arrays; ``layer`` is the
    traced layer index.  Kernel path: the native flat paged-attention
    kernel reads the pool in place (HBM refs + per-page DMA) — no
    reshaped operands, no per-layer slice materialization.  jnp path:
    gather the sequences' pages from the layer slice and run XLA fused
    attention (handles every page dtype incl. fp8).
    """
    if use_kernel:
        from onebit_tpu.kernels.paged_attention import paged_attention_flat
        return paged_attention_flat(
            q1, *leaves, lengths=lengths, page_indices=page_indices,
            layer=layer, quant=quant).astype(compute_dtype)
    pick = functools.partial(jax.lax.dynamic_index_in_dim, index=layer,
                             axis=0, keepdims=False)
    if quant:
        # attention DIRECTLY on the gathered int8 values with the absmax
        # scales folded into scores/probs (bitllama._attention_quant) —
        # a full f32 dequant would materialize ~4x the int8 bytes per
        # layer per step
        kq, ks, vq, vs = leaves
        t = page_indices.shape[1] * ps_of(kq)
        k_q = _gather_seq_kv(pick(kq), page_indices)
        k_s = _gather_seq_kv(pick(ks), page_indices)[..., 0] * \
            (1.0 / _MAX_INT8)
        v_q = _gather_seq_kv(pick(vq), page_indices)
        v_s = _gather_seq_kv(pick(vs), page_indices)[..., 0] * \
            (1.0 / _MAX_INT8)
        mask = (jnp.arange(t)[None, :] <
                lengths[:, None])[:, None, None, :]          # [B,1,1,T]
        nh = q1.shape[1]
        return bitllama._attention_quant(
            q1[:, None].astype(compute_dtype), k_q, k_s, v_q, v_s, mask,
            num_kv_groups=nh // k_q.shape[2])[:, 0]
    kf = _gather_seq_kv(pick(leaves[0]), page_indices)
    vf = _gather_seq_kv(pick(leaves[1]), page_indices)
    if kf.dtype == jnp.float8_e4m3fn:
        # cast straight to the attention operand dtype — a widened (f32)
        # intermediate would materialize 4x the gathered bytes
        kf = kf.astype(q1.dtype)
        vf = vf.astype(q1.dtype)
    return _jnp_paged_attention(q1, kf, vf, lengths)


def _paged_attend_window(q, leaves, quant, mask, page_indices, layer,
                         compute_dtype):
    """Attention for a W-token window over gathered pages.

    q [B, W, nh, hd]; mask [B, 1, W, T] (T = max_pages*ps).  The W>1
    counterpart of :func:`_paged_attend` — verify windows and chunked
    prefill appends; the gather is identical, the query axis is wider.
    """
    pick = functools.partial(jax.lax.dynamic_index_in_dim, index=layer,
                             axis=0, keepdims=False)
    nh = q.shape[2]
    if quant:
        kq, ks, vq, vs = leaves
        k_q = _gather_seq_kv(pick(kq), page_indices)
        k_s = _gather_seq_kv(pick(ks), page_indices)[..., 0] * \
            (1.0 / _MAX_INT8)
        v_q = _gather_seq_kv(pick(vq), page_indices)
        v_s = _gather_seq_kv(pick(vs), page_indices)[..., 0] * \
            (1.0 / _MAX_INT8)
        return bitllama._attention_quant(
            q.astype(compute_dtype), k_q, k_s, v_q, v_s, mask,
            num_kv_groups=nh // k_q.shape[2])
    kf = _gather_seq_kv(pick(leaves[0]), page_indices)
    vf = _gather_seq_kv(pick(leaves[1]), page_indices)
    if kf.dtype == jnp.float8_e4m3fn:
        kf = kf.astype(q.dtype)
        vf = vf.astype(q.dtype)
    return bitllama._attention(q, kf.astype(q.dtype), vf.astype(q.dtype),
                               mask, num_kv_groups=nh // kf.shape[2])


def ps_of(pool) -> int:
    """page_size from a pool leaf [L, P, nkv, ps, *]."""
    return pool.shape[3]


# ---------------------------------------------------------------------------
# Projection strategy: the pluggable seam between single-device execution
# (flat scalar-prefetch stacked kernels) and tensor-parallel shards
# (column/row-parallel with psum'd LayerNorm, engine/tp_backend.py).
# ---------------------------------------------------------------------------

class PagedProj(NamedTuple):
    """Per-layer projection callbacks + head geometry for the paged cores.

    ``nh``/``nkv`` are the LOCAL head counts (global for single-device,
    per-shard under TP — the pool's head axis is sharded to match)."""
    embed: Any          # ids -> x [..., d] compute_dtype
    qkv: Any            # (hx, i) -> (q, k, v) flat
    o: Any              # (ctx_flat, i) -> [..., d]
    gateup: Any         # (hx, i) -> (gate, up)
    down: Any           # (act, i) -> [..., d]
    ln: Any             # (x, name, i) -> rms-normed x
    final: Any          # (x) -> final-normed x
    nh: int
    nkv: int


def default_proj(params, config: BitLlamaConfig, impl: str,
                 compute_dtype) -> PagedProj:
    """Single-device strategy: flat stacked projections (scalar-prefetch
    Pallas kernels) — identical math/dispatch to model/ragged_decode.py."""
    layers = params["layers"]
    nkv_hd = config.num_key_value_heads * config.head_dim

    def ln(x, name, i):
        return bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(layers[name], i, 0,
                                            keepdims=False),
            config.rms_norm_eps)

    return PagedProj(
        embed=lambda ids: params["embed_tokens"][ids].astype(compute_dtype),
        qkv=lambda hx, i: _project_qkv_flat(hx, layers, i, impl, nkv_hd),
        o=lambda v, i: _project_flat(v, layers, "o_proj", i, impl),
        gateup=lambda hx, i: _project_gateup_flat(
            hx, layers, i, impl, config.intermediate_size),
        down=lambda v, i: _project_flat(v, layers, "down_proj", i, impl),
        ln=ln,
        final=lambda x: bitllama.rms_norm(x, params["final_norm"],
                                          config.rms_norm_eps),
        nh=config.num_attention_heads,
        nkv=config.num_key_value_heads)


# ---------------------------------------------------------------------------
# Shared cores (decode / verify-window / chunk-append / batched prefill)
# ---------------------------------------------------------------------------

def _window_core(proj: PagedProj, cache, tokens, lengths, page_indices,
                 config: BitLlamaConfig, compute_dtype, use_kernel: bool):
    """W tokens per row written at ``lengths .. lengths+W-1``, attending
    to each row's full (just-updated) pages.

    ``tokens [B, W]``, ``lengths [B]`` write-start positions,
    ``page_indices [B, max_pages]``.  Returns (final-normed hidden
    ``[B, W, d]``, new cache).  W=1 is the decode step (single-query
    attention path, incl. the opt-in native kernel); W>1 serves verify
    windows (speculative decoding) and chunked prefill appends.
    """
    b, w = tokens.shape
    nh, nkv, hd = proj.nh, proj.nkv, config.head_dim
    ps = cache.page_size
    positions = lengths[:, None] + jnp.arange(w)[None, :]       # [B, W]
    pages = jnp.take_along_axis(
        page_indices, jnp.minimum(positions // ps,
                                  page_indices.shape[1] - 1), axis=1)
    # overshoot positions (a verify window always writes n_draft+1 slots,
    # so a row within n_draft of capacity runs past its table) route to the
    # reserved null page 0 — CLAMPING them to the last real page would
    # wrap slot = position % ps and overwrite live K/V the same round
    # attends to (ADVICE r3)
    pages = jnp.where(positions < page_indices.shape[1] * ps, pages, 0)
    slots = positions % ps

    x = proj.embed(tokens)
    cos, sin = rope_cos_sin(positions, config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings,
                            seq_len=config.max_position_embeddings,
                            dtype=compute_dtype)
    quant = isinstance(cache, QuantPagedKVCache)
    if w > 1:
        t_full = page_indices.shape[1] * ps
        kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t_full), 3)
        mask = kj <= positions[:, None, :, None]                # [B,1,W,T]

    def body(i, carry):
        x, leaves = carry
        residual = x
        hx = proj.ln(x, "input_layernorm", i)
        q, k, v = proj.qkv(hx, i)
        q = q.reshape(b, w, nh, hd)
        k = k.reshape(b, w, nkv, hd)
        v = v.reshape(b, w, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)

        if quant:
            kq, ks, vq, vs = leaves
            k_i8, k_sc = _quantize_kv_int8(k)
            v_i8, v_sc = _quantize_kv_int8(v)
            kq = kq.at[i, pages, :, slots].set(k_i8)
            ks = ks.at[i, pages, :, slots].set(k_sc)
            vq = vq.at[i, pages, :, slots].set(v_i8)
            vs = vs.at[i, pages, :, slots].set(v_sc)
            leaves = (kq, ks, vq, vs)
        else:
            kp, vp = leaves
            kp = kp.at[i, pages, :, slots].set(k.astype(kp.dtype))
            vp = vp.at[i, pages, :, slots].set(v.astype(vp.dtype))
            leaves = (kp, vp)

        if w == 1:
            ctx = _paged_attend(q[:, 0], leaves, quant, use_kernel,
                                lengths + 1, page_indices, i,
                                compute_dtype, hd)[:, None]
        else:
            ctx = _paged_attend_window(q, leaves, quant, mask, page_indices,
                                       i, compute_dtype)
        attn = proj.o(ctx.astype(compute_dtype).reshape(b, w, nh * hd), i)
        x = residual + attn
        residual = x
        hx = proj.ln(x, "post_attention_layernorm", i)
        gate, up = proj.gateup(hx, i)
        mlp = proj.down(jax.nn.silu(gate) * up, i)
        return (residual + mlp, leaves)

    x, new_leaves = jax.lax.fori_loop(0, config.num_hidden_layers, body,
                                      (x, tuple(cache)))
    new_cache = (QuantPagedKVCache(*new_leaves) if quant
                 else PagedKVCache(*new_leaves))
    return proj.final(x), new_cache


def _prefill_rows_core(proj: PagedProj, cache, ids, lengths, page_indices,
                       config: BitLlamaConfig, compute_dtype):
    """Batched self-contained prefill: rows attend only within themselves.
    Returns (final-normed hidden [R, S_pad, d], new cache)."""
    r, s_pad = ids.shape
    nh, nkv, hd = proj.nh, proj.nkv, config.head_dim
    ps = cache.page_size
    positions = jnp.arange(s_pad)
    pages = jnp.take_along_axis(
        page_indices, jnp.broadcast_to(positions // ps, (r, s_pad)),
        axis=1)                                             # [R, S]
    slots = jnp.broadcast_to(positions % ps, (r, s_pad))    # [R, S]

    attn = (positions[None, :] < lengths[:, None])
    x = proj.embed(ids)
    cos, sin = rope_cos_sin(positions[None, :], config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings,
                            seq_len=config.max_position_embeddings,
                            dtype=compute_dtype)
    mask = bitllama._causal_mask(s_pad, s_pad, 0) & attn[:, None, None, :]
    quant = isinstance(cache, QuantPagedKVCache)

    def body(i, carry):
        x, leaves = carry
        residual = x
        hx = proj.ln(x, "input_layernorm", i)
        q, k, v = proj.qkv(hx, i)
        q = q.reshape(r, s_pad, nh, hd)
        k = k.reshape(r, s_pad, nkv, hd)
        v = v.reshape(r, s_pad, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        if quant:
            kq, ks, vq, vs = leaves
            k_i8, k_sc = _quantize_kv_int8(k)
            v_i8, v_sc = _quantize_kv_int8(v)
            kq = kq.at[i, pages, :, slots].set(k_i8)
            ks = ks.at[i, pages, :, slots].set(k_sc)
            vq = vq.at[i, pages, :, slots].set(v_i8)
            vs = vs.at[i, pages, :, slots].set(v_sc)
            leaves = (kq, ks, vq, vs)
        else:
            kp, vp = leaves
            kp = kp.at[i, pages, :, slots].set(k.astype(kp.dtype))
            vp = vp.at[i, pages, :, slots].set(v.astype(vp.dtype))
            leaves = (kp, vp)
        ctx = bitllama._attention(q, k, v, mask, num_kv_groups=nh // nkv)
        attn_out = proj.o(ctx.reshape(r, s_pad, nh * hd), i)
        x = residual + attn_out
        residual = x
        hx = proj.ln(x, "post_attention_layernorm", i)
        gate, up = proj.gateup(hx, i)
        mlp = proj.down(jax.nn.silu(gate) * up, i)
        return (residual + mlp, leaves)

    x, new_leaves = jax.lax.fori_loop(0, config.num_hidden_layers, body,
                                      (x, tuple(cache)))
    new_cache = (QuantPagedKVCache(*new_leaves) if quant
                 else PagedKVCache(*new_leaves))
    return proj.final(x), new_cache


def _lm_logits(params, x, compute_dtype):
    return jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Public single-device programs (jitted wrappers over the cores)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def paged_decode_step(params, cache: PagedKVCache, input_ids, lengths,
                      page_indices, config: BitLlamaConfig, *,
                      impl: str = "auto", compute_dtype=jnp.bfloat16):
    """One token per sequence with paged KV.

    input_ids [B, 1]; lengths [B] (current length, i.e. the write position);
    page_indices [B, max_pages].  Returns (logits [B, 1, V], new cache).
    """
    proj = default_proj(params, config, impl, compute_dtype)
    x, new_cache = _window_core(proj, cache, input_ids, lengths,
                                page_indices, config, compute_dtype,
                                _use_kernel(cache, config, impl))
    return _lm_logits(params, x, compute_dtype), new_cache


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def paged_verify_window(params, cache, tokens, lengths, page_indices,
                        config: BitLlamaConfig, *, impl: str = "auto",
                        compute_dtype=jnp.bfloat16):
    """W tokens per row at per-row positions, logits at EVERY position —
    the speculative-decoding verify step on a PAGED target cache (the
    paged twin of model.ragged_decode.ragged_verify_window).

    ``tokens [B, W]`` consumed at ``lengths[b] .. lengths[b]+W-1`` (K/V
    written into the rows' pages); returns (logits [B, W, V], new cache).
    """
    proj = default_proj(params, config, impl, compute_dtype)
    x, new_cache = _window_core(proj, cache, tokens, lengths, page_indices,
                                config, compute_dtype, False)
    return _lm_logits(params, x, compute_dtype), new_cache


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def paged_prefill_rows(params, cache: PagedKVCache, ids, lengths,
                       page_indices, config: BitLlamaConfig, *,
                       impl: str = "auto", compute_dtype=jnp.bfloat16):
    """Prefill SEVERAL sequences' pages in one program (batched paged
    admission — the paged counterpart of ragged_decode.prefill_rows).

    ``ids [R, S_pad]`` right-padded prompts, ``lengths [R]``,
    ``page_indices [R, max_pages]``.  Rows attend only within themselves;
    pad rows may replicate a real row (duplicate scatters write identical
    values).  Returns (last_logits [R, V], new cache).
    """
    proj = default_proj(params, config, impl, compute_dtype)
    x, new_cache = _prefill_rows_core(proj, cache, ids, lengths,
                                      page_indices, config, compute_dtype)
    last = jnp.take_along_axis(
        x, jnp.maximum(lengths - 1, 0)[:, None, None].astype(jnp.int32),
        axis=1)[:, 0]
    return _lm_logits(params, last, compute_dtype), new_cache


@functools.partial(jax.jit, static_argnames=(
    "config", "impl", "compute_dtype", "sampling", "n_steps"))
def paged_decode_block(params, cache, next_token, lengths, page_indices,
                       active, budget, key, config: BitLlamaConfig, *,
                       sampling, n_steps: int, impl: str = "auto",
                       compute_dtype=jnp.bfloat16):
    """n_steps paged decode+sample steps in one device program with
    ON-DEVICE EOS + per-row budget handling (see ragged_decode_block —
    including why frozen rows run the model rather than skipping behind a
    ``cond``).  Overflow writes past a row's pages clamp onto the reserved
    null page 0 by construction.  Returns (tokens [n_steps, B],
    valid [n_steps, B], cache, key, finals) — ``finals = (tok, lens,
    done, budget)`` device arrays for the engine's pipelined chaining
    (page tables only change at admission, which flushes the pipeline,
    so ``page_indices`` stays valid across chained blocks)."""
    from onebit_tpu.engine.sampler import sample_token

    eos = jnp.int32(config.eos_token_id)

    def body(carry, _):
        cache, tok, lens, done, budget, key = carry
        logits, cache = paged_decode_step(
            params, cache, tok[:, None], lens, page_indices, config,
            impl=impl, compute_dtype=compute_dtype)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[:, 0], sub, sampling)
        valid = active & ~done
        nxt = jnp.where(valid, nxt, tok)
        lens = jnp.where(valid, lens + 1, lens)
        budget = jnp.where(valid, budget - 1, budget)
        done = done | (valid & ((nxt == eos) | (budget <= 0)))
        return (cache, nxt, lens, done, budget, key), (nxt, valid)

    carry0 = (cache, next_token, lengths, ~active, budget, key)
    (cache, tok_f, lens_f, done_f, budget_f, key), (toks, valid) = \
        jax.lax.scan(body, carry0, None, length=n_steps)
    return toks, valid, cache, key, (tok_f, lens_f, done_f, budget_f)


@functools.partial(jax.jit, static_argnames=("config", "impl",
                                             "compute_dtype"))
def paged_chunk_append_row(params, cache, ids, start, length,
                           page_indices_row, config: BitLlamaConfig, *,
                           impl: str = "auto", compute_dtype=jnp.bfloat16):
    """Append a fixed-size prompt chunk to ONE sequence's pages.

    Chunked paged prefill: ``ids [C]`` chunk (right-padded), ``start``
    chunk offset, ``length`` valid tokens, ``page_indices_row [max_pages]``.
    The chunk attends to the sequence's earlier pages plus itself — a
    B=1, W=C window core call.
    """
    proj = default_proj(params, config, impl, compute_dtype)
    x, new_cache = _window_core(
        proj, cache, ids[None, :], jnp.asarray(start)[None],
        page_indices_row[None, :], config, compute_dtype, False)
    last = jnp.take_along_axis(
        x, (length - 1)[None, None, None].astype(jnp.int32), axis=1)[0, 0]
    return _lm_logits(params, last, compute_dtype), new_cache


def paged_chunked_prefill_row(params, cache, prompt, page_indices_row,
                              config: BitLlamaConfig, *,
                              chunk_size: int = 64, impl: str = "auto",
                              compute_dtype=jnp.bfloat16,
                              donate: bool = False, start: int = 0,
                              step_fn=None):
    """Chunked paged prefill (host loop over paged_chunk_append_row).
    ``donate=True``: donate cache buffers per chunk (engine convention —
    the caller must not reuse the cache it passed in).
    ``start``: skip the first ``start`` tokens — their K/V already sit in
    the row's (shared) pages (prefix caching); the suffix chunks attend
    to them through the page table.
    ``step_fn``: override the per-chunk program (the TP engine passes its
    shard_map chunk program, engine/tp_backend.py) — same signature as
    :func:`paged_chunk_append_row` minus the static kwargs."""
    if step_fn is None:
        step = paged_chunk_append_row
        if donate:
            from onebit_tpu.engine.batching import _donated
            step = _donated(paged_chunk_append_row)

        def step_fn(params, cache, ids, ci, valid, table):
            return step(params, cache, ids, ci, valid, table, config,
                        impl=impl, compute_dtype=compute_dtype)
    prompt = list(prompt)
    logits = None
    for ci in range(start, len(prompt), chunk_size):
        chunk = prompt[ci:ci + chunk_size]
        valid = len(chunk)
        padded = np.zeros(chunk_size, np.int32)
        padded[:valid] = chunk
        logits, cache = step_fn(
            params, cache, jnp.asarray(padded), jnp.int32(ci),
            jnp.int32(valid), jnp.asarray(page_indices_row))
    return logits, cache
