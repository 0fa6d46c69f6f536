"""Paged KV cache + paged decode step (BASELINE north star: paged KV).

vLLM-style block tables on TPU: K/V live in fixed-size pages
``[L, n_kv, num_pages, page_size, head_dim]``; each sequence owns a list of
pages (``page_indices [B, pages_per_seq]``) plus its ``length``.  Decode
attention runs through the Pallas ``paged_attention`` kernel on TPU (one
q-token per sequence, pages gathered on the fly) with a jnp gather
reference for CPU tests.  Pages are allocated/freed by a host-side
free-list — sequences of different lengths share the pool, eliminating the
per-slot max_len reservation of the dense cache.

The reference has nothing comparable (its cache is per-step torch.cat,
modeling_bitllama.py:379-384).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.model import bitllama
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.rope import apply_rope, rope_cos_sin


class PagedKVCache(NamedTuple):
    k_pages: jax.Array  # [L, n_kv, num_pages, page_size, head_dim]
    v_pages: jax.Array  # [L, n_kv, num_pages, page_size, head_dim]

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[2]


class QuantPagedKVCache(NamedTuple):
    """INT8 pages + per-(head, page, slot) absmax scales — the combined
    north star (paged + quantized KV).  Scale convention matches the
    Pallas kernel's quantization_utils (absmax over head_dim)."""
    k_q: jax.Array  # [L, n_kv, num_pages, page_size, head_dim] int8
    k_s: jax.Array  # [L, n_kv, num_pages, page_size, 1] f32
    v_q: jax.Array
    v_s: jax.Array

    @property
    def page_size(self) -> int:
        return self.k_q.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_q.shape[2]


def init_paged_kv_cache(config: BitLlamaConfig, num_pages: int,
                        page_size: int = 16, dtype=jnp.bfloat16,
                        quantized=False):
    """``quantized``: False (bf16/f32 pages), True or "int8" (int8 values
    + per-(page, slot, head) absmax scales), or "fp8" (direct
    float8_e4m3fn pages, no scales — half the scale storage/compute of
    int8 at ~3 mantissa bits; native MXU fp8 on v5p+)."""
    shape = (config.num_hidden_layers, config.num_key_value_heads,
             num_pages, page_size, config.head_dim)
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
    """Host-side free-list of physical pages (page 0 is a reserved null)."""

    def __init__(self, num_pages: int):
        self.free: List[int] = list(range(num_pages - 1, 0, -1))

    def alloc(self) -> int:
        if not self.free:
            raise RuntimeError("out of KV pages")
        return self.free.pop()

    def release(self, pages) -> None:
        for p in pages:
            if p > 0:
                self.free.append(int(p))


def _jnp_paged_attention(q, k_pages, v_pages, lengths, page_indices):
    """Reference paged attention (CPU): gather pages, mask, soft attention.

    q [B, nh, hd]; pages [nkv, P, ps, hd]; lengths [B];
    page_indices [B, max_pages] → out [B, nh, hd].
    """
    b, nh, hd = q.shape
    nkv, _, ps, _ = k_pages.shape
    groups = nh // nkv
    # [B, nkv, max_pages, ps, hd] → [B, T, nkv, hd]
    k = jnp.take(k_pages, page_indices, axis=1)   # [nkv, B, mp, ps, hd]
    v = jnp.take(v_pages, page_indices, axis=1)
    k = k.transpose(1, 2, 3, 0, 4).reshape(b, -1, nkv, hd)
    v = v.transpose(1, 2, 3, 0, 4).reshape(b, -1, nkv, hd)
    t = k.shape[1]
    qg = q.reshape(b, nkv, groups, hd)
    scores = jnp.einsum("bngh,btnh->bngt", qg.astype(jnp.float32),
                        k.astype(jnp.float32)) / (hd ** 0.5)
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bngt,btnh->bngh", probs, v.astype(jnp.float32))
    return ctx.reshape(b, nh, hd).astype(q.dtype)


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def paged_decode_step(params, cache: PagedKVCache, input_ids, lengths,
                      page_indices, config: BitLlamaConfig, *,
                      impl: str = "auto", compute_dtype=jnp.bfloat16):
    """One token per sequence with paged KV.

    input_ids [B, 1]; lengths [B] (current length, i.e. the write position);
    page_indices [B, max_pages].  Returns (logits [B, 1, V], new cache).
    """
    b = input_ids.shape[0]
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    ps = cache.page_size
    rows = jnp.arange(b)
    write_page = jnp.take_along_axis(
        page_indices, (lengths // ps)[:, None], axis=1)[:, 0]
    write_slot = lengths % ps

    x = params["embed_tokens"][input_ids].astype(compute_dtype)
    cos, sin = rope_cos_sin(lengths[:, None], config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings,
                            seq_len=config.max_position_embeddings,
                            dtype=compute_dtype)

    # the Pallas kernel needs MXU-aligned head geometry (head_dim % 128,
    # verified for LLaMA-family MHA); small/test configs use the jnp path.
    # fp32-parity evals should pass impl="xla" (the kernel trades ~1e-2
    # logit precision for speed).
    use_kernel = (jax.default_backend() == "tpu" and impl != "xla"
                  and hd % 128 == 0 and (nkv == nh or nh // nkv >= 8))

    quant = isinstance(cache, QuantPagedKVCache)
    if not quant and cache.k_pages.dtype == jnp.float8_e4m3fn:
        # pallas paged_attention takes bf16/f32 or int8 QuantizedTensor;
        # fp8 pages read through the jnp path (XLA fuses gather + cast)
        use_kernel = False

    def layer(x, layer_in):
        layer_params = layer_in[0]
        kv_leaves = layer_in[1:]
        residual = x
        hx = bitllama.rms_norm(x, layer_params["input_layernorm"],
                               config.rms_norm_eps)
        q, k, v = bitllama.project_qkv(hx, layer_params, impl, nkv * hd)
        q = q.reshape(b, 1, nh, hd)
        k = k.reshape(b, 1, nkv, hd)
        v = v.reshape(b, 1, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        k1 = k[:, 0].transpose(1, 0, 2)   # [nkv, B, hd]
        v1 = v[:, 0].transpose(1, 0, 2)

        if quant:
            kq, ks, vq, vs = kv_leaves
            k_i8, k_sc = _quantize_kv_int8(k1)
            v_i8, v_sc = _quantize_kv_int8(v1)
            kq = kq.at[:, write_page, write_slot].set(k_i8)
            ks = ks.at[:, write_page, write_slot].set(k_sc)
            vq = vq.at[:, write_page, write_slot].set(v_i8)
            vs = vs.at[:, write_page, write_slot].set(v_sc)
            new_leaves = (kq, ks, vq, vs)
        else:
            kp, vp = kv_leaves
            kp = kp.at[:, write_page, write_slot].set(k1.astype(kp.dtype))
            vp = vp.at[:, write_page, write_slot].set(v1.astype(vp.dtype))
            new_leaves = (kp, vp)

        q1 = q[:, 0]
        if use_kernel:
            from jax.experimental.pallas.ops.tpu.paged_attention import (
                paged_attention,
            )
            if quant:
                from jax.experimental.pallas.ops.tpu.paged_attention import (
                    quantization_utils as qu,
                )
                k_arg = qu.QuantizedTensor(weight=new_leaves[0],
                                           scales=new_leaves[1])
                v_arg = qu.QuantizedTensor(weight=new_leaves[2],
                                           scales=new_leaves[3])
            else:
                k_arg, v_arg = new_leaves
            ctx = paged_attention(
                (q1 / (hd ** 0.5)).astype(compute_dtype), k_arg, v_arg,
                lengths + 1, page_indices,
                pages_per_compute_block=max(page_indices.shape[1] // 4, 1))
        else:
            if quant:
                kf = _dequantize_kv_int8(new_leaves[0], new_leaves[1])
                vf = _dequantize_kv_int8(new_leaves[2], new_leaves[3])
            else:
                kf, vf = new_leaves
            ctx = _jnp_paged_attention(q1, kf, vf, lengths + 1, page_indices)
        attn = bitllama._project(ctx.astype(compute_dtype).reshape(
            b, 1, nh * hd), layer_params["o_proj"], impl)
        x = residual + attn
        residual = x
        hx = bitllama.rms_norm(x, layer_params["post_attention_layernorm"],
                               config.rms_norm_eps)
        gate, up = bitllama.project_gateup(hx, layer_params, impl,
                                           config.intermediate_size)
        mlp = bitllama._project(jax.nn.silu(gate) * up,
                                layer_params["down_proj"], impl)
        return residual + mlp, new_leaves

    x, new_leaves = jax.lax.scan(layer, x,
                                 (params["layers"],) + tuple(cache))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    new_cache = (QuantPagedKVCache(*new_leaves) if quant
                 else PagedKVCache(*new_leaves))
    return logits, new_cache


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def paged_prefill_row(params, cache: PagedKVCache, ids, length,
                      page_indices_row, config: BitLlamaConfig, *,
                      impl: str = "auto", compute_dtype=jnp.bfloat16):
    """Prefill ONE sequence into its pages.

    ids [S_pad] right-padded prompt; length scalar; page_indices_row
    [max_pages] this sequence's pages.  Returns (last_logits [V], cache).

    The caller must allocate pages covering the PADDED bucket length
    (``ceil(S_pad / page_size)``): pad positions scatter into later
    (page, slot) pairs which decode overwrites before attending, but an
    under-allocated table would clamp pad writes onto real slots.
    """
    s_pad = ids.shape[0]
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    ps = cache.page_size
    positions = jnp.arange(s_pad)
    pages = jnp.take(page_indices_row, positions // ps)
    slots = positions % ps

    attn = (positions < length)[None, :].astype(jnp.int32)
    x = params["embed_tokens"][ids[None, :]].astype(compute_dtype)
    cos, sin = rope_cos_sin(positions[None, :], config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings,
                            seq_len=config.max_position_embeddings,
                            dtype=compute_dtype)
    mask = bitllama._causal_mask(s_pad, s_pad, 0) & (attn[:, None, None, :] > 0)

    quant = isinstance(cache, QuantPagedKVCache)
    if not quant and cache.k_pages.dtype == jnp.float8_e4m3fn:
        # pallas paged_attention takes bf16/f32 or int8 QuantizedTensor;
        # fp8 pages read through the jnp path (XLA fuses gather + cast)
        use_kernel = False

    def layer(x, layer_in):
        layer_params = layer_in[0]
        kv_leaves = layer_in[1:]
        residual = x
        hx = bitllama.rms_norm(x, layer_params["input_layernorm"],
                               config.rms_norm_eps)
        q, k, v = bitllama.project_qkv(hx, layer_params, impl, nkv * hd)
        q = q.reshape(1, s_pad, nh, hd)
        k = k.reshape(1, s_pad, nkv, hd)
        v = v.reshape(1, s_pad, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        k1 = k[0].transpose(1, 0, 2)   # [nkv, S, hd]
        v1 = v[0].transpose(1, 0, 2)
        # scatter all positions into (page, slot); padded positions land in
        # slots beyond `length` of the last page and are never attended
        if quant:
            kq, ks, vq, vs = kv_leaves
            k_i8, k_sc = _quantize_kv_int8(k1)
            v_i8, v_sc = _quantize_kv_int8(v1)
            kq = kq.at[:, pages, slots].set(k_i8)
            ks = ks.at[:, pages, slots].set(k_sc)
            vq = vq.at[:, pages, slots].set(v_i8)
            vs = vs.at[:, pages, slots].set(v_sc)
            new_leaves = (kq, ks, vq, vs)
        else:
            kp, vp = kv_leaves
            kp = kp.at[:, pages, slots].set(k1.astype(kp.dtype))
            vp = vp.at[:, pages, slots].set(v1.astype(vp.dtype))
            new_leaves = (kp, vp)
        ctx = bitllama._attention(q, k, v, mask,
                                  num_kv_groups=config.num_kv_groups)
        attn_out = bitllama._project(ctx.reshape(1, s_pad, nh * hd),
                                     layer_params["o_proj"], impl)
        x = residual + attn_out
        residual = x
        hx = bitllama.rms_norm(x, layer_params["post_attention_layernorm"],
                               config.rms_norm_eps)
        gate, up = bitllama.project_gateup(hx, layer_params, impl,
                                           config.intermediate_size)
        mlp = bitllama._project(jax.nn.silu(gate) * up,
                                layer_params["down_proj"], impl)
        return residual + mlp, new_leaves

    x, new_leaves = jax.lax.scan(layer, x,
                                 (params["layers"],) + tuple(cache))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    last = jnp.take_along_axis(
        x, (length - 1)[None, None, None].astype(jnp.int32), axis=1)[0, 0]
    logits = jnp.matmul(last, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    new_cache = (QuantPagedKVCache(*new_leaves) if quant
                 else PagedKVCache(*new_leaves))
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=(
    "config", "impl", "compute_dtype", "sampling", "n_steps"))
def paged_decode_block(params, cache, next_token, lengths, page_indices,
                       active, budget, key, config: BitLlamaConfig, *,
                       sampling, n_steps: int, impl: str = "auto",
                       compute_dtype=jnp.bfloat16):
    """n_steps paged decode+sample steps in one device program with
    ON-DEVICE EOS + per-row budget handling (see ragged_decode_block).
    Overflow writes past a row's pages clamp onto the reserved null page 0
    by construction.  Returns (tokens [n_steps, B], valid [n_steps, B],
    cache, key)."""
    from onebit_tpu.engine.sampler import sample_token

    eos = jnp.int32(config.eos_token_id)

    def step(carry):
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
        return (cache, nxt, lens, done, budget, key), valid

    def body(carry, _):
        done = carry[3]
        new_carry, valid = jax.lax.cond(
            jnp.all(done | ~active),
            lambda c: (c, jnp.zeros_like(active)),
            step, carry)
        return new_carry, (new_carry[1], valid)

    carry0 = (cache, next_token, lengths, ~active, budget, key)
    (cache, _, _, _, _, key), (toks, valid) = jax.lax.scan(
        body, carry0, None, length=n_steps)
    return toks, valid, cache, key


@functools.partial(jax.jit, static_argnames=("config", "impl",
                                             "compute_dtype"))
def paged_chunk_append_row(params, cache, ids, start, length,
                           page_indices_row, config: BitLlamaConfig, *,
                           impl: str = "auto", compute_dtype=jnp.bfloat16):
    """Append a fixed-size prompt chunk to ONE sequence's pages.

    Chunked paged prefill: ``ids [C]`` chunk (right-padded), ``start``
    chunk offset, ``length`` valid tokens, ``page_indices_row [max_pages]``.
    The chunk attends to the sequence's earlier pages plus itself.
    """
    c = ids.shape[0]
    quant = isinstance(cache, QuantPagedKVCache)
    if not quant and cache.k_pages.dtype == jnp.float8_e4m3fn:
        # pallas paged_attention takes bf16/f32 or int8 QuantizedTensor;
        # fp8 pages read through the jnp path (XLA fuses gather + cast)
        use_kernel = False
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    ps = cache.page_size
    positions = start + jnp.arange(c)
    pages = jnp.take(page_indices_row, positions // ps)
    slots = positions % ps

    x = params["embed_tokens"][ids[None, :]].astype(compute_dtype)
    cos, sin = rope_cos_sin(positions[None, :], config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings,
                            seq_len=config.max_position_embeddings,
                            dtype=compute_dtype)
    max_pages = page_indices_row.shape[0]
    t_full = max_pages * ps
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c, t_full), 2)
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c, t_full), 3)
    mask = kj <= (start + qi)

    def layer(x, layer_in):
        layer_params = layer_in[0]
        kv_leaves = layer_in[1:]
        residual = x
        hx = bitllama.rms_norm(x, layer_params["input_layernorm"],
                               config.rms_norm_eps)
        q, k, v = bitllama.project_qkv(hx, layer_params, impl, nkv * hd)
        q = q.reshape(1, c, nh, hd)
        k = k.reshape(1, c, nkv, hd)
        v = v.reshape(1, c, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        k1 = k[0].transpose(1, 0, 2)
        v1 = v[0].transpose(1, 0, 2)
        if quant:
            kq, ks, vq, vs = kv_leaves
            k_i8, k_sc = _quantize_kv_int8(k1)
            v_i8, v_sc = _quantize_kv_int8(v1)
            kq = kq.at[:, pages, slots].set(k_i8)
            ks = ks.at[:, pages, slots].set(k_sc)
            vq = vq.at[:, pages, slots].set(v_i8)
            vs = vs.at[:, pages, slots].set(v_sc)
            new_leaves = (kq, ks, vq, vs)
            kf = _dequantize_kv_int8(kq, ks)
            vf = _dequantize_kv_int8(vq, vs)
        else:
            kp, vp = kv_leaves
            kp = kp.at[:, pages, slots].set(k1.astype(kp.dtype))
            vp = vp.at[:, pages, slots].set(v1.astype(vp.dtype))
            new_leaves = (kp, vp)
            kf, vf = kp, vp
        # gather this sequence's pages → [1, T, nkv, hd]
        k_seq = jnp.take(kf, page_indices_row, axis=1) \
            .transpose(1, 2, 0, 3).reshape(1, t_full, nkv, hd)
        v_seq = jnp.take(vf, page_indices_row, axis=1) \
            .transpose(1, 2, 0, 3).reshape(1, t_full, nkv, hd)
        ctx = bitllama._attention(q, k_seq.astype(q.dtype),
                                  v_seq.astype(q.dtype), mask,
                                  num_kv_groups=config.num_kv_groups)
        attn_out = bitllama._project(ctx.reshape(1, c, nh * hd),
                                     layer_params["o_proj"], impl)
        x = residual + attn_out
        residual = x
        hx = bitllama.rms_norm(x, layer_params["post_attention_layernorm"],
                               config.rms_norm_eps)
        gate, up = bitllama.project_gateup(hx, layer_params, impl,
                                           config.intermediate_size)
        mlp = bitllama._project(jax.nn.silu(gate) * up,
                                layer_params["down_proj"], impl)
        return residual + mlp, new_leaves

    x, new_leaves = jax.lax.scan(layer, x,
                                 (params["layers"],) + tuple(cache))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    last = jnp.take_along_axis(
        x, (length - 1)[None, None, None].astype(jnp.int32), axis=1)[0, 0]
    logits = jnp.matmul(last, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    new_cache = (QuantPagedKVCache(*new_leaves) if quant
                 else PagedKVCache(*new_leaves))
    return logits, new_cache


def paged_chunked_prefill_row(params, cache, prompt, page_indices_row,
                              config: BitLlamaConfig, *,
                              chunk_size: int = 64, impl: str = "auto",
                              compute_dtype=jnp.bfloat16):
    """Chunked paged prefill (host loop over paged_chunk_append_row)."""
    prompt = list(prompt)
    logits = None
    for ci in range(0, len(prompt), chunk_size):
        chunk = prompt[ci:ci + chunk_size]
        valid = len(chunk)
        padded = np.zeros(chunk_size, np.int32)
        padded[:valid] = chunk
        logits, cache = paged_chunk_append_row(
            params, cache, jnp.asarray(padded), jnp.int32(ci),
            jnp.int32(valid), jnp.asarray(page_indices_row), config,
            impl=impl, compute_dtype=compute_dtype)
    return logits, cache
