"""Ragged decode step: per-row cache positions (continuous batching core).

Unlike ``bitllama.decode_step`` (one shared cache index — every row at the
same length), each batch row here carries its own write position, so rows
admitted at different times decode together in one jit program.  This is
the decode path the continuous-batching engine drives; the reference has no
equivalent (HF generate is lockstep, SURVEY.md §3.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from onebit_tpu.model import bitllama
from onebit_tpu.model.bitllama import (
    KVCache,
    _project_flat,
    _project_gateup_flat,
    _project_qkv_flat,
)
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.rope import apply_rope, rope_cos_sin


@functools.partial(jax.jit, static_argnames=("config", "impl", "compute_dtype"))
def ragged_decode_step(params, cache: KVCache, input_ids, row_pos, active,
                       config: BitLlamaConfig, *, impl: str = "auto",
                       compute_dtype=jnp.bfloat16):
    """One token per row at per-row positions.

    Args:
      input_ids: [B, 1] next token per row.
      row_pos:   [B] int32 — row's current length (cache write slot).
      active:    [B] bool — inactive rows are fully masked (their cache
                 row is still written at ``row_pos`` but they're garbage
                 slots anyway).
    Returns (logits [B, 1, V], new_cache).

    Flat layer loop (like ``bitllama.decode_step_flat``): stacked params
    stay whole in HBM (scalar-prefetch kernels) and the cache is updated
    in place with per-row one-token scatters — no scan xs/ys slice
    materialization (~2x decode HBM traffic at 7B, PERF.md).

    ``cache`` may be a dense ``KVCache`` or a ``QuantKVCacheKT`` — the
    transposed-K int8 pool whose decode attention runs through the fused
    append+attend Pallas kernel (``kernels.kv_attention``) with per-row
    write positions; this is the deep-context serving hot path (378 vs
    260 tok/s at 7B ctx 2048, PERF.md "Deep-context decode").
    """
    b, s = input_ids.shape
    assert s == 1
    max_len = cache.max_len
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)

    from onebit_tpu.model.kv_cache import (QuantKVCacheKT, QuantKVCacheKT4,
                                           pack_int4_halfplane, quantize_kv,
                                           quantize_kv4,
                                           unpack_int4_halfplane)
    kt = isinstance(cache, QuantKVCacheKT)
    kt4 = isinstance(cache, QuantKVCacheKT4)

    x = params["embed_tokens"][input_ids].astype(compute_dtype)
    cos, sin = rope_cos_sin(row_pos[:, None], config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings, seq_len=max_len,
                            dtype=compute_dtype)

    # [B, 1, 1, T] mask: causal per row + active
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
    mask = (kj <= row_pos[:, None, None, None]) & \
        active[:, None, None, None]
    # the fused kernel takes the same semantics as per-row lengths
    kt_lengths = jnp.where(active, row_pos + 1, 0)

    # length-aware window ladder for the dense branch (see attn_at below):
    # power-of-two widths from 128 to max_len, picked per step by the
    # live maximum position
    _attn_widths = []
    w = 128
    while w < max_len:
        _attn_widths.append(w)
        w *= 2
    _attn_widths.append(max_len)
    if max_len < 128:
        _attn_widths = [max_len]
    need = jnp.max(jnp.where(active, row_pos, 0)) + 1
    width_idx = jnp.sum(
        (jnp.asarray(_attn_widths, jnp.int32) < need).astype(jnp.int32))

    rows = jnp.arange(b)
    layers = params["layers"]

    def body(i, carry):
        x, leaves = carry
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(layers["input_layernorm"], i, 0,
                                            keepdims=False),
            config.rms_norm_eps)
        q, k, v = _project_qkv_flat(hx, layers, i, impl, nkv * hd)
        q = q.reshape(b, 1, nh, hd)
        k = k.reshape(b, 1, nkv, hd)
        v = v.reshape(b, 1, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)

        if kt4:
            # INT4 nibble-packed pools at per-row positions — the engine's
            # capacity option (2x resident context in the same pool
            # bytes).  The FULLY-fused kernel lands every cache write
            # (both nibble merges + both scale columns) in-kernel via
            # aliases: per-row XLA scatters around the aliased call
            # defeat in-place buffer forwarding — measured 0.61x the int8
            # engine rate with outside writes (round-5 batch-B run).
            k_qp, k_st, v_qp, v_s = leaves
            nkq, nks = quantize_kv4(k)
            nvq, nvs = quantize_kv4(v)
            if max_len % 256 == 0:
                # PLANAR leaves carried through the loop (k_st/v_s in the
                # plane-split layouts): a per-layer reshape between the
                # aliased call and the loop carry defeats in-place buffer
                # forwarding → full scale-pool copies every layer
                from onebit_tpu.kernels.kv_attention import (
                    kv_attention_append_kt4_planar)
                ctx, k_qp, k_st, v_qp, v_s = kv_attention_append_kt4_planar(
                    q[:, 0], nkq[:, 0], nks[:, 0], nvq[:, 0], nvs[:, 0],
                    k_qp, k_st, v_qp, v_s, kt_lengths,
                    i, row_pos, inv_scale=1.0)
                ctx = ctx[:, None]
            else:
                # tiny-cache fallback: unpack the layer's pools, insert at
                # per-row positions, repack (correctness path)
                k_st = k_st.at[i, rows, :, row_pos].set(nks[:, 0])
                v_s = v_s.at[i, rows, row_pos].set(nvs[:, 0])
                k_qt_i = unpack_int4_halfplane(
                    jax.lax.dynamic_index_in_dim(k_qp, i, 0,
                                                 keepdims=False), axis=3)
                k_qt_i = k_qt_i.at[rows, :, :, row_pos].set(nkq[:, 0])
                k_qp = jax.lax.dynamic_update_slice(
                    k_qp, pack_int4_halfplane(k_qt_i, axis=3)[None],
                    (i, 0, 0, 0, 0))
                v_i = unpack_int4_halfplane(
                    jax.lax.dynamic_index_in_dim(v_qp, i, 0,
                                                 keepdims=False), axis=1)
                v_i = v_i.at[rows, row_pos].set(nvq[:, 0])
                v_qp = jax.lax.dynamic_update_slice(
                    v_qp, pack_int4_halfplane(v_i, axis=1)[None],
                    (i, 0, 0, 0, 0))
                ctx = bitllama._attention_quant(
                    q, jnp.transpose(k_qt_i, (0, 3, 1, 2)),
                    jnp.transpose(jax.lax.dynamic_index_in_dim(
                        k_st, i, 0, keepdims=False), (0, 2, 1)),
                    v_i,
                    jax.lax.dynamic_index_in_dim(v_s, i, 0, keepdims=False),
                    mask, num_kv_groups=config.num_kv_groups)
            leaves = (k_qp, k_st, v_qp, v_s)
        elif kt:
            # quantize this step's K/V; the ENTIRE cache update (K column,
            # both scale columns, the V row) lands INSIDE the fused kernel
            # via input/output aliases.  Issuing per-row vector-index XLA
            # scatters around the aliased custom call defeats XLA's
            # in-place buffer forwarding — measured +6.5 ms/step of pool
            # copies at 7B b4 T2304 (scripts/probe_ragged_kt.py)
            k_qt, k_st, v_q, v_s = leaves
            nkq, nks = quantize_kv(k)
            nvq, nvs = quantize_kv(v)
            if max_len % 128 == 0:
                from onebit_tpu.kernels.kv_attention import (
                    kv_attention_append_kt)
                ctx, k_qt, k_st, v_q, v_s = kv_attention_append_kt(
                    q[:, 0], nkq[:, 0], nks[:, 0], nvq[:, 0], nvs[:, 0],
                    k_qt, k_st, v_q, v_s, kt_lengths, i, row_pos,
                    inv_scale=1.0)
                ctx = ctx[:, None]
            else:
                # cache too short for the kernel's 128-wide T blocks
                # (tiny test shapes): strided scatters + XLA attention
                k_st = k_st.at[i, rows, :, row_pos].set(nks[:, 0])
                v_q = v_q.at[i, rows, row_pos].set(nvq[:, 0])
                v_s = v_s.at[i, rows, row_pos].set(nvs[:, 0])
                k_qt = k_qt.at[i, rows, :, :, row_pos].set(nkq[:, 0])
                ctx = bitllama._attention_quant(
                    q, jnp.transpose(jax.lax.dynamic_index_in_dim(
                        k_qt, i, 0, keepdims=False), (0, 3, 1, 2)),
                    jnp.transpose(jax.lax.dynamic_index_in_dim(
                        k_st, i, 0, keepdims=False), (0, 2, 1)),
                    jax.lax.dynamic_index_in_dim(v_q, i, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(v_s, i, 0, keepdims=False),
                    mask, num_kv_groups=config.num_kv_groups)
            leaves = (k_qt, k_st, v_q, v_s)
        else:
            k_all, v_all = leaves
            # per-row one-token scatter at (layer i, row, row_pos)
            k_all = k_all.at[i, rows, row_pos].set(
                k[:, 0].astype(k_all.dtype))
            v_all = v_all.at[i, rows, row_pos].set(
                v[:, 0].astype(v_all.dtype))

            # length-aware attention window (round 5): a fixed-shape read
            # of the FULL max_len cache costs its HBM roofline every step
            # (1.31 ms of the 7.6 ms b8/256 step — probe_step_parts.py)
            # even when every row sits near position 0.  lax.switch picks
            # the smallest power-of-two window covering max(row_pos)+1;
            # positions beyond a row's length are exactly masked either
            # way (softmax terms are exact zeros), but XLA regroups the
            # key-axis reduction tree per width, so logits can drift
            # ~1e-6 across widths (and, since the width tracks the BATCH
            # max position, across co-batched neighbors) — the same
            # last-ulp reassociation any tiled reduction exhibits.
            def attn_at(w):
                def f(_):
                    ck = jax.lax.dynamic_slice(
                        k_all, (i, 0, 0, 0, 0),
                        (1, b, w, nkv, hd))[0]
                    cv = jax.lax.dynamic_slice(
                        v_all, (i, 0, 0, 0, 0),
                        (1, b, w, nkv, hd))[0]
                    return bitllama._attention(
                        q, ck.astype(q.dtype), cv.astype(q.dtype),
                        mask[..., :w],
                        num_kv_groups=config.num_kv_groups)
                return f

            if len(_attn_widths) == 1:
                ctx = attn_at(_attn_widths[0])(None)
            else:
                ctx = jax.lax.switch(width_idx,
                                     [attn_at(w) for w in _attn_widths],
                                     None)
            leaves = (k_all, v_all)

        attn_out = _project_flat(ctx.reshape(b, 1, nh * hd), layers,
                                 "o_proj", i, impl)
        x = residual + attn_out
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(
                layers["post_attention_layernorm"], i, 0, keepdims=False),
            config.rms_norm_eps)
        gate, up = _project_gateup_flat(hx, layers, i, impl,
                                        config.intermediate_size)
        mlp = _project_flat(jax.nn.silu(gate) * up, layers, "down_proj", i,
                            impl)
        return (residual + mlp, leaves)

    leaves0 = tuple(cache)
    kt4_kernel = kt4 and max_len % 256 == 0
    if kt4_kernel:
        # plane-split the scale pools ONCE at the program boundary (the
        # loop carries the planar form; see the kt4 branch above)
        k_qp0, k_st0, v_qp0, v_s0 = leaves0
        lyr, bsz = k_st0.shape[0], k_st0.shape[1]
        th = max_len // 2
        leaves0 = (k_qp0, k_st0.reshape(lyr, bsz, nkv, 2, th), v_qp0,
                   v_s0.reshape(lyr, bsz, 2, th, nkv))
    x, leaves = jax.lax.fori_loop(
        0, config.num_hidden_layers, body, (x, leaves0))
    if kt4_kernel:
        k_qp1, kst2, v_qp1, vs2 = leaves
        leaves = (k_qp1, kst2.reshape(lyr, bsz, nkv, max_len), v_qp1,
                  vs2.reshape(lyr, bsz, max_len, nkv))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    return logits, type(cache)(*leaves)


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def prefill_row(params, cache: KVCache, ids, length, row, config, *,
                impl: str = "auto", compute_dtype=jnp.bfloat16):
    """Prefill ONE slot (row) of the cache with a right-padded prompt.

    ``ids`` [S_pad] tokens (right-padded), ``length`` scalar true length,
    ``row`` scalar slot index.  Returns (last_logits [V], new_cache).
    """
    s_pad = ids.shape[0]
    max_len = cache.max_len
    attn = (jnp.arange(s_pad) < length)[None, :].astype(jnp.int32)
    x = params["embed_tokens"][ids[None, :]].astype(compute_dtype)
    cos, sin = rope_cos_sin(jnp.arange(s_pad)[None, :], config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings, seq_len=max_len,
                            dtype=compute_dtype)
    mask = bitllama._causal_mask(s_pad, s_pad, 0) & (attn[:, None, None, :] > 0)

    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)

    def layer2(x, layer_in):
        layer_params, ck, cv = layer_in
        residual = x
        hx = bitllama.rms_norm(x, layer_params["input_layernorm"],
                               config.rms_norm_eps)
        q, k, v = bitllama.project_qkv(hx, layer_params, impl, nkv * hd)
        q = q.reshape(1, s_pad, nh, hd)
        k = k.reshape(1, s_pad, nkv, hd)
        v = v.reshape(1, s_pad, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        ck = jax.lax.dynamic_update_slice(
            ck, k[0].astype(ck.dtype)[None],
            (row, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        cv = jax.lax.dynamic_update_slice(
            cv, v[0].astype(cv.dtype)[None],
            (row, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
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
        return residual + mlp, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        layer2, x, (params["layers"], cache.k, cache.v))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    last = jnp.take_along_axis(
        x, (length - 1)[None, None, None].astype(jnp.int32), axis=1)[0, 0]
    logits = jnp.matmul(last, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    return logits, KVCache(k=new_k, v=new_v)


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def prefill_rows(params, cache: KVCache, ids, lengths, rows,
                 config: BitLlamaConfig, *, impl: str = "auto",
                 compute_dtype=jnp.bfloat16):
    """Prefill SEVERAL cache slots in one program (batched admission).

    ``ids [R, S_pad]`` right-padded prompts, ``lengths [R]`` true lengths,
    ``rows [R]`` slot indices.  Rows attend only within themselves (same
    math as R separate :func:`prefill_row` calls) but share one dispatch
    — admission of an R-request burst costs one program instead of R
    sequential ones.  Flat layer loop with scalar-prefetch stacked
    projections.  Returns (last_logits [R, V], new_cache).

    With a ``QuantKVCacheKT`` cache the prompt K/V are quantized at
    insertion (attention within the prefill itself stays full precision
    — same convention as the quantized paged engine, whose first sampled
    token therefore matches the dense engine exactly).
    """
    r, s_pad = ids.shape
    max_len = cache.max_len
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    from onebit_tpu.model.kv_cache import (QuantKVCacheKT, QuantKVCacheKT4,
                                           quantize_kv, quantize_kv4)
    kt = isinstance(cache, QuantKVCacheKT)
    kt4 = isinstance(cache, QuantKVCacheKT4)
    x = params["embed_tokens"][ids].astype(compute_dtype)
    cos, sin = rope_cos_sin(jnp.arange(s_pad)[None, :], config.head_dim,
                            config.rope_theta, config.rope_scaling,
                            config.max_position_embeddings, seq_len=max_len,
                            dtype=compute_dtype)
    attn = (jnp.arange(s_pad)[None, :] < lengths[:, None])
    mask = bitllama._causal_mask(s_pad, s_pad, 0) & \
        attn[:, None, None, :]

    layers = params["layers"]

    def body(i, carry):
        x, leaves = carry
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(layers["input_layernorm"], i, 0,
                                            keepdims=False),
            config.rms_norm_eps)
        q, k, v = _project_qkv_flat(hx, layers, i, impl, nkv * hd)
        q = q.reshape(r, s_pad, nh, hd)
        k = k.reshape(r, s_pad, nkv, hd)
        v = v.reshape(r, s_pad, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        if kt4:
            # INT4 pools: prompt K/V quantized to nibbles at insertion.
            # Positions p < T/2 land in byte p's LOW nibble, p >= T/2 in
            # byte (p - T/2)'s HIGH nibble (half-plane layout); the merge
            # preserves the partner nibble (stale bytes from a previous
            # occupant of the slot are masked by length in attention).
            # Attention within the prefill itself stays full precision —
            # same convention as the int8 branch below.
            k_qp, k_st, v_qp, v_s = leaves
            t_half = max_len // 2
            nkq, nks = quantize_kv4(k)
            nvq, nvs = quantize_kv4(v)
            k_st = k_st.at[i, rows, :, :s_pad].set(
                jnp.transpose(nks, (0, 2, 1)))
            v_s = v_s.at[i, rows, :s_pad].set(nvs)
            nkq_t = jnp.transpose(nkq, (0, 2, 3, 1))  # [R, nkv, hd, s_pad]
            lo_n = min(s_pad, t_half)
            old = k_qp[i, rows, :, :, :lo_n].astype(jnp.int32)
            new_lo = nkq_t[..., :lo_n].astype(jnp.int32) & 0xF
            k_qp = k_qp.at[i, rows, :, :, :lo_n].set(
                ((old & 0xF0) | new_lo).astype(jnp.int8))
            old = v_qp[i, rows, :lo_n].astype(jnp.int32)
            new_lo = nvq[:, :lo_n].astype(jnp.int32) & 0xF
            v_qp = v_qp.at[i, rows, :lo_n].set(
                ((old & 0xF0) | new_lo).astype(jnp.int8))
            if s_pad > t_half:
                hi_n = s_pad - t_half
                old = k_qp[i, rows, :, :, :hi_n].astype(jnp.int32)
                new_hi = (nkq_t[..., t_half:].astype(jnp.int32) & 0xF) << 4
                k_qp = k_qp.at[i, rows, :, :, :hi_n].set(
                    ((old & 0x0F) | new_hi).astype(jnp.int8))
                old = v_qp[i, rows, :hi_n].astype(jnp.int32)
                new_hi = (nvq[:, t_half:].astype(jnp.int32) & 0xF) << 4
                v_qp = v_qp.at[i, rows, :hi_n].set(
                    ((old & 0x0F) | new_hi).astype(jnp.int8))
            leaves = (k_qp, k_st, v_qp, v_s)
        elif kt:
            k_qt, k_st, v_q, v_s = leaves
            nkq, nks = quantize_kv(k)
            nvq, nvs = quantize_kv(v)
            # K transposed to the pool's [nkv, hd, T] device layout;
            # prefill is one bulk write per layer, not the per-token
            # hot path, so an XLA scatter is fine here
            k_qt = k_qt.at[i, rows, :, :, :s_pad].set(
                jnp.transpose(nkq, (0, 2, 3, 1)))
            k_st = k_st.at[i, rows, :, :s_pad].set(
                jnp.transpose(nks, (0, 2, 1)))
            v_q = v_q.at[i, rows, :s_pad].set(nvq)
            v_s = v_s.at[i, rows, :s_pad].set(nvs)
            leaves = (k_qt, k_st, v_q, v_s)
        else:
            k_all, v_all = leaves
            k_all = k_all.at[i, rows, :s_pad].set(k.astype(k_all.dtype))
            v_all = v_all.at[i, rows, :s_pad].set(v.astype(v_all.dtype))
            leaves = (k_all, v_all)
        ctx = bitllama._attention(q, k, v, mask,
                                  num_kv_groups=config.num_kv_groups)
        attn_out = _project_flat(ctx.reshape(r, s_pad, nh * hd), layers,
                                 "o_proj", i, impl)
        x = residual + attn_out
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(
                layers["post_attention_layernorm"], i, 0, keepdims=False),
            config.rms_norm_eps)
        gate, up = _project_gateup_flat(hx, layers, i, impl,
                                        config.intermediate_size)
        mlp = _project_flat(jax.nn.silu(gate) * up, layers, "down_proj", i,
                            impl)
        return (residual + mlp, leaves)

    x, leaves = jax.lax.fori_loop(
        0, config.num_hidden_layers, body, (x, tuple(cache)))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    last = jnp.take_along_axis(
        x, jnp.maximum(lengths - 1, 0)[:, None, None].astype(jnp.int32),
        axis=1)[:, 0]
    logits = jnp.matmul(last, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    return logits, type(cache)(*leaves)


@functools.partial(jax.jit, static_argnames=(
    "config", "impl", "compute_dtype", "sampling", "n_steps"))
def ragged_decode_block(params, cache, next_token, row_pos, active, budget,
                        key, config: BitLlamaConfig, *, sampling,
                        n_steps: int, impl: str = "auto",
                        compute_dtype=jnp.bfloat16):
    """Run ``n_steps`` ragged decode+sample steps in ONE device program.

    Cuts the host round trip per generated token by ``n_steps`` — the
    serving loop's dominant cost on high-latency runtimes.  EOS and the
    per-row token ``budget`` are handled ON DEVICE: a row that emits EOS or
    exhausts its budget is frozen (token/position held, its cache slot is
    idempotently rewritten with identical values).  Frozen rows still run
    the model — deliberately: skipping them behind a ``lax.cond`` makes
    the identity branch rewrite the multi-GB cache carry every step (a
    measured ~10 ms/step of pure copies at 7B serving shapes), which costs
    far more than the masked compute it saves.
    Returns (tokens [n_steps, B], valid [n_steps, B] bool, cache, key,
    finals); ``valid[s, b]`` marks real tokens (False after a row
    finished).  ``finals = (tok, pos, done, budget)`` is the block's
    final per-row state as DEVICE arrays — the engine's pipelined mode
    chains the next block directly from them (``next_token=tok,
    row_pos=pos, active=~done, budget=budget``) with no host round trip.
    """
    from onebit_tpu.engine.sampler import sample_token

    eos = jnp.int32(config.eos_token_id)

    def body(carry, _):
        cache, tok, pos, done, budget, key = carry
        logits, cache = ragged_decode_step(
            params, cache, tok[:, None], pos, active & ~done, config,
            impl=impl, compute_dtype=compute_dtype)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[:, 0], sub, sampling)
        valid = active & ~done
        nxt = jnp.where(valid, nxt, tok)
        pos = jnp.where(valid, pos + 1, pos)
        budget = jnp.where(valid, budget - 1, budget)
        done = done | (valid & ((nxt == eos) | (budget <= 0)))
        return (cache, nxt, pos, done, budget, key), (nxt, valid)

    done0 = ~active
    carry0 = (cache, next_token, row_pos, done0, budget, key)
    (cache, tok_f, pos_f, done_f, budget_f, key), (toks, valid) = \
        jax.lax.scan(body, carry0, None, length=n_steps)
    return toks, valid, cache, key, (tok_f, pos_f, done_f, budget_f)


@functools.partial(jax.jit, static_argnames=("config", "impl",
                                             "compute_dtype"))
def chunk_append_row(params, cache: KVCache, ids, start, length, row,
                     config: BitLlamaConfig, *, impl: str = "auto",
                     compute_dtype=jnp.bfloat16):
    """Append a fixed-size chunk of prompt tokens to ONE cache row.

    Chunked prefill: long prompts are processed as repeated fixed-shape
    chunk appends (one compiled program regardless of prompt length)
    instead of per-bucket prefill programs.  ``ids [C]`` chunk tokens
    (right-padded), ``start`` scalar chunk offset, ``length`` scalar valid
    tokens in this chunk, ``row`` scalar slot.  The chunk attends to the
    row's earlier cache content plus itself (causal).  Returns
    (last_valid_logits [V], new_cache).

    Supports ``QuantKVCacheKT`` (chunked prefill into the quantized dense
    engine): the chunk's K/V are quantized at insertion and attention
    reads the row's int8 pool slices through ``_attention_quant``.
    """
    c = ids.shape[0]
    max_len = cache.max_len
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)

    x = params["embed_tokens"][ids[None, :]].astype(compute_dtype)
    positions = start + jnp.arange(c)[None, :]
    cos, sin = rope_cos_sin(positions, config.head_dim, config.rope_theta,
                            config.rope_scaling,
                            config.max_position_embeddings, seq_len=max_len,
                            dtype=compute_dtype)
    # mask over the FULL cache axis: key j visible to chunk query i iff
    # j <= start + i and j < start + length (pad queries are garbage but
    # their outputs are unused)
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c, max_len), 2)
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c, max_len), 3)
    mask = kj <= (start + qi)

    from onebit_tpu.model.kv_cache import QuantKVCacheKT, quantize_kv
    if isinstance(cache, QuantKVCacheKT):
        return _chunk_append_row_kt(
            params, cache, x, cos, sin, mask, start, length, row, config,
            impl, compute_dtype, quantize_kv)

    def layer(x, layer_in):
        layer_params, ck, cv = layer_in
        residual = x
        hx = bitllama.rms_norm(x, layer_params["input_layernorm"],
                               config.rms_norm_eps)
        q, k, v = bitllama.project_qkv(hx, layer_params, impl, nkv * hd)
        q = q.reshape(1, c, nh, hd)
        k = k.reshape(1, c, nkv, hd)
        v = v.reshape(1, c, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        ck = jax.lax.dynamic_update_slice(
            ck, k.astype(ck.dtype), (row, start, jnp.int32(0), jnp.int32(0)))
        cv = jax.lax.dynamic_update_slice(
            cv, v.astype(cv.dtype), (row, start, jnp.int32(0), jnp.int32(0)))
        # attend against this row's full cache (now containing the chunk)
        k_row = jax.lax.dynamic_slice_in_dim(ck, row, 1, axis=0)
        v_row = jax.lax.dynamic_slice_in_dim(cv, row, 1, axis=0)
        ctx = bitllama._attention(q, k_row.astype(q.dtype),
                                  v_row.astype(q.dtype), mask,
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
        return residual + mlp, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        layer, x, (params["layers"], cache.k, cache.v))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    last = jnp.take_along_axis(
        x, (length - 1)[None, None, None].astype(jnp.int32), axis=1)[0, 0]
    logits = jnp.matmul(last, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    return logits, KVCache(k=new_k, v=new_v)


def _chunk_append_row_kt(params, cache, x, cos, sin, mask, start, length,
                         row, config: BitLlamaConfig, impl, compute_dtype,
                         quantize_kv):
    """KT-cache body of :func:`chunk_append_row` (flat layer loop; the
    chunk attends to the row's int8 pool slices via the scale-folded XLA
    path — prefill correctness, not the per-token hot path)."""
    c = x.shape[1]
    t = cache.max_len
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    layers = params["layers"]

    def body(i, carry):
        x, leaves = carry
        k_qt, k_st, v_q, v_s = leaves
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(layers["input_layernorm"], i, 0,
                                            keepdims=False),
            config.rms_norm_eps)
        q, k, v = _project_qkv_flat(hx, layers, i, impl, nkv * hd)
        q = q.reshape(1, c, nh, hd)
        k = k.reshape(1, c, nkv, hd)
        v = v.reshape(1, c, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        nkq, nks = quantize_kv(k)
        nvq, nvs = quantize_kv(v)
        z = jnp.int32(0)
        k_qt = jax.lax.dynamic_update_slice(
            k_qt, jnp.transpose(nkq, (0, 2, 3, 1))[None],
            (i, row, z, z, start))
        k_st = jax.lax.dynamic_update_slice(
            k_st, jnp.transpose(nks, (0, 2, 1))[None], (i, row, z, start))
        v_q = jax.lax.dynamic_update_slice(v_q, nvq[None],
                                           (i, row, start, z, z))
        v_s = jax.lax.dynamic_update_slice(v_s, nvs[None],
                                           (i, row, start, z))
        leaves = (k_qt, k_st, v_q, v_s)
        ck = jax.lax.dynamic_slice(k_qt, (i, row, z, z, z),
                                   (1, 1, nkv, hd, t))[0]
        cks = jax.lax.dynamic_slice(k_st, (i, row, z, z),
                                    (1, 1, nkv, t))[0]
        cv = jax.lax.dynamic_slice(v_q, (i, row, z, z, z),
                                   (1, 1, t, nkv, hd))[0]
        cvs = jax.lax.dynamic_slice(v_s, (i, row, z, z),
                                    (1, 1, t, nkv))[0]
        ctx = bitllama._attention_quant(
            q, jnp.transpose(ck, (0, 3, 1, 2)),
            jnp.transpose(cks, (0, 2, 1)), cv, cvs, mask,
            num_kv_groups=config.num_kv_groups)
        attn_out = _project_flat(ctx.reshape(1, c, nh * hd), layers,
                                 "o_proj", i, impl)
        x = residual + attn_out
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(
                layers["post_attention_layernorm"], i, 0, keepdims=False),
            config.rms_norm_eps)
        gate, up = _project_gateup_flat(hx, layers, i, impl,
                                        config.intermediate_size)
        mlp = _project_flat(jax.nn.silu(gate) * up, layers, "down_proj", i,
                            impl)
        return (residual + mlp, leaves)

    x, leaves = jax.lax.fori_loop(0, config.num_hidden_layers, body,
                                  (x, tuple(cache)))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    last = jnp.take_along_axis(
        x, (length - 1)[None, None, None].astype(jnp.int32), axis=1)[0, 0]
    logits = jnp.matmul(last, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    return logits, type(cache)(*leaves)


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "compute_dtype"))
def ragged_verify_window(params, cache: KVCache, tokens, row_pos, active,
                         config: BitLlamaConfig, *, impl: str = "auto",
                         compute_dtype=jnp.bfloat16):
    """W tokens per row at per-row positions, logits at EVERY position.

    The speculative-decoding verify step: ``tokens [B, W]`` are consumed
    at positions ``row_pos[b] .. row_pos[b]+W-1`` (K/V written into the
    cache), and the returned ``logits [B, W, V]`` give the target model's
    next-token distribution after each window prefix — one decode-step
    program verifies W draft proposals.  On the 1-bit kernel this costs
    nearly the same as a single decode step: the packed-weight unpack is
    width-invariant and dominates at small batch.

    Supports ``QuantKVCacheKT`` targets (speculative × quantized-KV):
    window K/V are quantized at insertion and attention reads the int8
    pools through the scale-folded XLA path (``_attention_quant``) — the
    correctness fallback; the fused kernel serves the W=1 hot step.
    """
    b, w = tokens.shape
    max_len = cache.max_len
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    from onebit_tpu.model.kv_cache import QuantKVCacheKT, quantize_kv
    kt = isinstance(cache, QuantKVCacheKT)

    positions = row_pos[:, None] + jnp.arange(w)[None, :]        # [B, W]
    x = params["embed_tokens"][tokens].astype(compute_dtype)
    cos, sin = rope_cos_sin(positions, config.head_dim, config.rope_theta,
                            config.rope_scaling,
                            config.max_position_embeddings, seq_len=max_len,
                            dtype=compute_dtype)

    # [B, 1, W, T] mask: key j visible to window query i of row b iff
    # j <= row_pos[b] + i; inactive rows fully masked
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
    mask = (kj <= positions[:, None, :, None]) & \
        active[:, None, None, None]

    rows = jnp.arange(b)
    layers = params["layers"]

    def pick(a, i):
        return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)

    def body(i, carry):
        x, leaves = carry
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(layers["input_layernorm"], i, 0,
                                            keepdims=False),
            config.rms_norm_eps)
        q, k, v = _project_qkv_flat(hx, layers, i, impl, nkv * hd)
        q = q.reshape(b, w, nh, hd)
        k = k.reshape(b, w, nkv, hd)
        v = v.reshape(b, w, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)

        if kt:
            k_qt, k_st, v_q, v_s = leaves
            nkq, nks = quantize_kv(k)
            nvq, nvs = quantize_kv(v)
            # per-row window scatters; the K pool write is strided
            # ([.., hd, T] minor-dim positions) — acceptable on the
            # verify path, whose round cost is dominated by the model
            k_qt = k_qt.at[i, rows[:, None], :, :, positions].set(nkq)
            k_st = k_st.at[i, rows[:, None], :, positions].set(nks)
            v_q = v_q.at[i, rows[:, None], positions].set(nvq)
            v_s = v_s.at[i, rows[:, None], positions].set(nvs)
            leaves = (k_qt, k_st, v_q, v_s)
            ctx = bitllama._attention_quant(
                q, jnp.transpose(pick(k_qt, i), (0, 3, 1, 2)),
                jnp.transpose(pick(k_st, i), (0, 2, 1)),
                pick(v_q, i), pick(v_s, i), mask,
                num_kv_groups=config.num_kv_groups)
        else:
            k_all, v_all = leaves
            # per-row scatter of the whole window at row_pos..row_pos+W-1
            k_all = k_all.at[i, rows[:, None], positions].set(
                k.astype(k_all.dtype))
            v_all = v_all.at[i, rows[:, None], positions].set(
                v.astype(v_all.dtype))
            leaves = (k_all, v_all)
            ctx = bitllama._attention(q, pick(k_all, i).astype(q.dtype),
                                      pick(v_all, i).astype(q.dtype), mask,
                                      num_kv_groups=config.num_kv_groups)
        attn_out = _project_flat(ctx.reshape(b, w, nh * hd), layers,
                                 "o_proj", i, impl)
        x = residual + attn_out
        residual = x
        hx = bitllama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(
                layers["post_attention_layernorm"], i, 0, keepdims=False),
            config.rms_norm_eps)
        gate, up = _project_gateup_flat(hx, layers, i, impl,
                                        config.intermediate_size)
        mlp = _project_flat(jax.nn.silu(gate) * up, layers, "down_proj", i,
                            impl)
        return (residual + mlp, leaves)

    x, leaves = jax.lax.fori_loop(
        0, config.num_hidden_layers, body, (x, tuple(cache)))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    return logits, type(cache)(*leaves)


def chunked_prefill_row(params, cache: KVCache, prompt, row,
                        config: BitLlamaConfig, *, chunk_size: int = 64,
                        impl: str = "auto", compute_dtype=jnp.bfloat16,
                        donate: bool = False, step_fn=None):
    """Prefill one slot in fixed-size chunks (host loop over chunk_append_row).

    One compiled program serves any prompt length; returns the logits of
    the last prompt token and the updated cache.  ``donate=True`` donates
    the cache buffers at each chunk dispatch (caller must not reuse the
    cache it passed in — the engine's calling convention).
    ``step_fn``: override the per-chunk program (the TP engine passes its
    shard_map chunk program) — signature
    ``(params, cache, ids, start, valid, row) -> (logits, cache)``.
    """
    import numpy as np

    if step_fn is None:
        step = chunk_append_row
        if donate:
            from onebit_tpu.engine.batching import _donated
            step = _donated(chunk_append_row)

        def step_fn(params, cache, ids, ci, valid, row_):
            return step(params, cache, ids, ci, valid, row_, config,
                        impl=impl, compute_dtype=compute_dtype)
    prompt = list(prompt)
    logits = None
    for ci in range(0, len(prompt), chunk_size):
        chunk = prompt[ci:ci + chunk_size]
        valid = len(chunk)
        padded = np.zeros(chunk_size, np.int32)
        padded[:valid] = chunk
        logits, cache = step_fn(
            params, cache, jnp.asarray(padded), jnp.int32(ci),
            jnp.int32(valid), jnp.int32(row))
    return logits, cache
