"""Explicit tensor-parallel decode: shard_map over the ``model`` axis.

The GSPMD path auto-partitions the XLA implementation, but the fused Pallas
kernel needs explicit sharding.  This module implements the full Megatron-
style TP decoder layer with OneBit linears (SURVEY.md §2.2 TP row), where
the twist is BitLinear's internal LayerNorm:

* q/k/v, gate/up — **column parallel** (out-features sharded): LayerNorm
  over the sharded axis uses a psum of the two per-row moments only
  (O(rows) on ICI, see kernels/bitlinear_sharded.py);
* o_proj, down_proj — **row parallel** (in-features sharded): partial
  ``((x⊙g)·Sᵀ)⊙h`` psum'd (h is elementwise-out so it commutes with the
  sum), then LayerNorm locally on the replicated result;
* attention runs fully locally on the head shard (heads split over
  ``model``); the KV cache is head-sharded.

Per layer: 5 moment-psums (tiny) + 2 activation psums — the standard
Megatron collective count, overlapped by XLA's async collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from onebit_tpu.core.bitlinear import LN_EPS, layernorm_noaffine
from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.model import bitllama
from onebit_tpu.model.bitllama import KVCache
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.rope import apply_rope, rope_cos_sin
from onebit_tpu.parallel.mesh import MODEL_AXIS


def _local_bitlinear_raw(x, w: BitLinearWeights, impl: str):
    """((x⊙g)·S_localᵀ)⊙h without LayerNorm, fp32 out."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if impl == "pallas" or (impl == "auto"
                            and jax.default_backend() == "tpu"):
        from onebit_tpu.kernels.bitlinear_pallas import _call_large_m
        z = _call_large_m(x2, w.packed, w.input_factor, w.weight_scale,
                          LN_EPS, interpret=jax.default_backend() == "cpu")
    else:
        from onebit_tpu.core.packing import unpack_signs_device
        s = unpack_signs_device(w.packed, dtype=x.dtype)
        z = jnp.matmul(x2 * w.input_factor.astype(x.dtype), s.T,
                       preferred_element_type=jnp.float32)
        z = z * w.weight_scale.astype(jnp.float32)
    return z.reshape(*lead, -1)


def _column_parallel(x, w, impl, eps=LN_EPS):
    """out-shard BitLinear with distributed (moment-psum) LayerNorm."""
    z = _local_bitlinear_raw(x, w, impl).astype(jnp.float32)
    n_total = jax.lax.psum(z.shape[-1], MODEL_AXIS)
    s1 = jax.lax.psum(jnp.sum(z, -1, keepdims=True), MODEL_AXIS)
    s2 = jax.lax.psum(jnp.sum(jnp.square(z), -1, keepdims=True), MODEL_AXIS)
    mean = s1 / n_total
    var = s2 / n_total - jnp.square(mean)
    return ((z - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _row_parallel(x_loc, w, impl, eps=LN_EPS):
    """in-shard BitLinear: partial product psum'd, LayerNorm local."""
    z = _local_bitlinear_raw(x_loc, w, impl)
    z = jax.lax.psum(z, MODEL_AXIS)
    return layernorm_noaffine(z, eps).astype(x_loc.dtype)


# ---- flat (fori-over-layers) TP projections: stacked LOCAL shards stay
# whole in HBM and the raw (no-LN) scalar-prefetch kernel selects the layer
# block on device; LayerNorm's cross-shard reduction happens in XLA after
# the psum.  This gives shard_map TP bodies the same flat HBM-traffic
# profile as the single-device decode path (bitllama.decode_step_flat) —
# the scan-over-layers TP bodies paid an extra read+write of the packed
# weights per step (PERF.md). ----

def _col_parallel_flat(x, layers, name: str, i, impl, eps=LN_EPS):
    """Column-parallel stacked BitLinear with distributed moment-psum LN."""
    from onebit_tpu.kernels.bitlinear import bitlinear_apply_stacked_raw
    z = bitlinear_apply_stacked_raw(x, layers[name], i, impl=impl)
    n_total = jax.lax.psum(z.shape[-1], MODEL_AXIS)
    s1 = jax.lax.psum(jnp.sum(z, -1, keepdims=True), MODEL_AXIS)
    s2 = jax.lax.psum(jnp.sum(jnp.square(z), -1, keepdims=True), MODEL_AXIS)
    mean = s1 / n_total
    var = s2 / n_total - jnp.square(mean)
    return ((z - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _row_parallel_flat(x_loc, layers, name: str, i, impl, eps=LN_EPS):
    """Row-parallel stacked BitLinear: partial products psum'd, LN local."""
    from onebit_tpu.kernels.bitlinear import bitlinear_apply_stacked_raw
    z = bitlinear_apply_stacked_raw(x_loc, layers[name], i, impl=impl)
    z = jax.lax.psum(z, MODEL_AXIS)
    return layernorm_noaffine(z, eps).astype(x_loc.dtype)


def tp_embed(embed, ids, vocab_size: int, compute_dtype):
    """Token embedding lookup that works replicated OR vocab-sharded.

    When ``embed`` is a vocab shard ``[V/mp, d]`` (tp_param_specs shards
    ``embed_tokens`` like ``lm_head`` so a 13B's ~330 MB bf16 table is not
    replicated per chip), each shard looks up only its own rows and one
    psum of the (small) activations combines them — exactly one shard
    contributes nonzero per token, so the sum is exact."""
    if embed.shape[0] == vocab_size:
        return embed[ids].astype(compute_dtype)
    v_local = embed.shape[0]
    shard = jax.lax.axis_index(MODEL_AXIS)
    loc = ids - shard * v_local
    ok = (loc >= 0) & (loc < v_local)
    x = embed[jnp.where(ok, loc, 0)].astype(compute_dtype)
    x = jnp.where(ok[..., None], x, 0)
    return jax.lax.psum(x, MODEL_AXIS)


def _tp_decoder_layer(x, layer_params, cos, sin, mask, cache_kv, cache_index,
                      config: BitLlamaConfig, mp: int, impl: str):
    b, s, d = x.shape
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    nh_l, nkv_l = nh // mp, nkv // mp

    residual = x
    hx = bitllama.rms_norm(x, layer_params["input_layernorm"],
                           config.rms_norm_eps)
    q = _column_parallel(hx, layer_params["q_proj"], impl)
    k = _column_parallel(hx, layer_params["k_proj"], impl)
    v = _column_parallel(hx, layer_params["v_proj"], impl)
    q = q.reshape(b, s, nh_l, hd)
    k = k.reshape(b, s, nkv_l, hd)
    v = v.reshape(b, s, nkv_l, hd)
    q, k = apply_rope(q, k, cos, sin)

    ck, cv = cache_kv
    ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype),
                                             cache_index, axis=1)
    cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype),
                                             cache_index, axis=1)
    ctx = bitllama._attention(q, ck.astype(q.dtype), cv.astype(q.dtype),
                              mask, num_kv_groups=config.num_kv_groups)
    attn = _row_parallel(ctx.reshape(b, s, nh_l * hd),
                         layer_params["o_proj"], impl)
    x = residual + attn

    residual = x
    hx = bitllama.rms_norm(x, layer_params["post_attention_layernorm"],
                           config.rms_norm_eps)
    gate = _column_parallel(hx, layer_params["gate_proj"], impl)
    up = _column_parallel(hx, layer_params["up_proj"], impl)
    mlp = _row_parallel(jax.nn.silu(gate) * up, layer_params["down_proj"],
                        impl)
    return residual + mlp, (ck, cv)


def tp_param_specs(shard_embed: bool = False):
    """PartitionSpecs for the TP decode param tree (packed inference).

    Column-parallel projections shard out-features; row-parallel ones
    (o_proj/down_proj) shard the *in* axis: packed columns + input_factor,
    with weight_scale replicated.  ``shard_embed``: shard ``embed_tokens``
    over vocab like ``lm_head`` (lookup via :func:`tp_embed`) so the
    table is not replicated per chip.
    """
    # K-major packed layout [L, K//32, N]: out = last axis, words = middle
    col = BitLinearWeights(weight_scale=P(None, MODEL_AXIS),
                           input_factor=P(None, None),
                           packed=P(None, None, MODEL_AXIS))
    row = BitLinearWeights(weight_scale=P(None, None),
                           input_factor=P(None, MODEL_AXIS),
                           packed=P(None, MODEL_AXIS, None))
    return {
        "embed_tokens": P(MODEL_AXIS, None) if shard_embed else P(None, None),
        "lm_head": P(MODEL_AXIS, None),
        "final_norm": P(None),
        "layers": {
            "input_layernorm": P(None, None),
            "post_attention_layernorm": P(None, None),
            "q_proj": col, "k_proj": col, "v_proj": col,
            "gate_proj": col, "up_proj": col,
            "o_proj": row, "down_proj": row,
        },
    }


def _match_specs(params, mp: Optional[int] = None):
    """Spec tree matching a concrete param tree (drop None-field specs).

    ``mp``: when given, the embed table is vocab-sharded if divisible."""
    vocab = params["embed_tokens"].shape[0]
    specs = tp_param_specs(shard_embed=bool(mp) and vocab % mp == 0)
    layers = {}
    for name, val in params["layers"].items():
        spec = specs["layers"][name]
        if isinstance(val, BitLinearWeights):
            layers[name] = BitLinearWeights(
                *[s if v is not None else None for s, v in zip(spec, val)])
        else:
            layers[name] = spec
    return dict(specs, layers=layers)


def repack_row_parallel(packed, mp: int):
    """Repack a bitplane plane so word-axis sharding == contiguous K blocks.

    The bitplane layout interleaves elements across the whole word axis
    (element j ↦ word j % nw), so slicing words does NOT slice K.  For
    row-parallel (in-sharded) projections each shard must hold a contiguous
    K block: unpack, split K into ``mp`` blocks, re-pack each block with
    its own local bitplane layout, concatenate along the word axis (-2 in
    the K-major device layout ``[..., K//32, N]``).

    Stacked planes (leading layer axis) are repacked ONE LAYER AT A TIME so
    the transient dense int8 sign tensor is a single layer's ``[N, K]``
    (~70 MB at 13B) rather than all layers at once (~2.8 GB) — the engine
    repacks at construction time on the default device, before sharding,
    where an all-layer dense materialization could OOM exactly on the
    13B+ models TP serving exists for.
    """
    from onebit_tpu.core.packing import (pack_signs_device,
                                         unpack_signs_device)

    def one(plane):                                       # [K//32, N]
        dense = unpack_signs_device(plane, dtype=jnp.int8)  # [N, K]
        blocks = jnp.split(dense, mp, axis=-1)
        return jnp.concatenate([pack_signs_device(b) for b in blocks],
                               axis=-2)

    if packed.ndim == 2:
        return one(packed)
    repack_l = jax.jit(one)
    return jnp.stack([repack_l(packed[layer])
                      for layer in range(packed.shape[0])])


def shard_tp_params(params, mesh):
    mp = mesh.shape[MODEL_AXIS]
    params = dict(params)
    layers = dict(params["layers"])
    for name in ("o_proj", "down_proj"):
        w = layers[name]
        layers[name] = w._replace(packed=repack_row_parallel(w.packed, mp))
    params["layers"] = layers
    specs = _match_specs(params, mp)
    placed = jax.tree.map(
        lambda p, sp: jax.device_put(p, NamedSharding(mesh, sp)),
        params, specs)
    return placed, specs


def make_tp_decode_step(mesh, config: BitLlamaConfig, params_template, *,
                        impl: str = "auto", compute_dtype=jnp.bfloat16):
    """Build a jitted shard_map TP decode step.

    Signature: ``step(params, cache, input_ids, cache_index) ->
    (logits, cache)`` with params/cache sharded per tp_param_specs and the
    KV cache head-sharded.  ``params_template`` supplies the pytree
    structure for the in_specs (any params with the same structure).
    """
    mp = mesh.shape[MODEL_AXIS]
    if config.num_attention_heads % mp or config.num_key_value_heads % mp:
        raise ValueError(f"heads not divisible by model={mp}")
    specs = _match_specs(params_template, mp)
    cache_spec = KVCache(k=P(None, None, None, MODEL_AXIS, None),
                         v=P(None, None, None, MODEL_AXIS, None))

    def body(params, cache, input_ids, cache_index):
        b, s = input_ids.shape
        max_len = cache.max_len
        x = tp_embed(params["embed_tokens"], input_ids, config.vocab_size,
                     compute_dtype)
        positions = cache_index + jnp.arange(s)[None, :]
        cos, sin = rope_cos_sin(
            positions, config.head_dim, config.rope_theta,
            config.rope_scaling, config.max_position_embeddings,
            seq_len=max_len, dtype=compute_dtype)
        mask = bitllama._causal_mask(s, max_len, cache_index)

        def layer(x, layer_in):
            layer_params, ck, cv = layer_in
            x, new_kv = _tp_decoder_layer(
                x, layer_params, cos, sin, mask, (ck, cv), cache_index,
                config, mp, impl)
            return x, new_kv

        x, (nk, nv) = jax.lax.scan(layer, x,
                                   (params["layers"], cache.k, cache.v))
        x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
        # vocab-sharded lm_head: local partial logits over V/mp, all-gather
        logits_l = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                              preferred_element_type=jnp.float32)
        logits = jax.lax.all_gather(logits_l, MODEL_AXIS, axis=2,
                                    tiled=True)
        return logits, KVCache(k=nk, v=nv)

    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, cache_spec, P(), P()),
        out_specs=(P(), cache_spec),
        check_vma=False)
    return jax.jit(smapped)


def make_tp_greedy_step(mesh, config: BitLlamaConfig, params_template, *,
                        impl: str = "auto", compute_dtype=jnp.bfloat16):
    """TP decode step returning greedy next tokens — no logits all-gather.

    ``make_tp_decode_step`` all-gathers the full fp32 logits ``[B, S, V]``
    every step (B·S·V·4 bytes over ICI).  For greedy decode only the argmax
    survives, and argmax commutes with the vocab sharding: each shard
    argmaxes its local ``V/mp`` slice, then ``mp`` (value, index) scalar
    pairs per row are combined — per-step collective bytes drop
    ``V/(2·mp)``-fold (e.g. 32000/8 = 4000× at mp=4).  Addresses the
    reference surface HF ``GenerationMixin.generate`` greedy path
    (modeling_bitllama.py:1464-1510) with a collective-minimal TP design.

    Signature: ``step(params, cache, input_ids, cache_index) ->
    (next_token [B] int32, cache)``; token-exact vs single-device argmax
    (ties broken toward the lowest global vocab index, matching
    ``jnp.argmax`` on the full row).
    """
    mp = mesh.shape[MODEL_AXIS]
    if config.num_attention_heads % mp or config.num_key_value_heads % mp:
        raise ValueError(f"heads not divisible by model={mp}")
    specs = _match_specs(params_template, mp)
    cache_spec = KVCache(k=P(None, None, None, MODEL_AXIS, None),
                         v=P(None, None, None, MODEL_AXIS, None))

    def body(params, cache, input_ids, cache_index):
        b, s = input_ids.shape
        max_len = cache.max_len
        x = tp_embed(params["embed_tokens"], input_ids, config.vocab_size,
                     compute_dtype)
        positions = cache_index + jnp.arange(s)[None, :]
        cos, sin = rope_cos_sin(
            positions, config.head_dim, config.rope_theta,
            config.rope_scaling, config.max_position_embeddings,
            seq_len=max_len, dtype=compute_dtype)
        mask = bitllama._causal_mask(s, max_len, cache_index)

        def layer(x, layer_in):
            layer_params, ck, cv = layer_in
            x, new_kv = _tp_decoder_layer(
                x, layer_params, cos, sin, mask, (ck, cv), cache_index,
                config, mp, impl)
            return x, new_kv

        x, (nk, nv) = jax.lax.scan(layer, x,
                                   (params["layers"], cache.k, cache.v))
        x = bitllama.rms_norm(x[:, -1:], params["final_norm"],
                              config.rms_norm_eps)
        logits_l = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                              preferred_element_type=jnp.float32)[:, 0]
        v_local = logits_l.shape[-1]
        shard = jax.lax.axis_index(MODEL_AXIS)
        local_max = jnp.max(logits_l, axis=-1)                    # [B]
        local_arg = (jnp.argmax(logits_l, axis=-1).astype(jnp.int32)
                     + shard * v_local)                           # [B]
        # [mp, B] each — the only cross-shard traffic for the lm head
        all_max = jax.lax.all_gather(local_max, MODEL_AXIS)
        all_arg = jax.lax.all_gather(local_arg, MODEL_AXIS)
        best_shard = jnp.argmax(all_max, axis=0)                  # [B]
        token = jnp.take_along_axis(all_arg, best_shard[None, :],
                                    axis=0)[0]
        return token, KVCache(k=nk, v=nv)

    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, cache_spec, P(), P()),
        out_specs=(P(), cache_spec),
        check_vma=False)
    return jax.jit(smapped)
