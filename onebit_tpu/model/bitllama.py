"""Functional BitLlama: LLaMA with every linear projection a BitLinear.

TPU-first re-design of the reference model
(transformers/src/transformers/models/bitllama/modeling_bitllama.py):

* all 7 projections per decoder layer (q/k/v/o + gate/up/down) are
  BitLinear (reference :190-192, :294-297);
* ``embed_tokens`` / ``lm_head`` / RMSNorm weights are frozen during KD
  (reference :1053, :1345-1347, :73) — freezing is enforced by the trainer's
  trainable-mask, the model itself is mode-agnostic;
* GQA via ``num_key_value_heads``, RoPE with linear/dynamic-NTK scaling.

Architecture differences from the reference (deliberate, TPU-native):

* pure functional — params are a pytree, forward is jit/pjit-friendly;
* layers are **stacked** on a leading axis and iterated with ``lax.scan``
  (constant compile time in depth, natural pjit sharding);
* decode uses a preallocated KV cache updated with dynamic_update_slice
  instead of the reference's per-step ``torch.cat`` (reference :379-384);
* attention softmax in fp32, matmuls bf16 with fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from onebit_tpu.core.packing import pack_signs_device
from onebit_tpu.kernels.bitlinear import BitLinearWeights, bitlinear_apply
from onebit_tpu.kernels.linear import LinearWeights, linear_apply
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.rope import apply_rope, rope_cos_sin

PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
              "gate_proj", "up_proj", "down_proj")


def _project(x, w, impl: str):
    """Apply a projection: BitLinear (quantized) or plain Linear (teacher)."""
    if isinstance(w, LinearWeights):
        return linear_apply(x, w)
    return bitlinear_apply(x, w, impl=impl)


class KVCache(NamedTuple):
    """Preallocated per-layer KV cache, stacked on a leading layer axis."""
    k: jax.Array  # [L, B, max_len, n_kv, head_dim]
    v: jax.Array  # [L, B, max_len, n_kv, head_dim]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(config: BitLlamaConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16) -> KVCache:
    shape = (config.num_hidden_layers, batch, max_len,
             config.num_key_value_heads, config.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# Parameter init / conversion
# ---------------------------------------------------------------------------

def _proj_dims(config: BitLlamaConfig) -> Dict[str, Tuple[int, int]]:
    d = config.hidden_size
    kv = config.num_key_value_heads * config.head_dim
    i = config.intermediate_size
    return {
        "q_proj": (d, d), "k_proj": (kv, d), "v_proj": (kv, d),
        "o_proj": (d, d),
        "gate_proj": (i, d), "up_proj": (i, d), "down_proj": (d, i),
    }


def init_params(config: BitLlamaConfig, key, mode: str = "latent",
                dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init parameter pytree (stacked layers on axis 0).

    ``mode``: "latent" (QAT latent fp weights) or "packed" (random packed
    sign words — useful for benchmarks without a trained checkpoint).
    """
    L, d, v = config.num_hidden_layers, config.hidden_size, config.vocab_size
    keys = iter(jax.random.split(key, 16 + 7 * L))
    std = config.initializer_range
    params: Dict[str, Any] = {
        "embed_tokens": jax.random.normal(next(keys), (v, d), dtype) * std,
        "lm_head": jax.random.normal(next(keys), (v, d), dtype) * std,
        "final_norm": jnp.ones((d,), dtype),
        "layers": {
            "input_layernorm": jnp.ones((L, d), dtype),
            "post_attention_layernorm": jnp.ones((L, d), dtype),
        },
    }
    for name, (out, inp) in _proj_dims(config).items():
        h = jnp.ones((L, out), dtype)
        g = jnp.ones((L, inp), dtype)
        if mode == "latent":
            w = jax.random.normal(next(keys), (L, out, inp), dtype) * std
            blw = BitLinearWeights(weight_scale=h, input_factor=g, latent=w)
        elif mode == "packed":
            words = jax.random.randint(next(keys), (L, inp // 32, out),
                                       jnp.iinfo(jnp.int32).min,
                                       jnp.iinfo(jnp.int32).max, jnp.int32)
            blw = BitLinearWeights(weight_scale=h, input_factor=g, packed=words)
        elif mode == "linear":
            # plain full-precision LLaMA (the KD teacher / FP baseline)
            w = jax.random.normal(next(keys), (L, out, inp), dtype) * std
            blw = LinearWeights(weight=w)
        else:
            raise ValueError(f"unknown init mode {mode!r}")
        params["layers"][name] = blw
    return params


def _pad_last(a, target: int):
    pad = target - a.shape[-1]
    if pad == 0:
        return a
    widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, widths)


def fuse_for_decode(params: Dict[str, Any],
                    config: BitLlamaConfig) -> Dict[str, Any]:
    """Fuse q/k/v and gate/up packed projections for serving decode.

    Replaces the five per-projection entries with two
    ``FusedBitLinearWeights`` ("qkv_proj", "gateup_proj") whose packed sign
    words are concatenated along N (segments zero-padded to a 512-multiple,
    ``h = 0`` on pads so the in-kernel moment-form LayerNorm is exact).
    One kernel dispatch + one unpack pass then serves 3 (resp. 2)
    projections — the per-call overhead dominates decode at small batch.

    Requires packed weights and (for qkv) equal projection widths (MHA:
    ``num_key_value_heads == num_attention_heads``, true of every OneBit
    target model).  No-op when preconditions fail.  The fused entries are
    views over the SAME information (column slices recover each
    projection), so training/TP paths keep using unfused checkpoints.
    """
    from onebit_tpu.kernels.bitlinear import FusedBitLinearWeights

    layers = dict(params["layers"])

    def _fusable(names):
        ws = [layers.get(n) for n in names]
        if not all(isinstance(w, BitLinearWeights) and w.mode == "packed"
                   and w.bias is None for w in ws):
            return None
        n_out = {w.packed.shape[-1] for w in ws}
        return ws if len(n_out) == 1 else None

    def _fuse(ws):
        n_true = ws[0].packed.shape[-1]
        seg_pad = -(-n_true // 512) * 512
        packed = jnp.concatenate(
            [_pad_last(w.packed, seg_pad) for w in ws], axis=-1)
        h = jnp.concatenate(
            [_pad_last(w.weight_scale.astype(jnp.float32), seg_pad)
             for w in ws], axis=-1)
        g = jnp.stack([w.input_factor.astype(jnp.float32) for w in ws],
                      axis=-2)  # [L, ns, K]
        return FusedBitLinearWeights(weight_scale=h, input_factor=g,
                                     packed=packed)

    qkv = _fusable(("q_proj", "k_proj", "v_proj"))
    if qkv is not None:
        layers["qkv_proj"] = _fuse(qkv)
        for n in ("q_proj", "k_proj", "v_proj"):
            del layers[n]
    gu = _fusable(("gate_proj", "up_proj"))
    if gu is not None:
        layers["gateup_proj"] = _fuse(gu)
        for n in ("gate_proj", "up_proj"):
            del layers[n]
    out = dict(params)
    out["layers"] = layers
    return out


def pack_model_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert latent/dense-sign projections to packed int32 inference form.

    The TPU-native equivalent of scripts/convert_llama_to_infer_ckpt.py.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for name in PROJ_NAMES:
        w: BitLinearWeights = layers[name]
        if w.mode == "packed":
            continue
        dense = w.latent if w.latent is not None else w.dense_sign
        packed = pack_signs_device(dense)  # leading layer axis preserved
        layers[name] = BitLinearWeights(
            weight_scale=w.weight_scale, input_factor=w.input_factor,
            packed=packed, bias=w.bias)
    out["layers"] = layers
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def rms_norm(x, weight, eps: float):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def _attention_quant(q, k_q, k_s, v_q, v_s, mask, *, num_kv_groups: int):
    """GQA attention directly on an INT8 cache — no full-cache dequant.

    Scales fold exactly: ``scores = (q·k_qᵀ) * k_s`` and
    ``ctx = (probs ⊙ v_s) · v_q`` (the per-(position, head) scale is
    constant along the contracted head_dim, resp. multiplies one softmax
    column).  HBM reads stay int8 — the entire point of the quantized
    cache; the round-1 path re-materialized bf16 K/V per layer per step.
    q [B,S,nh,hd]; k_q/v_q [B,T,nkv,hd] int8; k_s/v_s [B,T,nkv] f32.
    """
    b, s, nh, hd = q.shape
    nkv = k_q.shape[2]
    # XLA:CPU's fallback DotThunk cannot execute bf16×bf16→f32 batched
    # dots that miss the oneDNN/Eigen fast paths (the S=1 decode einsum
    # below lands there); compute them in f32 on CPU — bf16 values are
    # exactly representable in f32 and the accumulate was f32 already.
    # TPU is unaffected (trace-time backend check).
    dt = (jnp.float32 if q.dtype == jnp.bfloat16
          and jax.default_backend() == "cpu" else q.dtype)
    qg = q.reshape(b, s, nkv, num_kv_groups, hd)
    scores = jnp.einsum("bsngh,btnh->bngst", qg.astype(dt),
                        k_q.astype(dt),
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.moveaxis(k_s, 1, 2)[:, :, None, None, :]
    scores = scores * (hd ** -0.5)
    scores = jnp.where(mask[:, :, None], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    pv = (probs * jnp.moveaxis(v_s, 1, 2)[:, :, None, None, :]).astype(dt)
    ctx = jnp.einsum("bngst,btnh->bsngh", pv, v_q.astype(dt))
    return ctx.reshape(b, s, nh, hd).astype(q.dtype)


def project_qkv(hx, layer_params, impl: str, n_out: int):
    """q/k/v for one layer — one fused dispatch when the params carry
    ``qkv_proj`` (fuse_for_decode), else three BitLinear calls.
    ``n_out``: true per-projection width (= nkv*hd; fused requires MHA)."""
    if "qkv_proj" in layer_params:
        from onebit_tpu.kernels.bitlinear import fused_bitlinear_apply
        return fused_bitlinear_apply(hx, layer_params["qkv_proj"], n_out,
                                     impl=impl)
    return (_project(hx, layer_params["q_proj"], impl),
            _project(hx, layer_params["k_proj"], impl),
            _project(hx, layer_params["v_proj"], impl))


def project_gateup(hx, layer_params, impl: str, n_out: int):
    """gate/up for one layer — fused dispatch when ``gateup_proj`` exists."""
    if "gateup_proj" in layer_params:
        from onebit_tpu.kernels.bitlinear import fused_bitlinear_apply
        return fused_bitlinear_apply(hx, layer_params["gateup_proj"], n_out,
                                     impl=impl)
    return (_project(hx, layer_params["gate_proj"], impl),
            _project(hx, layer_params["up_proj"], impl))


# ---- flat (fori-over-layers) projection helpers: STACKED params + a traced
# layer index; the Pallas path DMAs the layer's tiles straight from the
# stacked HBM arrays (kernels/bitlinear_pallas scalar prefetch) ----

def _project_flat(x, layers, name: str, i, impl: str):
    from onebit_tpu.kernels.bitlinear import bitlinear_apply_stacked
    return bitlinear_apply_stacked(x, layers[name], i, impl=impl)


def _project_qkv_flat(hx, layers, i, impl: str, n_out: int):
    if "qkv_proj" in layers:
        from onebit_tpu.kernels.bitlinear import fused_bitlinear_apply_stacked
        return fused_bitlinear_apply_stacked(hx, layers["qkv_proj"], i,
                                             n_out, impl=impl)
    return (_project_flat(hx, layers, "q_proj", i, impl),
            _project_flat(hx, layers, "k_proj", i, impl),
            _project_flat(hx, layers, "v_proj", i, impl))


def _project_gateup_flat(hx, layers, i, impl: str, n_out: int):
    if "gateup_proj" in layers:
        from onebit_tpu.kernels.bitlinear import fused_bitlinear_apply_stacked
        return fused_bitlinear_apply_stacked(hx, layers["gateup_proj"], i,
                                             n_out, impl=impl)
    return (_project_flat(hx, layers, "gate_proj", i, impl),
            _project_flat(hx, layers, "up_proj", i, impl))


def _attention(q, k, v, mask, *, num_kv_groups: int, return_probs=False):
    """GQA attention; q [B,S,nh,hd], k/v [B,T,nkv,hd], mask [B,1,S,T] bool."""
    b, s, nh, hd = q.shape
    t = k.shape[1]
    nkv = k.shape[2]
    q = q.reshape(b, s, nkv, num_kv_groups, hd)
    scores = jnp.einsum("bsngh,btnh->bngst", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5)
    scores = jnp.where(mask[:, :, None], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bngst,btnh->bsngh", probs, v)
    ctx = ctx.reshape(b, s, nh, hd)
    if return_probs:
        # [B, nh, S, T] — the reference's output_attentions layout
        return ctx, probs.reshape(b, nh, s, t)
    return ctx


def _decoder_layer(x, layer_params, cos, sin, mask, cache_kv, cache_index,
                   config: BitLlamaConfig, impl: str,
                   use_flash: bool = False, collect_attn: bool = False):
    """One decoder layer. ``cache_kv``: None or (k,v) [B,max_len,nkv,hd].

    ``use_flash``: pure-causal full-seq attention runs through the Pallas
    flash kernel (mask must be the unpadded causal mask; caller decides).
    Returns (x, new_cache_kv[, attn_probs when collect_attn]).
    """
    b, s, d = x.shape
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    residual = x
    hx = rms_norm(x, layer_params["input_layernorm"], config.rms_norm_eps)

    q, k, v = project_qkv(hx, layer_params, impl, nkv * hd)
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nkv, hd)
    v = v.reshape(b, s, nkv, hd)
    q, k = apply_rope(q, k, cos, sin)

    new_cache_kv = None
    if cache_kv is not None and len(cache_kv) == 4:
        # INT8 quantized cache: (k_q, k_s, v_q, v_s); attention reads the
        # int8 arrays directly with scales folded into scores/probs
        # (_attention_quant) — no full-cache dequantization
        from onebit_tpu.model.kv_cache import quantize_kv
        k_q, k_s, v_q, v_s = cache_kv
        nkq, nks = quantize_kv(k)
        nvq, nvs = quantize_kv(v)
        upd = functools.partial(jax.lax.dynamic_update_slice_in_dim,
                                start_index=cache_index, axis=1)
        k_q, k_s = upd(k_q, nkq), upd(k_s, nks)
        v_q, v_s = upd(v_q, nvq), upd(v_s, nvs)
        new_cache_kv = (k_q, k_s, v_q, v_s)
        attn_out = _project(
            _attention_quant(q, k_q, k_s, v_q, v_s, mask,
                             num_kv_groups=config.num_kv_groups
                             ).reshape(b, s, nh * hd),
            layer_params["o_proj"], impl)
        x = residual + attn_out
        residual = x
        hx = rms_norm(x, layer_params["post_attention_layernorm"],
                      config.rms_norm_eps)
        gate, up = project_gateup(hx, layer_params, impl,
                                  config.intermediate_size)
        mlp = _project(jax.nn.silu(gate) * up, layer_params["down_proj"],
                       impl)
        x = residual + mlp
        if collect_attn:
            return x, new_cache_kv, None
        return x, new_cache_kv
    elif cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), cache_index, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), cache_index, axis=1)
        k_all, v_all = ck, cv
        new_cache_kv = (ck, cv)
    else:
        k_all, v_all = k, v

    attn_probs = None
    if use_flash and cache_kv is None and not collect_attn:
        from onebit_tpu.kernels.attention import flash_causal_attention
        ctx = flash_causal_attention(q, k_all.astype(q.dtype),
                                     v_all.astype(q.dtype),
                                     num_kv_groups=config.num_kv_groups)
    elif collect_attn:
        ctx, attn_probs = _attention(
            q, k_all.astype(q.dtype), v_all.astype(q.dtype), mask,
            num_kv_groups=config.num_kv_groups, return_probs=True)
    else:
        ctx = _attention(q, k_all.astype(q.dtype), v_all.astype(q.dtype),
                         mask, num_kv_groups=config.num_kv_groups)
    attn_out = _project(ctx.reshape(b, s, nh * hd),
                        layer_params["o_proj"], impl)
    x = residual + attn_out

    residual = x
    hx = rms_norm(x, layer_params["post_attention_layernorm"],
                  config.rms_norm_eps)
    gate, up = project_gateup(hx, layer_params, impl,
                              config.intermediate_size)
    mlp = _project(jax.nn.silu(gate) * up, layer_params["down_proj"], impl)
    x = residual + mlp
    if collect_attn:
        return x, new_cache_kv, attn_probs
    return x, new_cache_kv


def _causal_mask(s: int, t: int, offset) -> jnp.ndarray:
    """[1,1,S,T] bool mask: query i attends to keys <= offset + i."""
    qi = jax.lax.broadcasted_iota(jnp.int32, (s, t), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (s, t), 1)
    return (kj <= qi + offset)[None, None]


@functools.partial(jax.jit, static_argnames=(
    "config", "impl", "output_hidden_states", "output_attentions",
    "compute_dtype", "remat", "use_flash", "return_prelogits"))
def forward(params, input_ids, config: BitLlamaConfig, *,
            attention_mask=None, impl: str = "auto",
            compute_dtype=jnp.bfloat16, output_hidden_states: bool = False,
            output_attentions: bool = False,
            remat: bool = False, use_flash: str = "auto",
            return_prelogits: bool = False):
    """Full-sequence forward → logits [B,S,V] fp32.

    ``return_prelogits``: return the final-norm hidden states [B,S,D]
    instead of logits, skipping ``lm_head`` — for consumers that stream
    the vocab projection themselves (eval/ppl.py chunked CE).

    ``attention_mask``: optional [B,S] 1/0 padding mask (reference semantics:
    padded keys masked out; queries still computed).
    ``remat``: rematerialize each decoder layer in the backward pass
    (jax.checkpoint) — the reference's gradient-checkpointing knob
    (core.py:254-263) expressed the JAX way.
    ``use_flash``: "auto" (Pallas flash kernel on TPU when no padding),
    True, or False.
    """
    b, s = input_ids.shape
    x = params["embed_tokens"][input_ids].astype(compute_dtype)
    if attention_mask is not None:
        # left-pad aware positions (reference derives position_ids from the
        # attention-mask cumsum, modeling_bitllama.py:1487-1494)
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    else:
        positions = jnp.arange(s)[None, :]
    cos, sin = rope_cos_sin(
        positions, config.head_dim, config.rope_theta, config.rope_scaling,
        config.max_position_embeddings, seq_len=s, dtype=compute_dtype)

    mask = _causal_mask(s, s, 0)
    if attention_mask is not None:
        mask = mask & (attention_mask[:, None, None, :] > 0)

    if use_flash == "auto":
        from onebit_tpu.kernels.attention import flash_attention_available
        # the Pallas flash kernel needs seq ≥ its 128 block size
        flash = (attention_mask is None and s >= 128 and s % 128 == 0
                 and flash_attention_available())
    else:
        flash = bool(use_flash) and attention_mask is None

    def body(x, layer_params):
        if output_attentions:
            x, _, probs = _decoder_layer(x, layer_params, cos, sin, mask,
                                         None, None, config, impl,
                                         use_flash=False, collect_attn=True)
        else:
            x, _ = _decoder_layer(x, layer_params, cos, sin, mask, None,
                                  None, config, impl, use_flash=flash)
            probs = None
        return x, ((x if output_hidden_states else None),
                   (probs if output_attentions else None))

    if remat:
        body = jax.checkpoint(body)

    x0 = x
    x, (ys, attn_ys) = jax.lax.scan(body, x, params["layers"])

    h = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    if return_prelogits:
        return h
    logits = jnp.matmul(h, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    extras = []
    if output_hidden_states:
        # stacked [L+1, B, S, D]: embeddings then each layer's output
        # (reference output_hidden_states tuple, modeling_bitllama.py:1106+)
        extras.append(jnp.concatenate([x0[None], ys], axis=0))
    if output_attentions:
        extras.append(attn_ys)  # [L, B, nh, S, T]
    if extras:
        return (logits, *extras)
    return logits


@functools.partial(jax.jit, static_argnames=("config", "impl", "compute_dtype"))
def decode_step(params, cache: KVCache, input_ids, cache_index,
                config: BitLlamaConfig, *, impl: str = "auto",
                compute_dtype=jnp.bfloat16, positions=None, key_start=None):
    """Incremental forward: ``input_ids [B, s_new]`` appended at
    ``cache_index`` (scalar int32). Returns (logits [B,s_new,V], new cache).

    ``positions`` optionally overrides the RoPE positions ([B, s_new]) —
    needed with left-padded prompts where each row's true position differs
    from the shared cache slot (the reference derives position_ids from the
    attention-mask cumsum, modeling_bitllama.py:1487-1494).
    ``key_start`` ([B]) optionally masks out cache slots below it per row
    (left-pad slots written during prefill).
    """
    b, s = input_ids.shape
    max_len = cache.max_len
    x = params["embed_tokens"][input_ids].astype(compute_dtype)
    if positions is None:
        positions = cache_index + jnp.arange(s)[None, :]
    cos, sin = rope_cos_sin(
        positions, config.head_dim, config.rope_theta, config.rope_scaling,
        config.max_position_embeddings, seq_len=max_len, dtype=compute_dtype)

    mask = _causal_mask(s, max_len, cache_index)
    if key_start is not None:
        kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, max_len), 3)
        mask = mask & (kj >= key_start[:, None, None, None])

    from onebit_tpu.model.kv_cache import (QuantKVCache, QuantKVCacheKT,
                                           QuantKVCacheKT4)
    if isinstance(cache, (QuantKVCacheKT, QuantKVCacheKT4)):
        raise TypeError("QuantKVCacheKT(4) is a decode_step_flat cache (the "
                        "fused-kernel transposed-K layout); the scan step "
                        "has no kernel to exploit it")
    quant = isinstance(cache, QuantKVCache)
    cache_leaves = tuple(cache)  # KVCache: (k, v); QuantKVCache: 4 arrays

    def body(x, layer_in):
        layer_params = layer_in[0]
        x, new_kv = _decoder_layer(x, layer_params, cos, sin, mask,
                                   tuple(layer_in[1:]), cache_index, config,
                                   impl)
        return x, new_kv

    x, new_leaves = jax.lax.scan(body, x,
                                 (params["layers"],) + cache_leaves)

    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    new_cache = (QuantKVCache(*new_leaves) if quant
                 else KVCache(*new_leaves))
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=("config", "impl",
                                             "compute_dtype"))
def decode_step_flat(params, cache, input_ids, cache_index,
                     config: BitLlamaConfig, *, impl: str = "auto",
                     compute_dtype=jnp.bfloat16, positions=None,
                     key_start=None):
    """``decode_step`` with a flat HBM-traffic profile — same semantics.

    ``decode_step`` scans with the stacked params/cache as scan ``xs``/``ys``:
    XLA materializes each layer's packed-weight slices as fresh buffers for
    the Pallas custom calls (an extra read+write of all ~0.8 GB of weights
    per step) and writes the full cache back as stacked ``ys`` (another
    ~1 GB of writes).  Here the layer loop is a ``fori_loop`` whose carry
    holds the FULL stacked cache updated in place with one-token
    ``dynamic_update_slice`` writes, and the projections use the
    scalar-prefetch stacked kernels (`bitlinear_apply_stacked`) that DMA
    layer tiles straight from the whole stacked arrays.  Measured ~1.9x
    faster at 7B decode (see PERF.md).
    """
    b, s = input_ids.shape
    max_len = cache.max_len
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    x = params["embed_tokens"][input_ids].astype(compute_dtype)
    if positions is None:
        positions = cache_index + jnp.arange(s)[None, :]
    cos, sin = rope_cos_sin(
        positions, config.head_dim, config.rope_theta, config.rope_scaling,
        config.max_position_embeddings, seq_len=max_len, dtype=compute_dtype)

    mask = _causal_mask(s, max_len, cache_index)
    if key_start is not None:
        kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s, max_len), 3)
        mask = mask & (kj >= key_start[:, None, None, None])

    from onebit_tpu.model.kv_cache import (QuantKVCache, QuantKVCacheKT,
                                           QuantKVCacheKT4,
                                           pack_int4_halfplane, quantize_kv,
                                           quantize_kv4,
                                           unpack_int4_halfplane)
    quant = isinstance(cache, QuantKVCache)
    kt = isinstance(cache, QuantKVCacheKT)
    kt4 = isinstance(cache, QuantKVCacheKT4)
    layers = params["layers"]

    # length-aware window ladder for the dense branch (mirrors
    # ragged_decode_step): power-of-two read widths from 128 to max_len,
    # picked by the live maximum position
    _attn_widths = []
    _w = 128
    while _w < max_len:
        _attn_widths.append(_w)
        _w *= 2
    _attn_widths.append(max_len)
    if max_len < 128:
        _attn_widths = [max_len]
    # the window must cover the cache WRITE frontier (keys land at slots
    # cache_index..cache_index+s-1 in flat lockstep), not max(positions):
    # with the left-padded convention (explicit positions < cache_index +
    # key_start) the two differ and a position-based window would drop
    # valid trailing keys
    _need = cache_index + s
    _width_idx = jnp.sum(
        (jnp.asarray(_attn_widths, jnp.int32) < _need).astype(jnp.int32))

    def pick(a, i):
        return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)

    def body(i, carry):
        x, leaves = carry
        residual = x
        hx = rms_norm(x, pick(layers["input_layernorm"], i),
                      config.rms_norm_eps)
        q, k, v = _project_qkv_flat(hx, layers, i, impl, nkv * hd)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
        q, k = apply_rope(q, k, cos, sin)

        if kt4:
            # INT4 nibble-packed transposed-K cache: halves KV HBM bytes
            # again vs int8 (capacity option, PERF.md); the FULLY-fused
            # kernel lands every cache write (both nibble merges + both
            # scale columns) in-kernel via aliases — XLA writes around
            # the aliased call defeat in-place buffer forwarding
            k_qp, k_st, v_qp, v_s = leaves
            nkq, nks = quantize_kv4(k)
            nvq, nvs = quantize_kv4(v)
            if s == 1 and max_len % 256 == 0:
                # planar leaves (k_st/v_s plane-split) carried through
                # the loop — see ragged_decode_step's kt4 branch
                lengths = jnp.full((b,), cache_index + 1, jnp.int32)
                from onebit_tpu.kernels.kv_attention import (
                    kv_attention_append_kt4_planar)
                ctx, k_qp, k_st, v_qp, v_s = \
                    kv_attention_append_kt4_planar(
                        q[:, 0], nkq[:, 0], nks[:, 0], nvq[:, 0],
                        nvs[:, 0], k_qp, k_st, v_qp, v_s, lengths, i,
                        cache_index, starts=key_start, inv_scale=1.0)
                ctx = ctx[:, None]
            else:
                # multi-token / tiny-cache fallback: unpack the layer's
                # pools, insert, repack (correctness path, not hot)
                k_st = jax.lax.dynamic_update_slice(
                    k_st, jnp.transpose(nks, (0, 2, 1))[None],
                    (i, 0, 0, cache_index))
                v_s = jax.lax.dynamic_update_slice(
                    v_s, nvs[None], (i, 0, cache_index, 0))
                k_qt_i = unpack_int4_halfplane(pick(k_qp, i), axis=3)
                k_qt_i = jax.lax.dynamic_update_slice(
                    k_qt_i, jnp.transpose(nkq, (0, 2, 3, 1)),
                    (0, 0, 0, cache_index))
                k_qp = jax.lax.dynamic_update_slice(
                    k_qp, pack_int4_halfplane(k_qt_i, axis=3)[None],
                    (i, 0, 0, 0, 0))
                v_i = unpack_int4_halfplane(pick(v_qp, i), axis=1)
                v_i = jax.lax.dynamic_update_slice(
                    v_i, nvq, (0, cache_index, 0, 0))
                v_qp = jax.lax.dynamic_update_slice(
                    v_qp, pack_int4_halfplane(v_i, axis=1)[None],
                    (i, 0, 0, 0, 0))
                ctx = _attention_quant(
                    q, jnp.transpose(k_qt_i, (0, 3, 1, 2)),
                    jnp.transpose(pick(k_st, i), (0, 2, 1)),
                    v_i, pick(v_s, i),
                    mask, num_kv_groups=config.num_kv_groups)
            leaves = (k_qp, k_st, v_qp, v_s)
        elif kt:
            # transposed-K int8 cache + fused Pallas attention
            # (kernels/kv_attention): K tiles feed the MXU as raw s8 in the
            # standard bf16-LHS x s8-RHS orientation — no VPU dequant of
            # the multi-GB pool (the XLA path's ~1.9 ms/step overhead at
            # ctx 2048, scripts/probe_longctx_parts.py)
            k_qt, k_st, v_q, v_s = leaves
            nkq, nks = quantize_kv(k)
            nvq, nvs = quantize_kv(v)
            if s == 1 and max_len % 128 == 0:
                # fused append+attend: K column, both scale columns and
                # the V row ALL land inside the kernel via aliased
                # write-backs — an XLA DUS into the [.., hd, T] pool is
                # a stride-T scatter (~1.2 ms/step at 7B b4 T2048,
                # probe_kt_step), and any XLA cache write around the
                # aliased custom call risks defeating in-place buffer
                # forwarding (probe_ragged_kt).  FULL stacked pools +
                # scalar-prefetched layer index — a per-layer pick()
                # would materialize a [B,nkv,hd,T] slice copy at the
                # custom-call boundary every layer.  (max_len must fit
                # the kernel's 128-wide T blocks; tiny caches fall
                # through to the XLA path below.)
                from onebit_tpu.kernels.kv_attention import (
                    kv_attention_append_kt)
                lengths = jnp.full((b,), cache_index + 1, jnp.int32)
                ctx, k_qt, k_st, v_q, v_s = kv_attention_append_kt(
                    q[:, 0], nkq[:, 0], nks[:, 0], nvq[:, 0], nvs[:, 0],
                    k_qt, k_st, v_q, v_s, lengths, i,
                    cache_index, starts=key_start, inv_scale=1.0)
                ctx = ctx[:, None]
            else:
                # multi-token windows: DUS writes + row-major views +
                # the XLA path (correctness fallback, not the hot path)
                k_st = jax.lax.dynamic_update_slice(
                    k_st, jnp.transpose(nks, (0, 2, 1))[None],
                    (i, 0, 0, cache_index))
                v_q = jax.lax.dynamic_update_slice(
                    v_q, nvq[None], (i, 0, cache_index, 0, 0))
                v_s = jax.lax.dynamic_update_slice(
                    v_s, nvs[None], (i, 0, cache_index, 0))
                k_qt = jax.lax.dynamic_update_slice(
                    k_qt, jnp.transpose(nkq, (0, 2, 3, 1))[None],
                    (i, 0, 0, 0, cache_index))
                ctx = _attention_quant(
                    q, jnp.transpose(pick(k_qt, i), (0, 3, 1, 2)),
                    jnp.transpose(pick(k_st, i), (0, 2, 1)),
                    pick(v_q, i), pick(v_s, i), mask,
                    num_kv_groups=config.num_kv_groups)
            leaves = (k_qt, k_st, v_q, v_s)
        elif quant:
            k_q, k_s, v_q, v_s = leaves
            nkq, nks = quantize_kv(k)
            nvq, nvs = quantize_kv(v)
            k_q = jax.lax.dynamic_update_slice(
                k_q, nkq[None], (i, 0, cache_index, 0, 0))
            k_s = jax.lax.dynamic_update_slice(
                k_s, nks[None], (i, 0, cache_index, 0))
            v_q = jax.lax.dynamic_update_slice(
                v_q, nvq[None], (i, 0, cache_index, 0, 0))
            v_s = jax.lax.dynamic_update_slice(
                v_s, nvs[None], (i, 0, cache_index, 0))
            leaves = (k_q, k_s, v_q, v_s)
            ctx = _attention_quant(
                q, pick(k_q, i), pick(k_s, i), pick(v_q, i), pick(v_s, i),
                mask, num_kv_groups=config.num_kv_groups)
        else:
            k_all, v_all = leaves
            k_all = jax.lax.dynamic_update_slice(
                k_all, k[None].astype(k_all.dtype), (i, 0, cache_index, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v[None].astype(v_all.dtype), (i, 0, cache_index, 0, 0))
            leaves = (k_all, v_all)
            if len(_attn_widths) > 1:
                # length-aware attention window (see ragged_decode_step):
                # read the smallest power-of-two cache window covering
                # the live positions instead of the full max_len
                def attn_at(w):
                    def f(_):
                        ck = jax.lax.dynamic_slice(
                            k_all, (i, 0, 0, 0, 0),
                            (1, b, w, nkv, hd))[0]
                        cv = jax.lax.dynamic_slice(
                            v_all, (i, 0, 0, 0, 0),
                            (1, b, w, nkv, hd))[0]
                        return _attention(
                            q, ck.astype(q.dtype), cv.astype(q.dtype),
                            mask[..., :w],
                            num_kv_groups=config.num_kv_groups)
                    return f

                ctx = jax.lax.switch(
                    _width_idx, [attn_at(w) for w in _attn_widths], None)
            else:
                ctx = _attention(q, pick(k_all, i).astype(q.dtype),
                                 pick(v_all, i).astype(q.dtype), mask,
                                 num_kv_groups=config.num_kv_groups)

        attn_out = _project_flat(ctx.reshape(b, s, nh * hd), layers,
                                 "o_proj", i, impl)
        x = residual + attn_out
        residual = x
        hx = rms_norm(x, pick(layers["post_attention_layernorm"], i),
                      config.rms_norm_eps)
        gate, up = _project_gateup_flat(hx, layers, i, impl,
                                        config.intermediate_size)
        mlp = _project_flat(jax.nn.silu(gate) * up, layers, "down_proj", i,
                            impl)
        return (residual + mlp, leaves)

    leaves0 = tuple(cache)
    kt4_kernel = kt4 and s == 1 and max_len % 256 == 0
    if kt4_kernel:
        # plane-split the scale pools once at the program boundary (the
        # loop carries the planar form — see the kt4 branch above)
        k_qp0, k_st0, v_qp0, v_s0 = leaves0
        lyr, bsz = k_st0.shape[0], k_st0.shape[1]
        th = max_len // 2
        leaves0 = (k_qp0, k_st0.reshape(lyr, bsz, nkv, 2, th), v_qp0,
                   v_s0.reshape(lyr, bsz, 2, th, nkv))
    x, leaves = jax.lax.fori_loop(0, config.num_hidden_layers, body,
                                  (x, leaves0))
    if kt4_kernel:
        k_qp1, kst2, v_qp1, vs2 = leaves
        leaves = (k_qp1, kst2.reshape(lyr, bsz, nkv, max_len), v_qp1,
                  vs2.reshape(lyr, bsz, max_len, nkv))
    x = rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    new_cache = type(cache)(*leaves)
    return logits, new_cache
