"""Tensor-parallel serving backend: shard_map TP variants of the dense
serving device programs (ragged decode step / block, batched prefill).

This lets the continuous-batching engine serve models bigger than one
chip's HBM (13B+) — or cut per-step weight-unpack latency ``mp``-fold —
with the SAME host-side scheduler: the engine swaps its single-device
jitted programs for these, and admission, buckets, EOS bookkeeping and
metrics stay untouched.  The reference has no multi-device serving at
all: its only eval-time model parallelism is greedy layer-to-GPU
placement with activation-moving forward hooks
(reference evaluation/lm_eval/parallel_utils.py:89-163), and generation
is single-device HF lockstep ``generate``
(modeling_bitllama.py:1464-1510).  Here each program is Megatron-style
tensor parallelism over the ``model`` mesh axis (column/row-parallel
OneBit linears with distributed moment-psum LayerNorm,
model/tp_decode.py) with XLA collectives riding ICI.

Design notes:
* The KV cache is head-sharded (``TP_CACHE_SPEC``) and stacked
  ``[L, B, T, nkv/mp, hd]`` — per-row one-token scatters, donated at
  every dispatch like the single-device engine path.
* The decode step all-gathers fp32 logits only when the host needs the
  full distribution (engine-side sampling); the in-program block loop
  does the same per step so any ``SamplingConfig`` works unmodified.
* Layer loop is ``lax.scan`` over stacked per-layer params (the
  shard_map body cannot use the scalar-prefetch stacked kernels of the
  flat single-device path; the TP win is the mp-fold smaller per-chip
  weight stream, which dominates at 13B+).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from onebit_tpu.engine.sampler import SamplingConfig, sample_token
from onebit_tpu.model import bitllama
from onebit_tpu.model.bitllama import KVCache
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.rope import apply_rope, rope_cos_sin
from onebit_tpu.model.tp_decode import (
    _column_parallel,
    _match_specs,
    _row_parallel,
)
from onebit_tpu.parallel.mesh import MODEL_AXIS

# head-sharded stacked cache: [L, B, T, nkv/mp, hd]
TP_CACHE_SPEC = KVCache(k=P(None, None, None, MODEL_AXIS, None),
                        v=P(None, None, None, MODEL_AXIS, None))


def _tp_ragged_layer(x, layer_params, cos, sin, mask, ck, cv, slot_rows,
                     positions, config: BitLlamaConfig, mp: int, impl: str,
                     attend_cache: bool):
    """One TP decoder layer at per-row positions.

    ``x [R, S, d]`` (replicated), ``ck/cv [B_slots, T, nkv/mp, hd]`` (the
    local head shard), ``slot_rows [R]`` cache slots, ``positions [R, S]``
    write positions.  ``attend_cache=True`` attends over the full (just
    updated) cache rows of the R slots; ``False`` attends over the fresh
    local K/V only (self-contained prefill — rows see only themselves).
    """
    b, s, _ = x.shape
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

    ck = ck.at[slot_rows[:, None], positions].set(k.astype(ck.dtype))
    cv = cv.at[slot_rows[:, None], positions].set(v.astype(cv.dtype))
    if attend_cache:
        kk = ck[slot_rows].astype(q.dtype)
        vv = cv[slot_rows].astype(q.dtype)
    else:
        kk, vv = k, v
    ctx = bitllama._attention(q, kk, vv, mask,
                              num_kv_groups=config.num_kv_groups)
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
    return residual + mlp, ck, cv


def _tp_forward(params, cache: KVCache, tokens, slot_rows, positions, mask,
                config: BitLlamaConfig, mp: int, impl: str,
                compute_dtype, attend_cache: bool):
    """Shared TP body: embed → scan TP layers → final norm.

    ``tokens [R, S]`` int32, ``positions [R, S]`` cache write positions.
    Returns (hidden [R, S, d], new_cache).
    """
    max_len = cache.max_len
    x = params["embed_tokens"][tokens].astype(compute_dtype)
    cos, sin = rope_cos_sin(positions, config.head_dim, config.rope_theta,
                            config.rope_scaling,
                            config.max_position_embeddings, seq_len=max_len,
                            dtype=compute_dtype)

    def layer(x, layer_in):
        layer_params, ck, cv = layer_in
        x, nk, nv = _tp_ragged_layer(
            x, layer_params, cos, sin, mask, ck, cv, slot_rows, positions,
            config, mp, impl, attend_cache)
        return x, (nk, nv)

    x, (nk, nv) = jax.lax.scan(layer, x,
                               (params["layers"], cache.k, cache.v))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    return x, KVCache(k=nk, v=nv)


def _gathered_logits(x, params, compute_dtype):
    """Vocab-sharded lm_head: local partial logits + tiled all-gather."""
    logits_l = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                          preferred_element_type=jnp.float32)
    return jax.lax.all_gather(logits_l, MODEL_AXIS, axis=x.ndim - 1,
                              tiled=True)


class TPServing:
    """jitted shard_map TP programs matching the dense engine contracts.

    ``step / prefill_rows / block`` mirror
    ``model.ragged_decode.{ragged_decode_step, prefill_rows,
    ragged_decode_block}`` (same signatures minus config/static kwargs,
    which are closed over) with the KV cache donated at each dispatch.
    """

    def __init__(self, mesh, config: BitLlamaConfig, params_template, *,
                 impl: str = "auto", compute_dtype=jnp.bfloat16,
                 sampling: Optional[SamplingConfig] = None,
                 block_steps: int = 1):
        mp = mesh.shape[MODEL_AXIS]
        if config.num_attention_heads % mp or \
                config.num_key_value_heads % mp:
            raise ValueError(f"heads not divisible by model={mp}")
        self.mesh = mesh
        self.mp = mp
        specs = _match_specs(params_template)
        sampling = sampling or SamplingConfig(greedy=True)

        def step_body(params, cache, input_ids, row_pos, active):
            b, s = input_ids.shape
            kj = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, cache.max_len), 3)
            mask = (kj <= row_pos[:, None, None, None]) & \
                active[:, None, None, None]
            x, cache = _tp_forward(
                params, cache, input_ids, jnp.arange(b), row_pos[:, None],
                mask, config, mp, impl, compute_dtype, attend_cache=True)
            return _gathered_logits(x, params, compute_dtype), cache

        def prefill_body(params, cache, ids, lengths, rows):
            r, s_pad = ids.shape
            attn = jnp.arange(s_pad)[None, :] < lengths[:, None]
            mask = bitllama._causal_mask(s_pad, s_pad, 0) & \
                attn[:, None, None, :]
            positions = jnp.broadcast_to(jnp.arange(s_pad)[None, :],
                                         (r, s_pad))
            x, cache = _tp_forward(
                params, cache, ids, rows, positions, mask, config, mp,
                impl, compute_dtype, attend_cache=False)
            last = jnp.take_along_axis(
                x, jnp.maximum(lengths - 1, 0)[:, None, None]
                .astype(jnp.int32), axis=1)[:, 0]
            return _gathered_logits(last, params, compute_dtype), cache

        def block_body(params, cache, next_token, row_pos, active, budget,
                       key):
            eos = jnp.int32(config.eos_token_id)

            def body(carry, _):
                cache, tok, pos, done, budget, key = carry
                logits, cache = step_body(params, cache, tok[:, None], pos,
                                          active & ~done)
                key, sub = jax.random.split(key)
                nxt = sample_token(logits[:, 0], sub, sampling)
                valid = active & ~done
                nxt = jnp.where(valid, nxt, tok)
                pos = jnp.where(valid, pos + 1, pos)
                budget = jnp.where(valid, budget - 1, budget)
                done = done | (valid & ((nxt == eos) | (budget <= 0)))
                return (cache, nxt, pos, done, budget, key), (nxt, valid)

            carry0 = (cache, next_token, row_pos, ~active, budget, key)
            (cache, _, _, _, _, key), (toks, valid) = jax.lax.scan(
                body, carry0, None, length=block_steps)
            return toks, valid, cache, key

        smap = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)
        rep = P()
        self.step = jax.jit(
            smap(step_body,
                 in_specs=(specs, TP_CACHE_SPEC, rep, rep, rep),
                 out_specs=(rep, TP_CACHE_SPEC)),
            donate_argnums=(1,))
        self.prefill_rows = jax.jit(
            smap(prefill_body,
                 in_specs=(specs, TP_CACHE_SPEC, rep, rep, rep),
                 out_specs=(rep, TP_CACHE_SPEC)),
            donate_argnums=(1,))
        self.block = jax.jit(
            smap(block_body,
                 in_specs=(specs, TP_CACHE_SPEC, rep, rep, rep, rep, rep),
                 out_specs=(rep, rep, TP_CACHE_SPEC, rep)),
            donate_argnums=(1,))

    def init_cache(self, config: BitLlamaConfig, batch: int, max_len: int,
                   dtype=jnp.bfloat16) -> KVCache:
        """Head-sharded KV cache placed on the mesh."""
        cache = bitllama.init_kv_cache(config, batch, max_len, dtype=dtype)
        return jax.tree.map(
            lambda a, sp: jax.device_put(a, NamedSharding(self.mesh, sp)),
            cache, TP_CACHE_SPEC)
