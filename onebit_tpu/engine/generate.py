"""Batch generation: prefill + jitted decode loop with preallocated KV cache.

Replaces the reference's HF ``GenerationMixin`` path (tuple-of-tuples cache
grown by ``torch.cat`` each step, modeling_bitllama.py:379-384) with a
TPU-native loop: one prefill call over the padded prompt batch, then a
``lax.scan``-style decode where cache updates are in-place
dynamic_update_slice ops inside jit — no per-step host round trips.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.engine.sampler import SamplingConfig, sample_token
from onebit_tpu.model import bitllama
from onebit_tpu.model.bitllama import KVCache, decode_step, init_kv_cache
from onebit_tpu.model.config import BitLlamaConfig


@functools.partial(jax.jit,
                   static_argnames=("config", "impl", "sampling", "num_steps",
                                    "compute_dtype"))
def _decode_loop(params, cache: KVCache, last_token, start_index, prompt_len,
                 key, config: BitLlamaConfig, *, sampling: SamplingConfig,
                 num_steps: int, impl: str = "auto",
                 compute_dtype=jnp.bfloat16, eos_id: int = 2):
    """Generate ``num_steps`` tokens for the whole batch in one jit program.

    ``last_token`` [B, 1]; ``start_index`` scalar (current cache fill);
    ``prompt_len`` [B] per-row true prompt lengths (rows continue from their
    own lengths being <= start_index; rows that already hit EOS emit pads).
    Returns (tokens [B, num_steps], done [B]).
    """
    b = last_token.shape[0]

    key_start = (start_index - prompt_len).astype(jnp.int32)  # pad slots

    def body(carry, _):
        cache, tok, idx, pos, key, done = carry
        logits, cache = decode_step(params, cache, tok, idx, config,
                                    impl=impl, compute_dtype=compute_dtype,
                                    positions=pos[:, None],
                                    key_start=key_start)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[:, -1], sub, sampling)
        nxt = jnp.where(done, jnp.int32(eos_id), nxt)
        done = done | (nxt == eos_id)
        return (cache, nxt[:, None], idx + 1, pos + 1, key, done), nxt

    done0 = jnp.zeros((b,), bool)
    pos0 = prompt_len.astype(jnp.int32)  # per-row true position
    (cache, _, _, _, _, done), toks = jax.lax.scan(
        body, (cache, last_token, start_index, pos0, key, done0), None,
        length=num_steps)
    return toks.T, done, cache


def generate(params, config: BitLlamaConfig,
             prompts: Sequence[Sequence[int]], *, max_new_tokens: int = 64,
             sampling: Optional[SamplingConfig] = None,
             impl: str = "auto", compute_dtype=jnp.bfloat16,
             eos_id: Optional[int] = None, seed: int = 0,
             max_len: Optional[int] = None) -> List[List[int]]:
    """Generate continuations for token prompts. Returns new tokens per row.

    Prompts are left-padded to a common length (preserves "last token at a
    fixed position" for the sampler, mirroring the reference's left-padding
    in generation, kd.py:128).
    """
    sampling = sampling or SamplingConfig(greedy=True)
    eos_id = config.eos_token_id if eos_id is None else eos_id
    b = len(prompts)
    plens = [len(p) for p in prompts]
    maxp = max(plens)
    total = maxp + max_new_tokens
    if max_len is None:
        max_len = 1 << (total - 1).bit_length()
    elif total > max_len:
        raise ValueError(
            f"prompt ({maxp}) + max_new_tokens ({max_new_tokens}) = {total} "
            f"exceeds max_len {max_len}; the cache would silently clamp "
            "writes past the end")

    # left-pad prompts with 0 and mask them out via attention positions
    ids = np.zeros((b, maxp), np.int32)
    for r, p in enumerate(prompts):
        ids[r, maxp - len(p):] = p

    cache = init_kv_cache(config, b, max_len, dtype=compute_dtype)
    # prefill: all rows share position axis; padded prefix attends causally
    # but its keys are garbage — rows with shorter prompts therefore attend
    # to pad keys.  For exactness we mask pads in the prefill attention.
    attn = (np.arange(maxp)[None, :] >= (maxp - np.asarray(plens))[:, None])
    logits, cache = _prefill(params, cache, jnp.asarray(ids),
                             jnp.asarray(attn.astype(np.int32)), config,
                             impl=impl, compute_dtype=compute_dtype)
    last = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32) \
        if sampling.greedy else None
    key = jax.random.PRNGKey(seed)
    if last is None:
        key, sub = jax.random.split(key)
        last = sample_token(logits[:, -1], sub, sampling)[:, None]

    toks, done, _ = _decode_loop(
        params, cache, last, jnp.int32(maxp), jnp.asarray(plens), key,
        config, sampling=sampling, num_steps=max_new_tokens - 1, impl=impl,
        compute_dtype=compute_dtype, eos_id=eos_id)
    out = np.concatenate([np.asarray(last), np.asarray(toks)], axis=1)

    results = []
    for r in range(b):
        row = out[r].tolist()
        if eos_id in row:
            row = row[:row.index(eos_id) + 1]
        results.append(row)
    return results


@functools.partial(jax.jit, static_argnames=("config", "impl", "compute_dtype"))
def _prefill(params, cache: KVCache, ids, attn_mask, config: BitLlamaConfig,
             *, impl="auto", compute_dtype=jnp.bfloat16):
    """Prefill with a padding-aware causal mask; fills cache[0:len]."""
    b, s = ids.shape
    max_len = cache.max_len
    x = params["embed_tokens"][ids].astype(compute_dtype)
    from onebit_tpu.model.rope import rope_cos_sin
    # per-row positions from the attention-mask cumsum (left-pad aware),
    # clipped at 0 for pads (reference modeling_bitllama.py:1487-1494)
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0)
    cos, sin = rope_cos_sin(positions, config.head_dim, config.rope_theta,
                            config.rope_scaling,
                            config.max_position_embeddings, seq_len=max_len,
                            dtype=compute_dtype)
    mask = bitllama._causal_mask(s, max_len, 0)
    key_pad = jnp.concatenate(
        [attn_mask > 0,
         jnp.zeros((b, max_len - s), bool)], axis=1)
    mask = mask & key_pad[:, None, None, :]

    def body(x, layer_in):
        layer_params, ck, cv = layer_in
        x, new_kv = bitllama._decoder_layer(
            x, layer_params, cos, sin, mask, (ck, cv), jnp.int32(0), config,
            impl)
        return x, new_kv

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (params["layers"], cache.k, cache.v))
    x = bitllama.rms_norm(x, params["final_norm"], config.rms_norm_eps)
    logits = jnp.matmul(x, params["lm_head"].astype(compute_dtype).T,
                        preferred_element_type=jnp.float32)
    return logits, KVCache(k=new_k, v=new_v)
