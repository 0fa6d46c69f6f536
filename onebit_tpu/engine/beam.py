"""Beam search: the HF ``GenerationMixin`` beam path, TPU-native.

The reference inherits beam search from stock HF generate with
``_reorder_cache`` shuffling the tuple-of-tuples KV cache by beam index
every step (modeling_bitllama.py:1503-1510).  Here the whole search is one
fixed-shape jit program over a preallocated cache:

* beams live on the batch axis (``B*K`` rows); reordering is a gather on
  that axis inside jit (the functional ``_reorder_cache``);
* the alive/finished split follows the standard flax/t5x formulation: each
  step draws ``2K`` candidates so EOS hits can retire into the finished set
  without starving the alive set (HF's BeamHypotheses bookkeeping,
  expressed with static shapes);
* finished hypotheses score ``sum_logp / len(generated)**length_penalty``
  (HF length penalty over the generated continuation).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.engine.generate import _prefill
from onebit_tpu.model.bitllama import KVCache, decode_step, init_kv_cache
from onebit_tpu.model.config import BitLlamaConfig

NEG_INF = -1.0e7


def _gather_beams(x, parent, b: int, k: int):
    """Gather beam-major rows: x [B*K, ...] by parent [B, K] -> [B*K, ...]."""
    flat = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
    return jnp.take(x, flat, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "config", "num_beams", "num_steps", "impl", "compute_dtype", "eos_id",
    "length_penalty"))
def _beam_loop(params, cache: KVCache, first_logits, start_index, prompt_len,
               config: BitLlamaConfig, *, num_beams: int, num_steps: int,
               eos_id: int, length_penalty: float, impl: str = "auto",
               compute_dtype=jnp.bfloat16):
    """Run beam search for ``num_steps`` generated tokens.

    ``cache`` already holds the prefilled prompt per batch row, EXPANDED to
    beams ([L, B*K, ...] with identical beam copies).  ``first_logits``
    [B, V] are the prompt's next-token logits.  Returns
    (sequences [B, K, num_steps], scores [B, K], lengths [B, K]) —
    finished-set hypotheses sorted by penalized score.
    """
    b, v = first_logits.shape
    k = num_beams
    key_start = (start_index - prompt_len).astype(jnp.int32)
    key_start = jnp.repeat(key_start, k, axis=0)           # [B*K]
    pos0 = jnp.repeat(prompt_len.astype(jnp.int32), k, axis=0)

    # step 0: expand the prompt's distribution into the first K beams
    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)
    scores0, toks0 = jax.lax.top_k(logp0, k)                # [B, K]

    alive_seq = jnp.zeros((b, k, num_steps), jnp.int32)
    alive_seq = alive_seq.at[:, :, 0].set(toks0)
    alive_score = jnp.where(toks0 == eos_id, NEG_INF, scores0)
    fin_seq = jnp.zeros((b, k, num_steps), jnp.int32)
    fin_score = jnp.full((b, k), NEG_INF, jnp.float32)
    fin_len = jnp.ones((b, k), jnp.int32)
    # a step-0 EOS finishes immediately (length 1)
    eos0 = toks0 == eos_id
    fin_seq = jnp.where(eos0[:, :, None], alive_seq, fin_seq)
    fin_score = jnp.where(eos0, scores0 / (1.0 ** length_penalty), fin_score)

    def body(carry, t):
        alive_seq, alive_score, fin_seq, fin_score, fin_len, cache, pos = carry
        last = jnp.take_along_axis(
            alive_seq.reshape(b * k, num_steps),
            jnp.maximum(t - 1, 0)[None, None].astype(jnp.int32)
            * jnp.ones((b * k, 1), jnp.int32), axis=1)      # [B*K, 1]
        # feeding step t-1's token: its KV lands at cache slot
        # start_index + (t-1) and RoPE position prompt_len + (t-1)
        logits, new_cache = decode_step(
            params, cache, last, start_index + t - 1, config, impl=impl,
            compute_dtype=compute_dtype, positions=pos[:, None],
            key_start=key_start)
        logp = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32), axis=-1).reshape(b, k, v)
        cand = alive_score[:, :, None] + logp               # [B, K, V]
        # 2K candidates so EOS retirements cannot starve the alive set
        c_score, c_flat = jax.lax.top_k(cand.reshape(b, k * v), 2 * k)
        c_parent = c_flat // v                              # [B, 2K]
        c_tok = c_flat % v

        # candidate sequences with the new token written at position t
        seq2k = jnp.take_along_axis(
            alive_seq, c_parent[:, :, None], axis=1)        # [B, 2K, T]
        onehot = (jnp.arange(num_steps)[None, None, :] == t)
        seq2k = jnp.where(onehot, c_tok[:, :, None], seq2k)

        is_eos = c_tok == eos_id
        # finished pool: existing K + new EOS candidates, keep best K
        new_fin_score = jnp.where(
            is_eos,
            c_score / ((t + 1).astype(jnp.float32) ** length_penalty),
            NEG_INF)
        pool_score = jnp.concatenate([fin_score, new_fin_score], axis=1)
        pool_seq = jnp.concatenate([fin_seq, seq2k], axis=1)
        pool_len = jnp.concatenate(
            [fin_len, jnp.full((b, 2 * k), t + 1, jnp.int32)], axis=1)
        fin_score, fin_idx = jax.lax.top_k(pool_score, k)
        fin_seq = jnp.take_along_axis(pool_seq, fin_idx[:, :, None], axis=1)
        fin_len = jnp.take_along_axis(pool_len, fin_idx, axis=1)

        # alive pool: best K non-EOS candidates
        a_score_2k = jnp.where(is_eos, NEG_INF, c_score)
        alive_score, a_idx = jax.lax.top_k(a_score_2k, k)
        alive_seq = jnp.take_along_axis(seq2k, a_idx[:, :, None], axis=1)
        parent = jnp.take_along_axis(c_parent, a_idx, axis=1)  # [B, K]

        # functional _reorder_cache: gather the beam axis
        new_cache = type(new_cache)(
            *(jnp.moveaxis(_gather_beams(jnp.moveaxis(arr, 1, 0), parent,
                                         b, k), 0, 1)
              for arr in new_cache))
        return (alive_seq, alive_score, fin_seq, fin_score, fin_len,
                new_cache, pos + 1), None

    carry = (alive_seq, alive_score, fin_seq, fin_score, fin_len, cache,
             pos0)
    (alive_seq, alive_score, fin_seq, fin_score, fin_len, _, _), _ = \
        jax.lax.scan(body, carry, jnp.arange(1, num_steps))

    # finalize: unfinished alive beams join the pool at full length
    alive_final = alive_score / (float(num_steps) ** length_penalty)
    pool_score = jnp.concatenate([fin_score, alive_final], axis=1)
    pool_seq = jnp.concatenate([fin_seq, alive_seq], axis=1)
    pool_len = jnp.concatenate(
        [fin_len, jnp.full((b, k), num_steps, jnp.int32)], axis=1)
    score, idx = jax.lax.top_k(pool_score, k)
    seq = jnp.take_along_axis(pool_seq, idx[:, :, None], axis=1)
    length = jnp.take_along_axis(pool_len, idx, axis=1)
    return seq, score, length


def beam_generate(params, config: BitLlamaConfig,
                  prompts: Sequence[Sequence[int]], *,
                  num_beams: int = 4, max_new_tokens: int = 64,
                  length_penalty: float = 1.0,
                  num_return_sequences: int = 1,
                  eos_id: Optional[int] = None, impl: str = "auto",
                  compute_dtype=jnp.bfloat16,
                  max_len: Optional[int] = None
                  ) -> List[List[Tuple[List[int], float]]]:
    """Beam-search continuations.  Returns, per prompt, the top
    ``num_return_sequences`` (tokens, penalized_score) pairs, best first —
    the surface of HF ``generate(num_beams=..., num_return_sequences=...)``
    minus sampling hybrids.
    """
    if num_return_sequences > num_beams:
        raise ValueError("num_return_sequences must be <= num_beams")
    eos_id = config.eos_token_id if eos_id is None else eos_id
    b, k = len(prompts), num_beams
    plens = [len(p) for p in prompts]
    maxp = max(plens)
    total = maxp + max_new_tokens
    if max_len is None:
        max_len = 1 << (total - 1).bit_length()
    elif total > max_len:
        raise ValueError(f"prompt+new ({total}) exceeds max_len {max_len}")

    ids = np.zeros((b, maxp), np.int32)
    for r, p in enumerate(prompts):
        ids[r, maxp - len(p):] = p
    attn = (np.arange(maxp)[None, :] >= (maxp - np.asarray(plens))[:, None])

    cache = init_kv_cache(config, b, max_len, dtype=compute_dtype)
    logits, cache = _prefill(params, cache, jnp.asarray(ids),
                             jnp.asarray(attn.astype(np.int32)), config,
                             impl=impl, compute_dtype=compute_dtype)
    # expand prompt cache to beams: [L, B, ...] -> [L, B*K, ...]
    cache = type(cache)(*(jnp.repeat(arr, k, axis=1) for arr in cache))

    seq, score, length = _beam_loop(
        params, cache, logits[:, -1], jnp.int32(maxp), jnp.asarray(plens),
        config, num_beams=k, num_steps=max_new_tokens, eos_id=eos_id,
        length_penalty=length_penalty, impl=impl,
        compute_dtype=compute_dtype)
    seq, score, length = (np.asarray(seq), np.asarray(score),
                          np.asarray(length))

    results = []
    for r in range(b):
        row = []
        for j in range(num_return_sequences):
            toks = seq[r, j, :length[r, j]].tolist()
            row.append((toks, float(score[r, j])))
        results.append(row)
    return results
