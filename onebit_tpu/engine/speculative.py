"""Greedy speculative decoding: draft proposes, target verifies in one step.

A TPU-native serving feature with no reference counterpart (the reference's
generation surface is lockstep HF ``generate``, SURVEY.md §3.5).  It is an
especially good fit for 1-bit weights: the packed-sign decode kernel is
unpack-bound at small batch, and the unpack cost is *width-invariant* — so
the target model verifies ``n_draft`` proposals in one program that costs
nearly the same as a single decode step.  With a cheap draft model and
acceptance rate a, throughput multiplies by roughly
``(1 + a·n) / (1 + n·c_draft/c_target)``.

Guarantee (greedy): the emitted token sequence is IDENTICAL to plain
greedy decoding of the target model, for any draft model — the draft only
changes speed, never output (tested in tests/test_speculative.py).

Protocol per round (standard draft-verify, batched + ragged):
  window  = [t0, p1..pn]     t0 = pending token, p = draft proposals
  target logits at all n+1 positions → greedy tokens g0..gn
  accept p_{i+1} while p_{i+1} == g_i; with a accepted, emit
  p1..pa plus the correction g_a — a+1 tokens, all equal to plain decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from onebit_tpu.model.bitllama import KVCache
from onebit_tpu.model.config import BitLlamaConfig
from onebit_tpu.model.ragged_decode import (ragged_decode_step,
                                            ragged_verify_window)


@functools.partial(jax.jit, static_argnames=(
    "t_config", "d_config", "n_draft", "impl", "compute_dtype"))
def spec_decode_round(t_params, d_params, t_cache: KVCache, d_cache: KVCache,
                      next_token, row_pos, active, budget,
                      t_config: BitLlamaConfig, d_config: BitLlamaConfig, *,
                      n_draft: int, impl: str = "auto",
                      compute_dtype=jnp.bfloat16):
    """One speculative round for all rows, in ONE device program.

    Args:
      next_token [B]: pending token per row (already emitted, not yet
        consumed — the engine convention).
      row_pos    [B]: position where next_token will be written.
      active     [B] bool; budget [B] int32 remaining tokens per row.
    Returns (emitted [B, n_draft+1], n_emit [B], new_next [B],
             new_row_pos [B], t_cache, d_cache):
      row b emitted ``emitted[b, :n_emit[b]]``; EOS and budget are applied
      ON DEVICE (n_emit clamped to the first EOS / remaining budget);
      inactive rows get n_emit = 0 and unchanged position.
    """
    b = next_token.shape[0]
    rows = jnp.arange(b)
    eos = jnp.int32(t_config.eos_token_id)

    # -- draft proposes n_draft tokens (greedy, its own cache) --------------
    def dstep(carry, _):
        dc, tok, pos = carry
        logits, dc = ragged_decode_step(
            d_params, dc, tok[:, None], pos, active, d_config,
            impl=impl, compute_dtype=compute_dtype)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        return (dc, nxt, pos + 1), nxt

    (d_cache, last_prop, dpos), props = jax.lax.scan(
        dstep, (d_cache, next_token, row_pos), None, length=n_draft)
    props = props.T                                     # [B, n_draft]
    # consume the final proposal too, so the draft cache covers every
    # window position even on full acceptance (logits unused)
    _, d_cache = ragged_decode_step(
        d_params, d_cache, last_prop[:, None], dpos, active, d_config,
        impl=impl, compute_dtype=compute_dtype)

    # -- target verifies the whole window in one step ------------------------
    window = jnp.concatenate([next_token[:, None], props], axis=1)
    t_logits, t_cache = ragged_verify_window(
        t_params, t_cache, window, row_pos, active, t_config,
        impl=impl, compute_dtype=compute_dtype)
    greedy = jnp.argmax(t_logits, -1).astype(jnp.int32)  # [B, n_draft+1]

    # -- acceptance: longest prefix of proposals matching target greedy -----
    match = (props == greedy[:, :-1]).astype(jnp.int32)
    a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)      # [B] in [0, n]
    corr = greedy[rows, a]                               # g_a correction
    emitted = jnp.concatenate(
        [props, jnp.zeros((b, 1), jnp.int32)], axis=1)   # [B, n+1]
    emitted = emitted.at[rows, a].set(corr)
    n_emit = a + 1

    # -- on-device EOS + budget clamps ---------------------------------------
    j = jnp.arange(n_draft + 1)[None, :]
    is_eos = (emitted == eos) & (j < n_emit[:, None])
    first_eos = jnp.argmax(is_eos, axis=1)
    n_emit = jnp.where(jnp.any(is_eos, axis=1),
                       jnp.minimum(n_emit, first_eos + 1), n_emit)
    n_emit = jnp.minimum(n_emit, jnp.maximum(budget, 0))
    n_emit = jnp.where(active, n_emit, 0)

    new_next = jnp.where(n_emit > 0,
                         emitted[rows, jnp.maximum(n_emit - 1, 0)],
                         next_token)
    new_row_pos = row_pos + n_emit
    return emitted, n_emit, new_next, new_row_pos, t_cache, d_cache
