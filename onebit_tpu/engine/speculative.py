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


def _verify(t_params, t_cache, window, row_pos, active, t_config,
            t_page_tables, impl, compute_dtype):
    """Target verify window on a dense (t_page_tables=None) or paged
    target cache.  The draft always runs dense — it is a small model whose
    fixed-slot cache is cheap, and proposals never touch the target pool."""
    if t_page_tables is None:
        return ragged_verify_window(
            t_params, t_cache, window, row_pos, active, t_config,
            impl=impl, compute_dtype=compute_dtype)
    from onebit_tpu.engine.paged import paged_verify_window
    return paged_verify_window(
        t_params, t_cache, window, row_pos, t_page_tables, t_config,
        impl=impl, compute_dtype=compute_dtype)


@functools.partial(jax.jit, static_argnames=(
    "t_config", "d_config", "n_draft", "impl", "compute_dtype"))
def spec_decode_round(t_params, d_params, t_cache, d_cache: KVCache,
                      next_token, row_pos, active, budget,
                      t_config: BitLlamaConfig, d_config: BitLlamaConfig,
                      t_page_tables=None, *,
                      n_draft: int, impl: str = "auto",
                      compute_dtype=jnp.bfloat16):
    """One speculative round for all rows, in ONE device program.

    Args:
      next_token [B]: pending token per row (already emitted, not yet
        consumed — the engine convention).
      row_pos    [B]: position where next_token will be written.
      active     [B] bool; budget [B] int32 remaining tokens per row.
      t_page_tables: None (dense target cache) or [B, max_pages] page
        tables — the target then runs on a PAGED cache
        (engine/paged.paged_verify_window) while the draft keeps its own
        small dense cache; the emitted tokens are identical either way.
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
    t_logits, t_cache = _verify(t_params, t_cache, window, row_pos, active,
                                t_config, t_page_tables, impl, compute_dtype)
    greedy = jnp.argmax(t_logits, -1).astype(jnp.int32)  # [B, n_draft+1]

    # -- acceptance: longest prefix of proposals matching target greedy -----
    match = (props == greedy[:, :-1]).astype(jnp.int32)
    a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)      # [B] in [0, n]
    corr = greedy[rows, a]                               # g_a correction
    emitted = jnp.concatenate(
        [props, jnp.zeros((b, 1), jnp.int32)], axis=1)   # [B, n+1]
    emitted = emitted.at[rows, a].set(corr)
    n_emit = a + 1

    return (*_finalize(emitted, n_emit, next_token, row_pos, active,
                       budget, eos), t_cache, d_cache)


def _finalize(emitted, n_emit, next_token, row_pos, active, budget, eos):
    """On-device EOS + budget clamps shared by the greedy and sampled
    rounds.  Returns (emitted, n_emit, new_next, new_row_pos)."""
    b, width = emitted.shape
    rows = jnp.arange(b)
    j = jnp.arange(width)[None, :]
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
    return emitted, n_emit, new_next, new_row_pos


@functools.partial(jax.jit, static_argnames=(
    "t_config", "d_config", "n_draft", "sampling", "impl", "compute_dtype"))
def spec_decode_round_sampled(t_params, d_params, t_cache,
                              d_cache: KVCache, next_token, row_pos,
                              active, budget, key,
                              t_config: BitLlamaConfig,
                              d_config: BitLlamaConfig,
                              t_page_tables=None, *, n_draft: int,
                              sampling, impl: str = "auto",
                              compute_dtype=jnp.bfloat16):
    """One REJECTION-SAMPLING speculative round (temperature/top-k/top-p).

    Standard draft-verify rejection sampling (speculative decoding for
    stochastic sampling): proposal ``x_i ~ q`` is accepted with
    probability ``min(1, p(x_i)/q(x_i))``; the first rejection is
    replaced by a sample from ``norm(max(p - q, 0))``; full acceptance
    earns a bonus token from ``p`` at the window end.  The marginal
    distribution of every emitted token is EXACTLY the target's warped
    sampling distribution, for any draft
    (tests/test_speculative.py empirical check).  ``p``/``q`` are the
    post-warp distributions (sampler.warp_logits) both models actually
    sample from.

    Same signature/returns as :func:`spec_decode_round` plus ``sampling``
    (a SamplingConfig) and ``key``; returns an extra new key.
    """
    from onebit_tpu.engine.sampler import warp_logits

    b = next_token.shape[0]
    rows = jnp.arange(b)
    eos = jnp.int32(t_config.eos_token_id)

    # -- draft proposes n tokens, recording its full warped distributions --
    def dstep(carry, k_step):
        dc, tok, pos = carry
        logits, dc = ragged_decode_step(
            d_params, dc, tok[:, None], pos, active, d_config,
            impl=impl, compute_dtype=compute_dtype)
        wl = warp_logits(logits[:, -1], sampling)
        nxt = jax.random.categorical(k_step, wl, axis=-1).astype(jnp.int32)
        return (dc, nxt, pos + 1), (nxt, jax.nn.softmax(wl, axis=-1))

    key, kacc, kextra, kdraft = jax.random.split(key, 4)
    dkeys = jax.random.split(kdraft, n_draft)
    (d_cache, last_prop, dpos), (props_t, q_t) = jax.lax.scan(
        dstep, (d_cache, next_token, row_pos), dkeys)
    props = props_t.T                                   # [B, n]
    q_all = jnp.moveaxis(q_t, 0, 1)                     # [B, n, V]
    _, d_cache = ragged_decode_step(
        d_params, d_cache, last_prop[:, None], dpos, active, d_config,
        impl=impl, compute_dtype=compute_dtype)

    # -- target scores the whole window in one step -------------------------
    window = jnp.concatenate([next_token[:, None], props], axis=1)
    t_logits, t_cache = _verify(t_params, t_cache, window, row_pos, active,
                                t_config, t_page_tables, impl, compute_dtype)
    p_all = jax.nn.softmax(warp_logits(t_logits, sampling), axis=-1)
    # p_all[:, i] is the target's distribution for proposal i (position
    # after consuming window[:i+1]) — [B, n+1, V]

    # -- rejection sampling --------------------------------------------------
    ii = jnp.arange(n_draft)
    p_i = p_all[rows[:, None], ii[None, :], props]      # [B, n]
    q_i = q_all[rows[:, None], ii[None, :], props]
    u = jax.random.uniform(kacc, (b, n_draft))
    accept = u * jnp.maximum(q_i, 1e-20) < p_i          # u < min(1, p/q)
    a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)

    # replacement at the first rejection: norm(max(p_a - q_a, 0)); on full
    # acceptance (a == n) the same gather lands on p_all[:, n] with no q
    # to subtract — exactly the bonus-token distribution
    p_a = p_all[rows, a]                                # [B, V]
    q_a = jnp.where((a < n_draft)[:, None],
                    q_all[rows, jnp.minimum(a, n_draft - 1)], 0.0)
    resid = jnp.maximum(p_a - q_a, 0.0)
    # numerical guard: if the residual underflows to zero mass (p ≈ q),
    # fall back to p itself — the correction is then immaterial
    z = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(z > 1e-9, resid, p_a)
    extra = jax.random.categorical(
        kextra, jnp.log(resid + 1e-30), axis=-1).astype(jnp.int32)

    emitted = jnp.concatenate(
        [props, jnp.zeros((b, 1), jnp.int32)], axis=1)  # [B, n+1]
    emitted = emitted.at[rows, a].set(extra)
    n_emit = a + 1

    out = _finalize(emitted, n_emit, next_token, row_pos, active, budget,
                    eos)
    return (*out, t_cache, d_cache, key)
