"""Batched loglikelihood scoring — the lm-eval-harness request API.

Mirrors the reference's hot loop ``_loglikelihood_tokens``
(evaluation/lm_eval/base.py:257-430): requests are (context, continuation)
token pairs; each is scored by one forward over ``ctx + cont[:-1]``, summing
the log-probs of the continuation tokens, plus an ``is_greedy`` flag
(whether the continuation is the argmax decoding).

TPU-native differences: requests are sorted by length and padded into a
small set of power-of-two length buckets so jit compiles a handful of
shapes, not one per request (the reference re-pads per batch of 32).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.model import bitllama
from onebit_tpu.model.config import BitLlamaConfig


@functools.partial(jax.jit, static_argnames=("config", "impl", "compute_dtype"))
def _score_batch(params, tokens, cont_mask, config: BitLlamaConfig, *,
                 impl="auto", compute_dtype=jnp.float32):
    """tokens [B, T] (ctx+cont, right-padded), cont_mask [B, T] marks
    continuation positions (on the *label* axis).  Returns (ll_sum [B],
    greedy_ok [B])."""
    attn = (tokens >= 0).astype(jnp.int32)
    safe = jnp.maximum(tokens, 0)
    logits = bitllama.forward(params, safe, config, attention_mask=attn,
                              impl=impl, compute_dtype=compute_dtype)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    labels = safe[:, 1:]
    mask = cont_mask[:, 1:].astype(jnp.float32)
    tok_ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    ll = jnp.sum(tok_ll * mask, axis=-1)
    greedy = jnp.argmax(logp, axis=-1) == labels
    greedy_ok = jnp.all(jnp.where(mask > 0, greedy, True), axis=-1)
    return ll, greedy_ok


def _bucket_len(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def loglikelihood(params, config: BitLlamaConfig,
                  requests: Sequence[Tuple[Sequence[int], Sequence[int]]],
                  *, batch_size: int = 16, impl: str = "auto",
                  compute_dtype=jnp.float32,
                  max_length: int = 2048) -> List[Tuple[float, bool]]:
    """Score (context_tokens, continuation_tokens) pairs.

    Returns [(ll_sum, is_greedy)] in the input order.  Sequences longer
    than ``max_length`` keep their rightmost ``max_length`` tokens
    (reference truncation, base.py:294-306).
    """
    items = []
    for idx, (ctx, cont) in enumerate(requests):
        ctx = list(ctx)
        cont = list(cont)
        if not cont:
            raise ValueError("empty continuation")
        if not ctx:
            ctx = [0]  # reference uses eot as empty-context stand-in
        toks = (ctx + cont)[-(max_length):]
        n_cont = min(len(cont), len(toks))
        items.append((idx, toks, n_cont))

    # sort by padded length desc so buckets fill densely
    items.sort(key=lambda it: -len(it[1]))
    results: List[Tuple[float, bool]] = [None] * len(items)

    for start in range(0, len(items), batch_size):
        chunk = items[start:start + batch_size]
        blen = _bucket_len(max(len(t) for _, t, _ in chunk))
        toks = np.full((len(chunk), blen), -1, np.int32)
        cmask = np.zeros((len(chunk), blen), np.int32)
        for r, (_, t, nc) in enumerate(chunk):
            toks[r, :len(t)] = t
            cmask[r, len(t) - nc:len(t)] = 1
        pad_rows = batch_size - len(chunk)
        if pad_rows:
            toks = np.concatenate(
                [toks, np.full((pad_rows, blen), -1, np.int32)])
            cmask = np.concatenate(
                [cmask, np.zeros((pad_rows, blen), np.int32)])
        ll, greedy = _score_batch(params, jnp.asarray(toks),
                                  jnp.asarray(cmask), config, impl=impl,
                                  compute_dtype=compute_dtype)
        ll = np.asarray(ll)
        greedy = np.asarray(greedy)
        for r, (idx, _, _) in enumerate(chunk):
            results[idx] = (float(ll[r]), bool(greedy[r]))
    return results
