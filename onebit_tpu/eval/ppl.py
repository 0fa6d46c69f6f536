"""Perplexity evaluation, replicating the reference windowing exactly.

Reference (evaluation/lm_eval.py:93-128): the token stream is cut into
``nsamples = len(tokens) // seqlen`` non-overlapping windows of ``seqlen``;
per window ``nll_i = mean-CE over the (seqlen-1) shifted positions × seqlen``
and ``ppl = exp(Σ nll_i / (nsamples · seqlen))``.  Note the reference's
(deliberate, kept) quirk: the mean is over ``seqlen-1`` positions but the
re-scale is by ``seqlen``.

TPU-native: windows are batched and the whole per-window forward + CE runs
in one jit program; fp32 logits/log-softmax for parity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.model import bitllama
from onebit_tpu.model.config import BitLlamaConfig


@functools.partial(jax.jit, static_argnames=("config", "impl", "compute_dtype"))
def _window_nll(params, windows, config: BitLlamaConfig, *, impl="auto",
                compute_dtype=jnp.float32):
    """windows [B, seqlen] → per-window nll (mean-CE × seqlen), fp32."""
    logits = bitllama.forward(params, windows, config, impl=impl,
                              compute_dtype=compute_dtype)
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = windows[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_ll = jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    mean_ce = -jnp.mean(tok_ll, axis=-1)          # mean over seqlen-1
    return mean_ce * windows.shape[1]             # × seqlen (reference quirk)


@functools.partial(jax.jit, static_argnames=("config", "impl",
                                              "compute_dtype", "vocab_chunk"))
def _window_nll_chunked(params, windows, config: BitLlamaConfig, *,
                        impl="auto", compute_dtype=jnp.float32,
                        vocab_chunk: int = 4096):
    """Streaming-CE variant of :func:`_window_nll`: the lm_head projection
    runs in vocab chunks under an online logsumexp, so the full ``[B,S,V]``
    fp32 logits (+ a log_softmax copy) are never materialized — peak
    activation memory drops V/vocab_chunk-fold, which is what makes
    batch>2 eval windows profitable (PERF.md prefill notes).  Numerics:
    chunk matmuls in ``compute_dtype`` with fp32 accumulation and fp32
    online-lse state — same contract as the direct path (parity test
    tests/test_eval.py)."""
    h = bitllama.forward(params, windows, config, impl=impl,
                         compute_dtype=compute_dtype, return_prelogits=True)
    hs = h[:, :-1]                                       # [B, S-1, D]
    labels = windows[:, 1:]                              # [B, S-1]
    w = params["lm_head"].astype(compute_dtype)          # [V, D]
    v, d = w.shape
    nchunks = -(-v // vocab_chunk)
    wpad = jnp.pad(w, ((0, nchunks * vocab_chunk - v), (0, 0)))
    wchunks = wpad.reshape(nchunks, vocab_chunk, d)
    offsets = jnp.arange(nchunks, dtype=jnp.int32) * vocab_chunk
    neg = jnp.float32(-1e30)

    def body(carry, xs):
        m, s, lab = carry
        wc, off = xs
        z = jnp.matmul(hs, wc.T, preferred_element_type=jnp.float32)
        z = jnp.where((off + jnp.arange(vocab_chunk)) < v, z, neg)
        m_new = jnp.maximum(m, jnp.max(z, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(z - m_new[..., None]),
                                             axis=-1)
        idx = labels - off
        in_chunk = (idx >= 0) & (idx < vocab_chunk)
        zlab = jnp.take_along_axis(
            z, jnp.clip(idx, 0, vocab_chunk - 1)[..., None], axis=-1)[..., 0]
        lab = jnp.where(in_chunk, zlab, lab)
        return (m_new, s, lab), None

    b, sm1 = labels.shape
    init = (jnp.full((b, sm1), neg), jnp.zeros((b, sm1), jnp.float32),
            jnp.full((b, sm1), neg))
    (m, s, lab), _ = jax.lax.scan(body, init, (wchunks, offsets))
    tok_ll = lab - (m + jnp.log(s))                      # log p(label)
    mean_ce = -jnp.mean(tok_ll, axis=-1)
    return mean_ce * windows.shape[1]                    # × seqlen quirk


def perplexity(params, config: BitLlamaConfig, tokens, *, seqlen: int = 2048,
               batch_size: int = 4, impl: str = "auto",
               compute_dtype=jnp.float32, limit: Optional[int] = None,
               progress: bool = False,
               vocab_chunk: Optional[int] = None) -> float:
    """Windowed perplexity of a 1-D token stream (reference protocol)."""
    tokens = np.asarray(tokens).reshape(-1)
    nsamples = len(tokens) // seqlen
    if limit is not None:
        nsamples = min(nsamples, limit)
    if nsamples == 0:
        raise ValueError(f"token stream too short: {len(tokens)} < {seqlen}")
    windows = tokens[:nsamples * seqlen].reshape(nsamples, seqlen)

    nlls = []
    it = range(0, nsamples, batch_size)
    if progress:
        from tqdm import tqdm
        it = tqdm(list(it))
    for i in it:
        chunk = windows[i:i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, seqlen),
                                                    chunk.dtype)])
        if vocab_chunk:
            nll = np.asarray(_window_nll_chunked(
                params, jnp.asarray(chunk), config, impl=impl,
                compute_dtype=compute_dtype, vocab_chunk=vocab_chunk))
        else:
            nll = np.asarray(_window_nll(params, jnp.asarray(chunk), config,
                                         impl=impl,
                                         compute_dtype=compute_dtype))
        nlls.append(nll[:batch_size - pad] if pad else nll)
    total = float(np.concatenate(nlls).sum())
    return float(np.exp(total / (nsamples * seqlen)))
