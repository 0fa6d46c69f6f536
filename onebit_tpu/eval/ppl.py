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


def perplexity(params, config: BitLlamaConfig, tokens, *, seqlen: int = 2048,
               batch_size: int = 4, impl: str = "auto",
               compute_dtype=jnp.float32, limit: Optional[int] = None,
               progress: bool = False) -> float:
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
        nll = np.asarray(_window_nll(params, jnp.asarray(chunk), config,
                                     impl=impl, compute_dtype=compute_dtype))
        nlls.append(nll[:batch_size - pad] if pad else nll)
    total = float(np.concatenate(nlls).sum())
    return float(np.exp(total / (nsamples * seqlen)))
