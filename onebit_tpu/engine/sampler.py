"""Token samplers: greedy, temperature, top-k, top-p — jit-compatible.

The reference relies on HF ``GenerationMixin`` defaults (stock generate;
GeneratingArguments defaults temperature 0.95, top_p 0.7, top_k 50 —
llama_factory/llamafactory/hparams/generating_args.py).  Here sampling is a
pure function of (logits, key, config) so it lives inside the jitted decode
step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 1.0
    top_k: int = 0           # 0 = disabled
    top_p: float = 1.0       # 1.0 = disabled
    greedy: bool = False


def warp_logits(logits, cfg: SamplingConfig):
    """Apply temperature / top-k / top-p warping → logits of the
    distribution actually sampled from ([..., V], excluded tokens -inf).
    The speculative rejection sampler needs this distribution explicitly
    (engine/speculative.py), so it is factored out of sample_token."""
    logits = logits.astype(jnp.float32) / jnp.maximum(cfg.temperature, 1e-6)

    if cfg.top_k and cfg.top_k > 0:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        keep_sorted = cum - probs < cfg.top_p
        kth_idx = jnp.sum(keep_sorted, axis=-1, keepdims=True) - 1
        threshold = jnp.take_along_axis(sorted_logits, kth_idx, axis=-1)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return logits


def sample_token(logits, key, cfg: SamplingConfig):
    """logits [B, V] → token ids [B] (int32)."""
    if cfg.greedy or cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, warp_logits(logits, cfg),
                                  axis=-1).astype(jnp.int32)
