"""Plain (full-precision) linear projection weights.

Used for the FP16/BF16 *teacher* model in KD (reference loads the teacher
via ``AutoModelForCausalLM`` as a stock LLaMA, llamafactory/core.py:543-551)
and for FP baselines in eval.  The same BitLlama decoder code runs either
projection type — dispatch happens per-layer on the weight container type.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LinearWeights(NamedTuple):
    weight: jax.Array                 # [out, in]
    bias: Optional[jax.Array] = None  # [out]


def linear_apply(x, w: LinearWeights):
    y = jnp.matmul(x, w.weight.astype(x.dtype).T,
                   preferred_element_type=jnp.float32)
    if w.bias is not None:
        y = y + w.bias.astype(y.dtype)
    return y.astype(x.dtype)
