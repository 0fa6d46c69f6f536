"""Attention dispatch: Pallas flash attention (TPU) or XLA einsum.

The reference gates CUDA flash-attn 2 behind ``--flash_attn``
(modeling_bitllama.py:588-780, llama_patch.py:98-207); the TPU-native
equivalent is the Pallas flash-attention kernel from
``jax.experimental.pallas.ops.tpu``.  Used for full-sequence (training/
prefill) causal attention without padding; decode and padded paths use the
masked einsum in ``model.bitllama._attention``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flash_attention_available() -> bool:
    return jax.default_backend() == "tpu"


def flash_causal_attention(q, k, v, *, num_kv_groups: int):
    """Causal attention via the Pallas flash kernel.

    q [B, S, nh, hd]; k/v [B, S, nkv, hd] → [B, S, nh, hd].
    GQA handled by repeating k/v heads (LLaMA-1/2 7B/13B have nkv == nh,
    so the repeat only triggers for GQA configs).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    if num_kv_groups > 1:
        k = jnp.repeat(k, num_kv_groups, axis=2)
        v = jnp.repeat(v, num_kv_groups, axis=2)
    # kernel layout is [B, H, S, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = flash_attention(qt, kt, vt, causal=True,
                          sm_scale=1.0 / (q.shape[-1] ** 0.5))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
