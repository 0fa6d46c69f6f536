"""Rotary position embeddings with linear / dynamic-NTK scaling.

Semantics match the reference rotary classes
(transformers/src/transformers/models/bitllama/modeling_bitllama.py:90-181):

* base: ``inv_freq_i = theta^(-2i/d)``, ``angle = t * inv_freq`` with the
  cos/sin table built from ``cat(freqs, freqs)`` and ``rotate_half`` mixing
  the two halves of the head dim.
* linear scaling (:123-143): positions divided by ``factor``.
* dynamic NTK (:146-165): when ``seq_len > max_position_embeddings`` the
  base theta is rescaled by ``((f·L/L0) - (f-1))^(d/(d-2))``.

Everything here is functional: callers pass positions and get (cos, sin).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float) -> jnp.ndarray:
    i = jnp.arange(0, head_dim, 2, dtype=jnp.float32)
    return 1.0 / (theta ** (i / head_dim))


def rope_cos_sin(positions, head_dim: int, theta: float = 10000.0,
                 rope_scaling: Optional[dict] = None,
                 max_position_embeddings: int = 2048,
                 seq_len: Optional[int] = None,
                 dtype=jnp.float32):
    """cos/sin tables for integer ``positions`` (any shape ``[...]``).

    Returns ``(cos, sin)`` of shape ``positions.shape + (head_dim,)``.
    ``seq_len`` (the total cache length) drives dynamic-NTK rescaling; it
    must be static under jit (pass the KV-cache capacity).
    """
    positions = jnp.asarray(positions).astype(jnp.float32)
    if rope_scaling is not None:
        kind, factor = rope_scaling["type"], float(rope_scaling["factor"])
        if kind == "linear":
            positions = positions / factor
        elif kind == "dynamic":
            sl = seq_len if seq_len is not None else max_position_embeddings
            if sl > max_position_embeddings:
                theta = theta * (
                    (factor * sl / max_position_embeddings) - (factor - 1)
                ) ** (head_dim / (head_dim - 2))
        else:
            raise ValueError(f"unknown rope_scaling type {kind!r}")
    inv_freq = rope_inv_freq(head_dim, theta)
    freqs = positions[..., None] * inv_freq  # [..., head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """Apply rotary embedding to q/k of shape ``[..., seq, heads, head_dim]``.

    ``cos``/``sin`` have shape ``[..., seq, head_dim]`` and broadcast over
    the heads axis.
    """
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
