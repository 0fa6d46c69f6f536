"""S²-Attn (shift short attention) — the teacher-side long-context patch.

Reference ``LlamaShiftShortAttention`` (llama_factory/llamafactory/
llama_patch.py:19-97, applied to the *teacher* when ``--shift_attn`` is
set, core.py:484-496): sequences are split into groups of
``shift_group_size``; half the heads are rolled by ``group//2`` positions
so information flows across group boundaries, attention runs blockwise
within groups, and the shifted half is rolled back.

Functional TPU version: the groupwise attention is a reshaped batched
attention (no custom kernel needed — block-diagonal structure maps to a
batch dimension, which XLA tiles onto the MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shift_short_attention(q, k, v, *, group_size: int,
                          num_kv_groups: int = 1):
    """q [B,S,nh,hd], k/v [B,S,nkv,hd] (post-RoPE) → [B,S,nh,hd].

    Requires ``S % group_size == 0``.  Causal within each group; the second
    half of the heads attends on a ``group_size//2``-shifted view.
    """
    b, s, nh, hd = q.shape
    if s % group_size:
        raise ValueError(f"seq {s} not divisible by group {group_size}")
    if num_kv_groups > 1:
        k = jnp.repeat(k, num_kv_groups, axis=2)
        v = jnp.repeat(v, num_kv_groups, axis=2)
    half = nh // 2
    shift = group_size // 2

    def roll_heads(x, amount):
        lo, hi = x[:, :, :half], x[:, :, half:]
        return jnp.concatenate([lo, jnp.roll(hi, amount, axis=1)], axis=2)

    q, k, v = (roll_heads(x, -shift) for x in (q, k, v))

    g = s // group_size
    # block-diagonal attention == batched attention over groups
    def to_groups(x):
        return x.reshape(b, g, group_size, nh, hd).reshape(
            b * g, group_size, nh, hd)

    qg, kg, vg = map(to_groups, (q, k, v))
    scores = jnp.einsum("bsnh,btnh->bnst", qg, kg,
                        preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5)
    causal = jnp.tril(jnp.ones((group_size, group_size), bool))
    scores = jnp.where(causal[None, None], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(vg.dtype)
    ctx = jnp.einsum("bnst,btnh->bsnh", probs, vg)
    ctx = ctx.reshape(b, g, group_size, nh, hd).reshape(b, s, nh, hd)
    return roll_heads(ctx, shift)
