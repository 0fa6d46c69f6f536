"""Quantized (INT8) KV cache — halves decode HBM traffic vs bf16.

BASELINE.json north star: "paged INT8/FP8 KV-cache with scale tracking".
Keys/values are quantized per (position, head) with an absmax scale at
insertion; attention reads dequantize on the fly (int8 loads + one
multiply — decode attention is HBM-bound, so 2x smaller cache ≈ 2x faster
attention reads and 2x more resident sequences).

The reference has no KV quantization (its cache is fp16 torch.cat concat,
modeling_bitllama.py:379-384) — this is post-parity engine work.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from onebit_tpu.model.config import BitLlamaConfig

_EPS = 1e-6


class QuantKVCache(NamedTuple):
    """int8 values + per-(position, head) scales, layers stacked on axis 0."""
    k_q: jax.Array   # [L, B, T, n_kv, head_dim] int8
    k_s: jax.Array   # [L, B, T, n_kv] f32
    v_q: jax.Array   # [L, B, T, n_kv, head_dim] int8
    v_s: jax.Array   # [L, B, T, n_kv] f32

    @property
    def max_len(self) -> int:
        return self.k_q.shape[2]


def init_quant_kv_cache(config: BitLlamaConfig, batch: int,
                        max_len: int) -> QuantKVCache:
    shape = (config.num_hidden_layers, batch, max_len,
             config.num_key_value_heads, config.head_dim)
    sshape = shape[:-1]
    return QuantKVCache(
        k_q=jnp.zeros(shape, jnp.int8), k_s=jnp.zeros(sshape, jnp.float32),
        v_q=jnp.zeros(shape, jnp.int8), v_s=jnp.zeros(sshape, jnp.float32))


def quantize_kv(x) -> Tuple[jax.Array, jax.Array]:
    """[..., head_dim] → (int8 values, scale over the head_dim axis)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q, scale, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)
