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


class QuantKVCacheKT(NamedTuple):
    """INT8 cache with K stored TRANSPOSED for the fused decode kernel.

    ``kernels.kv_attention._kernel_kt`` wants every MXU dot in the
    bf16-LHS × s8-RHS standard orientation: scores = q [g, hd] · K [hd, T]
    needs K head-major with T last.  Storing K that way (instead of
    transposing per step) makes the one-token decode write a strided
    column write — cheap — and the attention read layout-free.  V keeps
    the row-major layout (the PV dot contracts T, already standard).
    """
    k_qt: jax.Array  # [L, B, n_kv, head_dim, T] int8
    k_st: jax.Array  # [L, B, n_kv, T] f32
    v_q: jax.Array   # [L, B, T, n_kv, head_dim] int8
    v_s: jax.Array   # [L, B, T, n_kv] f32

    @property
    def max_len(self) -> int:
        return self.k_qt.shape[4]


def init_quant_kv_cache_kt(config: BitLlamaConfig, batch: int,
                           max_len: int) -> QuantKVCacheKT:
    nkv, hd = config.num_key_value_heads, config.head_dim
    L = config.num_hidden_layers
    return QuantKVCacheKT(
        k_qt=jnp.zeros((L, batch, nkv, hd, max_len), jnp.int8),
        k_st=jnp.zeros((L, batch, nkv, max_len), jnp.float32),
        v_q=jnp.zeros((L, batch, max_len, nkv, hd), jnp.int8),
        v_s=jnp.zeros((L, batch, max_len, nkv), jnp.float32))


def kt_from_quant(cache: QuantKVCache) -> QuantKVCacheKT:
    """Relayout a row-major quant cache into the transposed-K form."""
    return QuantKVCacheKT(
        k_qt=jnp.moveaxis(cache.k_q, 2, 4),
        k_st=jnp.moveaxis(cache.k_s, 2, 3),
        v_q=cache.v_q, v_s=cache.v_s)


def quant_from_kt(cache: QuantKVCacheKT) -> QuantKVCache:
    """Inverse of :func:`kt_from_quant` (tests / inspection)."""
    return QuantKVCache(
        k_q=jnp.moveaxis(cache.k_qt, 4, 2),
        k_s=jnp.moveaxis(cache.k_st, 3, 2),
        v_q=cache.v_q, v_s=cache.v_s)


def quantize_kv(x) -> Tuple[jax.Array, jax.Array]:
    """[..., head_dim] → (int8 values, scale over the head_dim axis)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q, scale, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)
