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


# ---------------------------------------------------------------------------
# INT4 (nibble-packed) cache — halves KV HBM bytes again vs int8.
#
# Packing is the HALF-PLANE scheme along the sequence axis: byte column c
# holds column c in the LOW nibble and column c + T/2 in the HIGH nibble.
# A contiguous packed tile therefore unpacks to two CONTIGUOUS column
# groups (cols [off, off+blk) and [T/2+off, T/2+off+blk)) — no
# lane-interleaving relayout, which Mosaic cannot do cheaply on int8.
# Scales stay fp32 at full T resolution in the SAME layout as the int8
# cache (the kernel fetches the two plane tiles via two offset BlockSpecs).
# ---------------------------------------------------------------------------


class QuantKVCacheKT4(NamedTuple):
    """INT4 cache, K transposed, both pools nibble-packed along T.

    ``k_qp [L, B, n_kv, head_dim, T//2]`` int8 (two int4 columns per byte,
    half-plane); ``v_qp [L, B, T//2, n_kv, head_dim]`` int8 likewise;
    scales identical to :class:`QuantKVCacheKT` (full T resolution).
    """
    k_qp: jax.Array  # [L, B, n_kv, head_dim, T//2] int8 (2x int4)
    k_st: jax.Array  # [L, B, n_kv, T] f32
    v_qp: jax.Array  # [L, B, T//2, n_kv, head_dim] int8 (2x int4)
    v_s: jax.Array   # [L, B, T, n_kv] f32

    @property
    def max_len(self) -> int:
        return self.k_st.shape[3]


def init_quant_kv_cache_kt4(config: BitLlamaConfig, batch: int,
                            max_len: int) -> QuantKVCacheKT4:
    if max_len % 2:
        raise ValueError(f"int4 cache needs even max_len, got {max_len}")
    nkv, hd = config.num_key_value_heads, config.head_dim
    L = config.num_hidden_layers
    return QuantKVCacheKT4(
        k_qp=jnp.zeros((L, batch, nkv, hd, max_len // 2), jnp.int8),
        k_st=jnp.zeros((L, batch, nkv, max_len), jnp.float32),
        v_qp=jnp.zeros((L, batch, max_len // 2, nkv, hd), jnp.int8),
        v_s=jnp.zeros((L, batch, max_len, nkv), jnp.float32))


def quantize_kv4(x) -> Tuple[jax.Array, jax.Array]:
    """[..., head_dim] → (int4-valued int8 in [-7, 7], scale = absmax/7)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, _EPS) / 7.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -7, 7).astype(jnp.int8)
    return q, scale


def pack_int4_halfplane(q, axis: int) -> jax.Array:
    """Pack int4-valued int8 (in [-8, 7]) two-per-byte along ``axis``.

    Byte c = (q[c] & 0xF) | (q[c + n//2] << 4) — column c in the low
    nibble, column c + n//2 in the high nibble (half-plane layout).
    """
    n = q.shape[axis]
    if n % 2:
        raise ValueError(f"axis {axis} length {n} not even")
    q32 = q.astype(jnp.int32)
    lo = jax.lax.slice_in_dim(q32, 0, n // 2, axis=axis)
    hi = jax.lax.slice_in_dim(q32, n // 2, n, axis=axis)
    return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.int8)


def unpack_int4_halfplane(p, axis: int) -> jax.Array:
    """Inverse of :func:`pack_int4_halfplane` → int8 in [-8, 7]."""
    p32 = p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)  # sign-extended byte: arithmetic >>4
    return jnp.concatenate([lo, hi], axis=axis).astype(jnp.int8)


def kt4_from_kt(cache: QuantKVCacheKT, lengths=None) -> QuantKVCacheKT4:
    """Requantize an int8 KT cache's contents into the packed int4 form.

    int8 → int4 direct requant (q4 = round(q8 * 7/127), scale *= 127/7)
    loses nothing beyond int4's own resolution; used for tests and
    cache-migration paths.
    """
    def req(q8, s8):
        q4 = jnp.clip(jnp.round(q8.astype(jnp.float32) * (7.0 / 127.0)),
                      -7, 7).astype(jnp.int8)
        return q4, s8 * (127.0 / 7.0)

    k4, k_st = req(cache.k_qt, cache.k_st)
    v4, v_s = req(cache.v_q, cache.v_s)
    return QuantKVCacheKT4(
        k_qp=pack_int4_halfplane(k4, axis=4), k_st=k_st,
        v_qp=pack_int4_halfplane(v4, axis=2), v_s=v_s)
