"""BitLinear op: implementation dispatch (XLA reference vs fused Pallas).

The three weight modes mirror the reference's two module flavours plus the
QAT latent form:

* ``latent``: full-precision latent weight ``[out, in]`` — training (QAT),
  sign taken through the STE (reference ``BitLinear``, bitnet.py:31-68).
* ``dense_sign``: materialized ±1 matrix — debug/eval.
* ``packed``: int32 sign words ``[in//32, out]`` K-major device layout — inference (reference
  ``BitLinearInf``, bitnet.py:71-122, which unpacks the whole matrix every
  forward; the Pallas path instead streams packed words from HBM and unpacks
  tiles in VMEM on the fly).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from onebit_tpu.core.bitlinear import (
    LN_EPS,
    bitlinear_fwd,
    layernorm_noaffine,
    sign_ste,
)
from onebit_tpu.core.packing import unpack_signs_device


class BitLinearWeights(NamedTuple):
    """Parameters of one BitLinear projection.

    Exactly one of ``latent``/``dense_sign``/``packed`` is set.
    """
    weight_scale: jax.Array            # h, [out]
    input_factor: jax.Array            # g, [in]
    latent: Optional[jax.Array] = None       # [out, in] fp
    dense_sign: Optional[jax.Array] = None   # [out, in] ±1
    packed: Optional[jax.Array] = None       # [in//32, out] int32, K-major
    #   bitplane device layout (core.packing.pack_signs_device)
    bias: Optional[jax.Array] = None         # [out]

    @property
    def mode(self) -> str:
        if self.latent is not None:
            return "latent"
        if self.packed is not None:
            return "packed"
        if self.dense_sign is not None:
            return "dense_sign"
        raise ValueError("empty BitLinearWeights")


class FusedBitLinearWeights(NamedTuple):
    """ns same-width packed projections sharing one input (qkv / gate+up),
    concatenated along N with each segment zero-padded to ``seg_pad =
    packed.shape[-1] // ns``.  Built by ``model.bitllama.fuse_for_decode``;
    one kernel dispatch computes all segments sharing a single sign-tile
    unpack pass (kernels/bitlinear_pallas.bitlinear_packed_fused)."""
    weight_scale: jax.Array            # [ns*seg_pad], zero on pads
    input_factor: jax.Array            # [ns, in]
    packed: jax.Array                  # [in//32, ns*seg_pad] int32

    @property
    def ns(self) -> int:
        return self.input_factor.shape[-2]


def fused_bitlinear_apply(x, w: FusedBitLinearWeights, n_true: int, *,
                          impl: str = "auto", eps: float = LN_EPS):
    """Apply ns fused projections → list of ns arrays ``[..., n_true]``."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from onebit_tpu.kernels.bitlinear_pallas import bitlinear_packed_fused
        return bitlinear_packed_fused(x, w.packed, w.input_factor,
                                      w.weight_scale, n_true=n_true, eps=eps)
    # XLA fallback: per-segment unpack-then-dot (column slices of the
    # concatenated packed words ARE the per-projection packed arrays)
    ns = w.ns
    seg_pad = w.packed.shape[-1] // ns
    outs = []
    for j in range(ns):
        packed_j = w.packed[..., j * seg_pad:j * seg_pad + n_true]
        sign_w = unpack_signs_device(packed_j, dtype=x.dtype)
        h_j = w.weight_scale[j * seg_pad:j * seg_pad + n_true]
        outs.append(bitlinear_fwd(x, sign_w, w.input_factor[j], h_j, eps=eps))
    return outs


def _pick_layer(tree, layer):
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False),
        tree)


def fused_bitlinear_apply_stacked(x, w: FusedBitLinearWeights, layer,
                                  n_true: int, *, impl: str = "auto",
                                  eps: float = LN_EPS):
    """Apply layer ``layer`` of STACKED fused projections (leaves carry a
    leading ``[L, ...]`` axis) without materializing the layer's weights:
    the Pallas kernel selects the layer block via scalar-prefetch index
    maps.  For scan/fori-over-layers decode bodies."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from onebit_tpu.kernels.bitlinear_pallas import (
            bitlinear_packed_fused_stacked)
        return bitlinear_packed_fused_stacked(
            x, w.packed, w.input_factor, w.weight_scale, layer,
            n_true=n_true, eps=eps)
    return fused_bitlinear_apply(x, _pick_layer(w, layer), n_true,
                                 impl=impl, eps=eps)


def bitlinear_apply_stacked(x, w: BitLinearWeights, layer, *,
                            impl: str = "auto", eps: float = LN_EPS):
    """Apply layer ``layer`` of a STACKED packed BitLinear (leaves carry a
    leading ``[L, ...]`` axis); Pallas path reads the layer's tiles
    directly from the stacked HBM arrays (scalar prefetch)."""
    if impl == "auto":
        impl = "pallas" if (w.mode == "packed" and
                            jax.default_backend() == "tpu") else "xla"
    if impl == "pallas":
        if w.mode != "packed":
            raise ValueError("pallas impl requires packed weights")
        from onebit_tpu.kernels.bitlinear_pallas import (
            bitlinear_packed_pallas_stacked)
        return bitlinear_packed_pallas_stacked(
            x, w.packed, w.input_factor, w.weight_scale, layer,
            bias=w.bias, eps=eps)
    return bitlinear_apply(x, _pick_layer(w, layer), impl=impl, eps=eps)


def bitlinear_apply_stacked_raw(x, w: BitLinearWeights, layer, *,
                                impl: str = "auto"):
    """Layer ``layer`` of a STACKED packed BitLinear WITHOUT LayerNorm —
    fp32 ``((x⊙g)·Sᵀ)⊙h``.  The per-shard projection for tensor-parallel
    flat (fori-over-layers) bodies: LayerNorm runs after the cross-shard
    psum (moment form for column-parallel, activation psum for
    row-parallel — model/tp_decode.py)."""
    if impl == "auto":
        impl = "pallas" if (w.mode == "packed" and
                            jax.default_backend() == "tpu") else "xla"
    if impl == "pallas":
        if w.mode != "packed":
            raise ValueError("pallas impl requires packed weights")
        from onebit_tpu.kernels.bitlinear_pallas import (
            bitlinear_packed_raw_stacked)
        return bitlinear_packed_raw_stacked(
            x, w.packed, w.input_factor, w.weight_scale, layer)
    wl = _pick_layer(w, layer)
    if wl.mode == "latent":
        sign_w = sign_ste(wl.latent).astype(x.dtype)
    elif wl.mode == "dense_sign":
        sign_w = wl.dense_sign.astype(x.dtype)
    else:
        sign_w = unpack_signs_device(wl.packed, dtype=x.dtype)
    z = jnp.matmul(x * wl.input_factor.astype(x.dtype), sign_w.T,
                   preferred_element_type=jnp.float32)
    return z * wl.weight_scale.astype(jnp.float32)


def bitlinear_apply(x, w: BitLinearWeights, *, impl: str = "auto",
                    eps: float = LN_EPS):
    """Apply a BitLinear projection to ``x [..., in]`` → ``[..., out]``.

    impl: "auto" | "xla" | "pallas".  Pallas requires packed weights and a
    TPU backend (interpret mode on CPU is used by tests only).
    """
    mode = w.mode
    if impl == "auto":
        impl = "pallas" if (mode == "packed" and
                            jax.default_backend() == "tpu") else "xla"

    if impl == "pallas":
        if mode != "packed":
            raise ValueError("pallas impl requires packed weights")
        from onebit_tpu.kernels.bitlinear_pallas import bitlinear_packed_pallas
        return bitlinear_packed_pallas(
            x, w.packed, w.input_factor, w.weight_scale, bias=w.bias, eps=eps)

    # ---- XLA path ----
    if mode == "latent":
        sign_w = sign_ste(w.latent)
    elif mode == "dense_sign":
        sign_w = w.dense_sign
    else:  # packed: unpack-then-dot (the reference's strategy, bitnet.py:112-115)
        sign_w = unpack_signs_device(w.packed, dtype=x.dtype)
    return bitlinear_fwd(x, sign_w, w.input_factor, w.weight_scale,
                         bias=w.bias, eps=eps)
