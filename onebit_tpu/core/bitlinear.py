"""Reference OneBit linear math, pure jnp.

The OneBit quantized linear is (reference
transformers/src/transformers/models/bitnet.py:58-68):

    y = LayerNorm_noaffine( ((x ⊙ g) · sign(W)ᵀ) ⊙ h ) (+ bias)

with ``g = input_factor ∈ R^in``, ``h = weight_scale ∈ R^out`` and LayerNorm
over the out-feature axis with ``elementwise_affine=False`` (torch default
``eps=1e-5``).  During QAT the latent full-precision ``W`` is kept and
``sign`` passes gradients via a soft-sign straight-through estimator
(bitnet.py:14-24): backward multiplies by ``1.001 - tanh(W)²``.

This module is the *bit-exactness anchor*: the Pallas kernels in
``onebit_tpu.kernels`` are golden-tested against these functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch.nn.LayerNorm default, reference bitnet.py:47
STE_SLOPE_OFFSET = 1.001  # reference bitnet.py:23


@jax.custom_vjp
def sign_ste(w):
    """sign() with the reference's soft-sign straight-through estimator."""
    return jnp.sign(w)


def _sign_ste_fwd(w):
    return jnp.sign(w), w


def _sign_ste_bwd(w, g):
    return (g * (STE_SLOPE_OFFSET - jnp.tanh(w) ** 2),)


sign_ste.defvjp(_sign_ste_fwd, _sign_ste_bwd)


def layernorm_noaffine(x, eps: float = LN_EPS, axis: int = -1):
    """LayerNorm without learnable affine, biased variance (torch semantics).

    Statistics in fp32 regardless of input dtype, cast back on exit.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axis, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


def bitlinear_fwd(x, sign_w, g, h, bias=None, *, eps: float = LN_EPS,
                  accum_dtype=jnp.float32):
    """OneBit linear forward on a dense ±1 sign matrix.

    Args:
      x: activations ``[..., in]``.
      sign_w: dense ±1 matrix ``[out, in]`` (any float dtype).
      g: input_factor ``[in]``.
      h: weight_scale ``[out]``.
      bias: optional ``[out]``.
    Returns activations ``[..., out]`` in ``x.dtype``.
    """
    dtype = x.dtype
    y = (x * g.astype(dtype)).astype(dtype)
    z = jnp.matmul(y, sign_w.astype(dtype).T, preferred_element_type=accum_dtype)
    z = z * h.astype(accum_dtype)
    z = layernorm_noaffine(z, eps)
    if bias is not None:
        z = z + bias.astype(z.dtype)
    return z.astype(dtype)


def bitlinear_train_fwd(x, latent_w, g, h, bias=None, *, eps: float = LN_EPS):
    """QAT forward: latent fp weight → sign via STE → bitlinear math."""
    return bitlinear_fwd(x, sign_ste(latent_w), g, h, bias, eps=eps)
