"""Build the KD start checkpoint from a full-precision teacher (SVID init).

Reference (scripts/build_start_ckpt.py): loads FP16 LLaMA into the BitLlama
skeleton, then for each of the 7 projections per layer runs rank-1 NMF of
|W| on CPU sequentially — 224 fits for 7B, 280 for 13B, "minutes-hours"
(SURVEY.md §3.2).  TPU-native: the rank-1 factorization is power iteration
``vmap``-ed over the stacked layer axis, one fused device program per
projection family — seconds, not hours.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from onebit_tpu.core.svid import LATENT_SIGN_SCALE, rank1_nmf, rank1_power
from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.kernels.linear import LinearWeights
from onebit_tpu.model.bitllama import PROJ_NAMES


def build_start_params(teacher_params: Dict[str, Any], *,
                       method: str = "power",
                       num_iters: int = 50) -> Dict[str, Any]:
    """plain-LLaMA param tree → BitLlama latent start params.

    Per projection (reference build_start_ckpt.py:25-34):
      input_factor ← g, weight_scale ← h with |W| ≈ h·gᵀ,
      latent weight ← sign(W)·0.01.
    Embeddings, lm_head and norms pass through unchanged.
    """
    rank1 = rank1_power if method == "power" else rank1_nmf

    def one_layer(w):
        h, g = rank1(jnp.abs(w.astype(jnp.float32)), num_iters=num_iters)
        latent = jnp.sign(w).astype(jnp.float32) * LATENT_SIGN_SCALE
        return latent, h, g

    out = dict(teacher_params)
    layers = dict(teacher_params["layers"])
    for name in PROJ_NAMES:
        lw = layers[name]
        w = lw.weight if isinstance(lw, LinearWeights) else lw.latent
        latent, h, g = jax.jit(jax.vmap(one_layer))(w)
        layers[name] = BitLinearWeights(weight_scale=h, input_factor=g,
                                        latent=latent)
    out["layers"] = layers
    return out
