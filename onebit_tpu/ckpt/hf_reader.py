"""Readers for the reference's HF-format checkpoints (bit-exact).

The reference produces three checkpoint kinds (SURVEY.md §5), all HF
``save_pretrained`` directories (config.json + pytorch_model*.bin or
*.safetensors):

1. **start ckpt** — BitLinear latent weights ``sign(W)*0.01`` + SVID value
   vectors (scripts/build_start_ckpt.py:25-37);
2. **train ckpt** — same tensor layout after KD training;
3. **inference ckpt** — BitLinearInf int8-packed weights ``[out, in//8]``
   (scripts/convert_llama_to_infer_ckpt.py:26-37) plus fp value vectors.

Plus the plain FP16 LLaMA teacher.  All load into our functional pytree
layout with layers stacked on axis 0; int8 sign bytes are converted exactly
to the TPU bitplane layout (a pure bit permutation).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from onebit_tpu.core.packing import (
    pack_signs_device,
    unpack_signs_int8_np,
)
from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.kernels.linear import LinearWeights
from onebit_tpu.model.bitllama import PROJ_NAMES
from onebit_tpu.model.config import BitLlamaConfig

_PROJ_PARENT = {
    "q_proj": "self_attn", "k_proj": "self_attn", "v_proj": "self_attn",
    "o_proj": "self_attn",
    "gate_proj": "mlp", "up_proj": "mlp", "down_proj": "mlp",
}


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors of an HF checkpoint dir into numpy (CPU)."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            tensors.update(load_file(f))
    elif bin_files:
        import torch
        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for k, v in sd.items():
                tensors[k] = v.numpy() if v.dtype != torch.bfloat16 \
                    else v.float().numpy()
    else:
        raise FileNotFoundError(f"no safetensors/bin files under {path}")
    return tensors


def detect_ckpt_kind(tensors: Dict[str, np.ndarray]) -> str:
    """'packed' | 'latent' | 'llama' from tensor inventory/dtypes."""
    qw = "model.layers.0.self_attn.q_proj.weight"
    has_scales = "model.layers.0.self_attn.q_proj.weight_scale" in tensors
    if not has_scales:
        return "llama"
    if tensors[qw].dtype == np.int8:
        return "packed"
    return "latent"


def _stack(tensors: Dict[str, np.ndarray], fmt: str, n_layers: int,
           cast=np.float32) -> np.ndarray:
    return np.stack([np.asarray(tensors[fmt.format(i)]).astype(cast)
                     for i in range(n_layers)])


def load_reference_checkpoint(path: str,
                              config: Optional[BitLlamaConfig] = None,
                              dtype=jnp.float32) -> Dict[str, Any]:
    """Load any reference checkpoint dir → (config, params pytree).

    Packed (int8) weights are re-packed bit-exactly into the TPU bitplane
    layout; latent/llama weights load as fp arrays.
    """
    if config is None:
        config = BitLlamaConfig.from_json(path)
    tensors = load_hf_state_dict(path)
    kind = detect_ckpt_kind(tensors)
    L = config.num_hidden_layers

    params: Dict[str, Any] = {
        "embed_tokens": jnp.asarray(
            np.asarray(tensors["model.embed_tokens.weight"]), dtype),
        "lm_head": jnp.asarray(np.asarray(tensors["lm_head.weight"]), dtype),
        "final_norm": jnp.asarray(np.asarray(tensors["model.norm.weight"]),
                                  dtype),
        "layers": {
            "input_layernorm": jnp.asarray(_stack(
                tensors, "model.layers.{}.input_layernorm.weight", L), dtype),
            "post_attention_layernorm": jnp.asarray(_stack(
                tensors, "model.layers.{}.post_attention_layernorm.weight",
                L), dtype),
        },
    }

    for name in PROJ_NAMES:
        parent = _PROJ_PARENT[name]
        fmt = f"model.layers.{{}}.{parent}.{name}"
        if kind == "llama":
            w = jnp.asarray(_stack(tensors, fmt + ".weight", L), dtype)
            params["layers"][name] = LinearWeights(weight=w)
            continue
        h = jnp.asarray(_stack(tensors, fmt + ".weight_scale", L), jnp.float32)
        g = jnp.asarray(_stack(tensors, fmt + ".input_factor", L), jnp.float32)
        if kind == "packed":
            # int8 bytes [out, in//8] → dense ±1 → device words (exact)
            stacked = np.stack([
                np.asarray(tensors[fmt.format(i) + ".weight"])
                for i in range(L)])
            dense = unpack_signs_int8_np(stacked, dtype=np.float32)
            packed = jnp.asarray(pack_signs_device(dense))
            params["layers"][name] = BitLinearWeights(
                weight_scale=h, input_factor=g, packed=packed)
        else:  # latent
            w = jnp.asarray(_stack(tensors, fmt + ".weight", L), dtype)
            params["layers"][name] = BitLinearWeights(
                weight_scale=h, input_factor=g, latent=w)
    return {"config": config, "params": params, "kind": kind}
