"""Checkpoint writers: native sharded format + reference-compatible export.

* ``save_native`` / ``load_native``: the framework's own format — one
  ``.npz`` per pytree (packed planes stored as int32 bitplane words) plus
  ``config.json``.  Simple, mmap-friendly, and loadable under pjit (arrays
  are device_put by the caller with the mesh shardings).
* ``export_reference_int8``: writes an HF-layout state dict (safetensors)
  in the reference's BitLinearInf int8 byte format
  (scripts/convert_llama_to_infer_ckpt.py:7-15) so checkpoints round-trip
  back to the reference implementation bit-exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from onebit_tpu.core.packing import (
    pack_signs_int8_np,
    unpack_signs_device,
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


def _flatten(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat = {}
    for key in ("embed_tokens", "lm_head", "final_norm"):
        flat[key] = np.asarray(params[key])
    for name, val in params["layers"].items():
        if isinstance(val, (BitLinearWeights, LinearWeights)):
            for field, arr in val._asdict().items():
                if arr is not None:
                    flat[f"layers.{name}.{field}"] = np.asarray(arr)
        else:
            flat[f"layers.{name}"] = np.asarray(val)
    return flat


def save_native(path: str, config: BitLlamaConfig,
                params: Dict[str, Any]) -> None:
    os.makedirs(path, exist_ok=True)
    config.save_json(os.path.join(path, "config.json"))
    np.savez(os.path.join(path, "params.npz"), **_flatten(params))


def load_native(path: str):
    config = BitLlamaConfig.from_json(os.path.join(path, "config.json"))
    data = np.load(os.path.join(path, "params.npz"))
    params: Dict[str, Any] = {"layers": {}}
    fields: Dict[str, Dict[str, np.ndarray]] = {}
    for key in data.files:
        if not key.startswith("layers."):
            params[key] = jnp.asarray(data[key])
            continue
        rest = key[len("layers."):]
        if "." in rest:
            name, field = rest.split(".", 1)
            fields.setdefault(name, {})[field] = data[key]
        else:
            params["layers"][rest] = jnp.asarray(data[key])
    for name, fd in fields.items():
        fd = {k: jnp.asarray(v) for k, v in fd.items()}
        if "weight_scale" in fd:
            params["layers"][name] = BitLinearWeights(**fd)
        else:
            params["layers"][name] = LinearWeights(**fd)
    return {"config": config, "params": params}


def export_reference_int8(path: str, config: BitLlamaConfig,
                          params: Dict[str, Any],
                          value_dtype=np.float32) -> None:
    """Write the packed model as a reference-format BitLinearInf ckpt."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    config.save_json(os.path.join(path, "config.json"))
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed_tokens"],
                                                value_dtype),
        "lm_head.weight": np.asarray(params["lm_head"], value_dtype),
        "model.norm.weight": np.asarray(params["final_norm"], value_dtype),
    }
    L = config.num_hidden_layers
    for i in range(L):
        pre = f"model.layers.{i}"
        out[f"{pre}.input_layernorm.weight"] = np.asarray(
            params["layers"]["input_layernorm"][i], value_dtype)
        out[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            params["layers"]["post_attention_layernorm"][i], value_dtype)
        for name in PROJ_NAMES:
            w: BitLinearWeights = params["layers"][name]
            key = f"{pre}.{_PROJ_PARENT[name]}.{name}"
            if w.packed is not None:
                dense = np.asarray(
                    unpack_signs_device(w.packed[i], dtype=jnp.float32))
            else:
                dense = np.sign(np.asarray(
                    w.latent if w.latent is not None else w.dense_sign)[i])
            out[f"{key}.weight"] = pack_signs_int8_np(dense)
            out[f"{key}.weight_scale"] = np.asarray(w.weight_scale[i],
                                                    value_dtype)
            out[f"{key}.input_factor"] = np.asarray(w.input_factor[i],
                                                    value_dtype)
    save_file(out, os.path.join(path, "model.safetensors"))
