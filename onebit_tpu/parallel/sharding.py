"""Partition specs for BitLlama parameter pytrees.

Tensor-parallel layout (SURVEY.md §2.2): every BitLinear shards its
**out-feature** axis over ``model`` — sign planes (latent ``[L,out,in]`` or
K-major packed ``[L,in//32,out]``) and the ``weight_scale`` vector ``[L,out]`` —
while ``input_factor`` follows the *in* axis (replicated except where the in
axis itself is the sharded intermediate).  Vocab (embed/lm_head) shards over
``model`` as well.  GSPMD inserts the cross-shard collectives (including the
LayerNorm mean/var reductions inside BitLinear) automatically.

ZeRO-3-equivalence: because params AND optimizer state carry these shardings
under jit, optimizer state is sharded by construction — no separate "stage 3"
machinery (reference scripts/ds_config.json).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.kernels.linear import LinearWeights
from onebit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# projections whose *in* axis is the (model-sharded) intermediate dim
_IN_IS_INTERMEDIATE = {"down_proj"}


def _bitlinear_spec(name: str) -> BitLinearWeights:
    in_spec = P(None, MODEL_AXIS) if name in _IN_IS_INTERMEDIATE else P(None, None)
    plane = P(None, MODEL_AXIS, None)
    return BitLinearWeights(
        weight_scale=P(None, MODEL_AXIS),
        input_factor=in_spec,
        latent=plane, dense_sign=plane,
        # K-major device layout [L, in//32, out]: out is the last axis
        packed=P(None, None, MODEL_AXIS),
        bias=P(None, MODEL_AXIS),
    )


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a BitLlama param pytree."""
    layer_specs: Dict[str, Any] = {}
    for name, val in params["layers"].items():
        if isinstance(val, BitLinearWeights):
            full = _bitlinear_spec(name)
            # keep only the fields that exist in this param tree
            layer_specs[name] = BitLinearWeights(*[
                s if v is not None else None for s, v in zip(full, val)])
        elif isinstance(val, LinearWeights):  # teacher: shard out-features
            layer_specs[name] = LinearWeights(
                weight=P(None, MODEL_AXIS, None),
                bias=P(None, MODEL_AXIS) if val.bias is not None else None)
        else:  # layernorm weights [L, D]
            layer_specs[name] = P(None, None)
    return {
        "embed_tokens": P(MODEL_AXIS, None),
        "lm_head": P(MODEL_AXIS, None),
        "final_norm": P(None),
        "layers": layer_specs,
    }


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param pytree onto the mesh with TP shardings."""
    specs = param_specs(params)
    # None fields are empty pytree nodes in both trees, so structures match.
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def batch_spec() -> P:
    return P(DATA_AXIS)
