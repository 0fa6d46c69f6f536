"""Partition specs for BitLlama parameter pytrees.

Tensor-parallel layout (SURVEY.md §2.2): every BitLinear shards its
**out-feature** axis over ``model`` — sign planes (latent ``[L,out,in]`` or
K-major packed ``[L,in//32,out]``) and the ``weight_scale`` vector ``[L,out]`` —
while ``input_factor`` follows the *in* axis (replicated except where the in
axis itself is the sharded intermediate).  Vocab (embed/lm_head) shards over
``model`` as well.  GSPMD inserts the cross-shard collectives (including the
LayerNorm mean/var reductions inside BitLinear) automatically.

ZeRO-3-equivalence: the big 2D weight planes ALSO shard their remaining
feature axis over ``data`` (when divisible) — the fully-sharded layout of
DeepSpeed ZeRO-3, which shards over every rank, not just the model axis
(reference scripts/ds_config.json shards params over all 8/16 ranks).
GSPMD all-gathers a layer's shards at use and reduce-scatters its grads —
the same allgather/reduce-scatter schedule ZeRO-3 runs.  Measured on the
--dry-compile memory validator (parallel/memplan.py): model-axis-only
sharding of a 7B KD step on a (4, 2) mesh peaks at ~91 GiB/chip (the fp32
latents + Adam moments divide by 2, not 8); the fully-sharded layout fits
a v5e's 16 GiB.  Because params AND optimizer state carry these shardings
under jit, optimizer state is sharded by construction — no separate
"stage 3" machinery.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onebit_tpu.kernels.bitlinear import BitLinearWeights
from onebit_tpu.kernels.linear import LinearWeights
from onebit_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# projections whose *in* axis is the (model-sharded) intermediate dim
_IN_IS_INTERMEDIATE = {"down_proj"}


def _bitlinear_spec(name: str) -> BitLinearWeights:
    in_spec = P(None, MODEL_AXIS) if name in _IN_IS_INTERMEDIATE else P(None, None)
    # planes [L, out, in]: out over model (TP), in over data (ZeRO-3 full
    # sharding) — _shardable() downgrades the data axis when not divisible
    plane = P(None, MODEL_AXIS, DATA_AXIS)
    return BitLinearWeights(
        weight_scale=P(None, MODEL_AXIS),
        input_factor=in_spec,
        latent=plane, dense_sign=plane,
        # K-major device layout [L, in//32, out]: out is the last axis
        packed=P(None, DATA_AXIS, MODEL_AXIS),
        bias=P(None, MODEL_AXIS),
    )


def _shardable(spec: P, shape, mesh_shape: Dict[str, int]) -> P:
    """Drop spec axes the array cannot evenly divide (tiny test configs,
    odd vocab sizes) — correctness never depends on a sharding."""
    if spec is None:
        return spec
    fixed = []
    for dim, names in zip(shape, tuple(spec) + (None,) * len(shape)):
        if names is None:
            fixed.append(None)
            continue
        group = names if isinstance(names, tuple) else (names,)
        need = int(np.prod([mesh_shape.get(a, 1) for a in group]))
        fixed.append(names if need and dim % need == 0 else None)
    return P(*fixed)


def param_specs(params: Dict[str, Any],
                mesh: Mesh = None) -> Dict[str, Any]:
    """PartitionSpec pytree matching a BitLlama param pytree.

    With ``mesh`` given, specs are validated against leaf shapes and any
    non-divisible axis is dropped (replicated) per leaf."""
    layer_specs: Dict[str, Any] = {}
    for name, val in params["layers"].items():
        if isinstance(val, BitLinearWeights):
            full = _bitlinear_spec(name)
            # keep only the fields that exist in this param tree
            layer_specs[name] = BitLinearWeights(*[
                s if v is not None else None for s, v in zip(full, val)])
        elif isinstance(val, LinearWeights):  # teacher: shard out-features
            layer_specs[name] = LinearWeights(
                weight=P(None, MODEL_AXIS, DATA_AXIS),
                bias=P(None, MODEL_AXIS) if val.bias is not None else None)
        else:  # layernorm weights [L, D]
            layer_specs[name] = P(None, None)
    specs = {
        "embed_tokens": P(MODEL_AXIS, DATA_AXIS),
        "lm_head": P(MODEL_AXIS, DATA_AXIS),
        "final_norm": P(None),
        "layers": layer_specs,
    }
    if mesh is not None:
        mesh_shape = dict(mesh.shape)
        specs = jax.tree.map(
            lambda p, s: None if p is None
            else _shardable(s, p.shape, mesh_shape),
            params, specs, is_leaf=lambda x: x is None)
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param pytree onto the mesh with fully-sharded TP specs."""
    specs = param_specs(params, mesh)
    # None fields are empty pytree nodes in both trees, so structures match.
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def batch_spec() -> P:
    return P(DATA_AXIS)
