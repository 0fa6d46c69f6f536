"""TPU-sharded checkpoint format (orbax-backed).

SURVEY.md §5 (checkpoint row) calls for a TPU-native format: named arrays
restorable **directly onto a device mesh** with TP/FSDP layouts, so a 13B
fp32 latent tree (+optimizer state) never has to materialize on one host —
the reference's HF ``save_pretrained`` directories (and our single-host
``params.npz`` native format, ckpt/writer.py) both assume host-RAM-sized
checkpoints.

Storage layout: ``<path>/config.json`` (HF-compatible, same as the native
format), ``<path>/metadata.json`` (format marker), ``<path>/state/``
(orbax OCDBT tree).  Param trees are stored as plain nested dicts — the
``BitLinearWeights`` / ``LinearWeights`` / ``FusedBitLinearWeights``
wrappers (kernels/bitlinear.py) are unwrapped on save and re-inferred from
field names on load, so restore needs no custom pytree registry.

``load_sharded(path, mesh=...)`` builds the abstract tree from orbax
metadata and restores each shard straight to its device placement
(parallel/sharding.param_specs TP layout) — no full-tree host copy.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from onebit_tpu.kernels.bitlinear import (BitLinearWeights,
                                          FusedBitLinearWeights)
from onebit_tpu.kernels.linear import LinearWeights
from onebit_tpu.model.config import BitLlamaConfig

_WRAPPERS = (BitLinearWeights, LinearWeights, FusedBitLinearWeights)


def _to_plain(tree):
    """NamedTuple wrappers → dicts of their non-None fields (recursive)."""
    if isinstance(tree, _WRAPPERS):
        return {k: _to_plain(v) for k, v in tree._asdict().items()
                if v is not None}
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def _rewrap(tree):
    """Invert :func:`_to_plain`, inferring the wrapper from field names."""
    if isinstance(tree, dict):
        keys = set(tree)
        sub = {k: _rewrap(v) for k, v in tree.items()}
        if {"weight_scale", "input_factor"} <= keys:
            if keys <= set(FusedBitLinearWeights._fields) and \
                    sub["input_factor"].ndim >= 3:   # [L, ns, K] fused
                return FusedBitLinearWeights(**sub)
            return BitLinearWeights(**sub)
        if keys <= set(LinearWeights._fields) and "weight" in keys:
            return LinearWeights(**sub)
        return sub
    return tree


def _config_dict(config: BitLlamaConfig) -> Dict[str, Any]:
    return dataclasses.asdict(config)


def save_sharded(path: str, config: BitLlamaConfig, params: Dict[str, Any],
                 *, force: bool = True) -> None:
    """Write a sharded checkpoint.  ``params`` may live on any mesh (or the
    host); each process writes only the shards it owns (orbax contract), so
    this is the multi-host-safe save."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_config_dict(config), f, indent=1)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump({"format": "onebit-sharded", "version": 1}, f)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), _to_plain(params),
                   force=force)


def is_sharded_ckpt(path: str) -> bool:
    meta = os.path.join(path, "metadata.json")
    if not os.path.exists(meta):
        return False
    with open(meta) as f:
        return json.load(f).get("format") == "onebit-sharded"


def load_sharded(path: str, *, mesh=None,
                 dtype_override: Optional[Any] = None) -> Dict[str, Any]:
    """Load a sharded checkpoint → ``{"config", "params"}``.

    With ``mesh``: the abstract tree is built from checkpoint metadata and
    each array is restored DIRECTLY to its TP placement
    (parallel/sharding.param_specs) — peak host memory is one shard, not
    the tree.  Without ``mesh``: restored replicated/host-local.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        config = BitLlamaConfig(**json.load(f))
    state_dir = os.path.join(path, "state")

    with ocp.StandardCheckpointer() as ckptr:
        if mesh is None:
            plain = ckptr.restore(state_dir)
        else:
            from jax.sharding import NamedSharding

            from onebit_tpu.parallel.sharding import param_specs

            meta = ckptr.metadata(state_dir).item_metadata.tree
            abstract = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta)
            specs = _to_plain(param_specs(_rewrap(abstract)))
            sharded_abs = jax.tree.map(
                lambda a, s: jax.ShapeDtypeStruct(
                    a.shape,
                    dtype_override if (dtype_override is not None
                                       and np.issubdtype(a.dtype,
                                                         np.floating))
                    else a.dtype,
                    sharding=NamedSharding(mesh, s)),
                abstract, specs)
            plain = ckptr.restore(state_dir, sharded_abs)
    return {"config": config, "params": _rewrap(plain)}
