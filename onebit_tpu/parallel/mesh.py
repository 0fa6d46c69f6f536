"""Device mesh construction and named axes.

TPU-native replacement for the reference's process-centric parallelism
(deepspeed launcher + NCCL process groups, scripts/llama_7b.sh:26,
scripts/ds_config.json).  One jit'd program runs SPMD over a
``jax.sharding.Mesh`` with axes:

* ``data``  — batch (DP); gradients reduced by GSPMD (ZeRO-style sharded
  optimizer states come from sharding params/opt-state over ``model`` too).
* ``model`` — tensor parallel: BitLinear out-features, value vectors, and
  vocab are sharded here (SURVEY.md §2.2 TP row).

Multi-host: the same axes span hosts; ``initialize_distributed`` wires
``jax.distributed`` so ICI carries ``model`` and DCN carries ``data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """Create a ``(data, model)`` mesh.

    ``shape``: (data, model) sizes; defaults to all devices on ``data``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the reference's `--hostfile` equivalent)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))
