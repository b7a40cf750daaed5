"""Device mesh construction (the TPU-native runtime the reference lacks —
its only device logic is a cuda/mps/cpu probe, reference train.py:135-140).

Axes:
* ``data``  — graph-partition / batch axis: nodes+edges of the full graph
  (transductive) or PPI graph-batches (inductive) are sharded here; the
  GNN analogue of DP+SP (SURVEY §2.11).
* ``model`` — head axis (the GNN analogue of TP): the ``[H, ...]`` stacked
  head parameters shard here.

Pipeline/expert parallelism have no counterpart in a 2-3 layer GAT and are
deliberately out of scope (SURVEY §2.11 note).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """2-D ('data', 'model') mesh; defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(f"{len(devices)} devices not divisible by n_model={n_model}")
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (jax.distributed). No-op on a single host; the DCN/ICI
    split is then visible through jax.devices() vs jax.local_devices()."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # already initialized or single-process run
        pass
