"""Distributed training entry points (GSPMD path).

The idiomatic TPU recipe: place every input with a NamedSharding, jit the
step, and let XLA insert the ICI collectives. Node/edge arrays shard on
'data' (graph partitioning), head-stacked parameters on 'model' (head ≈
tensor parallelism), gradients/optimizer updates are resolved by GSPMD into
the appropriate all-reduces.

The explicit hand-scheduled halo-exchange pipeline (shard_map + ppermute
ring with an online segment-softmax) lives in pygat_tpu.parallel.partition.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygat_tpu.parallel.mesh import MODEL_AXIS
from pygat_tpu.parallel.sharding import (
    head_leaf_spec,
    place,
    shard_transductive_data,
)
from pygat_tpu.train.state import TrainState


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place params and optimizer state (heads on 'model'), scalars replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def put(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, head_leaf_spec(leaf, n_model))
        )

    return TrainState(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=jax.tree_util.tree_map(put, state.params),
        opt_state=jax.tree_util.tree_map(put, state.opt_state),
        rng=jax.device_put(state.rng, NamedSharding(mesh, P())),
    )


def sharded_fit_inputs(data, state: TrainState, mesh: Mesh):
    """Place a CitationDataset + TrainState for multi-chip training; the
    existing jitted steps then run SPMD with zero code changes (jit derives
    the program from the inputs' committed shardings)."""
    return shard_transductive_data(data, mesh), shard_train_state(state, mesh)
