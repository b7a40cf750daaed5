"""Sharding rules: PartitionSpecs for graphs, features, and head-stacked
parameters, plus helpers to place data and jit train steps over a mesh.

Strategy (GSPMD path — annotate, let XLA insert ICI collectives):

* nodes/features/labels shard on ``data`` (node partitioning; edges are
  receiver-sorted so a contiguous edge split aligns with the node split);
* the ``[H, ...]`` head-stacked parameters shard on ``model`` when H is
  divisible by the axis (head parallelism ≈ TP); otherwise replicate;
* optimizer state follows parameters automatically (same tree structure).

The hand-scheduled shard_map halo-exchange path lives in
pygat_tpu.parallel.partition.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygat_tpu.graph import Graph
from pygat_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def graph_pspecs(sharded: bool = True) -> Graph:
    """PartitionSpec tree for a Graph. Edge arrays and node arrays shard on
    'data'; row_ptr and scalars replicate."""
    e = P(DATA_AXIS) if sharded else P()
    n = P(DATA_AXIS) if sharded else P()
    return Graph(
        senders=e,
        receivers=e,
        edge_weight=e,
        edge_mask=e,
        row_ptr=P(),
        node_mask=n,
        n_node=P(),
        n_edge=P(),
        col_perm=e,
        col_ptr=P(),
        # stream-scatter layouts: edge-aligned slot/local arrays shard like
        # edges; the small per-chunk metadata replicates (the Pallas kernel
        # itself is a single-device op — the GSPMD path reduces with XLA
        # segment ops, see ops.segment dispatch)
        r_local=e,
        r_chunk=P(),
        c_slot=e,
        c_local=e,
        c_chunk=P(),
    )


def head_leaf_spec(leaf, n_model: int) -> P:
    """Shard a [H, ...] leaf's head axis on 'model' where divisible; scalars
    and indivisible head counts replicate. Also correct for optimizer-state
    leaves, which mirror parameter shapes (Adam mu/nu) or are scalars."""
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()
    if n_model > 1 and leaf.shape[0] % n_model == 0 and leaf.shape[0] >= n_model:
        return P(MODEL_AXIS, *([None] * (ndim - 1)))
    return P(*([None] * ndim))


def param_pspecs(params: list[Any], mesh: Mesh) -> list[Any]:
    """Shard the leading head axis on 'model' where divisible, else replicate."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(lambda l: head_leaf_spec(l, n_model), params)


def transductive_pspecs(mesh: Mesh, params: list[Any]):
    """(params, x, graph, labels, idx) PartitionSpecs for a train step."""
    return dict(
        params=param_pspecs(params, mesh),
        x=P(DATA_AXIS, None),
        graph=graph_pspecs(),
        labels=P(DATA_AXIS),
        idx=P(),
    )


def place(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """device_put a pytree according to a matching PartitionSpec pytree.

    (PartitionSpec is itself tuple-like, so the spec tree is flattened with
    an explicit is_leaf.)
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    spec_leaves = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda s: isinstance(s, P)
    )[0]
    if len(spec_leaves) != len(leaves):
        raise ValueError("spec tree does not match value tree")
    placed = [
        jax.device_put(x, NamedSharding(mesh, s)) for x, s in zip(leaves, spec_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def shard_transductive_data(data, mesh: Mesh):
    """Place a CitationDataset: node/edge arrays on 'data', rest replicated."""
    gspec = graph_pspecs()
    g = data.graph
    g_sharded = Graph(
        *(
            jax.device_put(arr, NamedSharding(mesh, spec))
            for arr, spec in zip(tuple(g), tuple(gspec))
        )
    )
    rep = NamedSharding(mesh, P())
    return data._replace(
        graph=g_sharded,
        features=jax.device_put(data.features, NamedSharding(mesh, P(DATA_AXIS, None))),
        labels=jax.device_put(data.labels, NamedSharding(mesh, P(DATA_AXIS))),
        idx_train=jax.device_put(data.idx_train, rep),
        idx_val=jax.device_put(data.idx_val, rep),
        idx_test=jax.device_put(data.idx_test, rep),
    )
