"""Static-shape padded graph containers (the TPU-first core data structure).

The reference keeps graphs as dense ``[N, N]`` torch tensors and re-extracts
a COO edge list inside every sparse forward pass (``layers.py:129`` of the
reference) — an O(N^2) memory wall and a dynamic-shape hazard. Here a graph
is preprocessed ONCE on the host into a padded, receiver-sorted COO/CSR
layout with fully static shapes, so every jitted step reuses one compiled
program:

* ``senders[e] -> j``, ``receivers[e] -> i`` encode the edge ``j -> i``
  (the reference convention: ``adj[i, j] != 0`` means "message j -> i",
  reference ``layers.py:279``; attention softmax-normalizes over the
  incoming edges of ``i``).
* edges are sorted by ``(receiver, sender)`` so ``receivers`` is a sorted
  segment-id vector (enables ``indices_are_sorted=True`` segment ops and a
  CSR ``row_ptr`` for Pallas row-block kernels).
* padding edges point at the reserved dummy node ``N_pad - 1`` (we always
  pad by at least one node), carry weight 0 and ``edge_mask == False``.
"""

from __future__ import annotations

import weakref
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pygat_tpu.utils.padding import LANE, pad_axis, round_up

# Host copies of the padded edge arrays, keyed by the device senders array
# (id + weakref.finalize eviction — jax Arrays support weakrefs but not
# hashing). Plan builders (ops/banded.build_band_plan) need the edge
# structure back on the host; re-reading it from the device costs minutes
# over the axon tunnel (~1 MB/s bulk readback, measured round 5), while
# build_graph had the numpy arrays in hand anyway.
_HOST_EDGES: dict = {}


def _remember_host_edges(arr, value) -> None:
    key = id(arr)
    _HOST_EDGES[key] = value
    weakref.finalize(arr, _HOST_EDGES.pop, key, None)


def host_edges(graph: "Graph") -> tuple | None:
    """(senders, receivers, edge_weight, edge_mask) as host numpy arrays if
    this Graph was built by :func:`build_graph` in this process, else None
    (callers fall back to one batched ``jax.device_get``)."""
    return _HOST_EDGES.get(id(graph.senders))


class Graph(NamedTuple):
    """A padded static-shape graph on device.

    Shapes: ``E_pad = senders.shape[0]``, ``N_pad = node_mask.shape[0]``.
    """

    senders: jax.Array  # [E_pad] int32, source node of each edge (j in j->i)
    receivers: jax.Array  # [E_pad] int32, destination node (i); sorted ascending
    edge_weight: jax.Array  # [E_pad] f32, normalized adjacency value (0 on padding)
    edge_mask: jax.Array  # [E_pad] bool
    row_ptr: jax.Array  # [N_pad + 1] int32, CSR offsets over receiver-sorted edges
    node_mask: jax.Array  # [N_pad] bool
    n_node: jax.Array  # scalar int32, number of real nodes
    n_edge: jax.Array  # scalar int32, number of real edges
    # CSC view (sender-sorted), for scatter-free sender-side reductions:
    # col_perm[k] is the receiver-sorted edge index of the k-th edge in
    # (sender, receiver) order; col_ptr is the CSR-style offset array over
    # that order. None on hand-built graphs -> ops fall back to scatter.
    col_perm: jax.Array | None = None  # [E_pad] int32
    col_ptr: jax.Array | None = None  # [N_pad + 1] int32
    # Stream-scatter layouts (pygat_tpu.ops.stream): build_graph lays the
    # edge arrays out so every EC-chunk of consecutive edges scatters into
    # ONE 128-row tile (receiver side is *physically* stream-aligned, so no
    # runtime permutation is needed); the sender side carries a slot map
    # over the CSC order. None when N_pad isn't 128-aligned.
    r_local: jax.Array | None = None  # [E_pad] int32 chunk-local row (128 = dead)
    r_chunk: jax.Array | None = None  # [E_pad / EC] int32 output tile per chunk
    c_slot: jax.Array | None = None  # [E_s2] int32 edge index per stream slot
    c_local: jax.Array | None = None  # [E_s2] int32
    c_chunk: jax.Array | None = None  # [E_s2 / EC] int32

    @property
    def num_nodes_padded(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]

    def to_dense(self, binary: bool = False) -> jax.Array:
        """Dense ``[N_pad, N_pad]`` adjacency (weights, or 0/1 if binary).

        Used by the dense attention path; equivalent of the reference's
        densification at ``utils.py:55``.
        """
        n = self.num_nodes_padded
        vals = jnp.where(self.edge_mask, self.edge_weight, 0.0)
        if binary:
            vals = jnp.where(self.edge_mask, 1.0, 0.0)
        dense = jnp.zeros((n, n), dtype=self.edge_weight.dtype)
        return dense.at[self.receivers, self.senders].set(vals)


class GraphBatch(NamedTuple):
    """A block-diagonal batch of graphs (inductive / PPI path).

    ``graph`` is a single disconnected Graph; ``graph_ids[v]`` says which
    member graph node ``v`` belongs to (-1 on padding nodes). Mirrors the
    reference's ``torch.block_diag`` collate (``load_data_ppi.py:71-88``)
    but with static padded shapes.
    """

    graph: Graph
    graph_ids: jax.Array  # [N_pad] int32, -1 for padding
    n_graph: jax.Array  # scalar int32


def build_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_weight: np.ndarray | None,
    num_nodes: int,
    *,
    n_pad: int | None = None,
    e_pad: int | None = None,
    node_align: int = LANE,
    edge_align: int = LANE,
    node_mask: np.ndarray | None = None,
) -> Graph:
    """Host-side constructor: sort, pad, CSR-ify, device_put.

    ``senders[e] -> receivers[e]`` must already include any self loops the
    model expects (the citation pipeline adds them during normalization,
    reference ``utils.py:52``).

    ``node_mask``: explicit [n_pad] real-node mask for NON-prefix node
    layouts (the ring's balance interleave scatters real ids across shard
    ranges, data/citation.py::interleave_citation). Requires ``n_pad``;
    edge endpoints may then reference any non-dummy slot. Default: real
    nodes are the prefix ``[0, num_nodes)``.
    """
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    if senders.shape != receivers.shape or senders.ndim != 1:
        raise ValueError("senders/receivers must be 1-D and equal length")
    num_edges = int(senders.shape[0])
    if edge_weight is None:
        edge_weight = np.ones((num_edges,), dtype=np.float32)
    edge_weight = np.asarray(edge_weight, dtype=np.float32)

    if node_mask is not None:
        if n_pad is None or node_mask.shape != (n_pad,):
            raise ValueError("explicit node_mask requires a matching n_pad")
        if node_mask[n_pad - 1]:
            raise ValueError("node_mask must leave the dummy row n_pad-1 free")
        id_limit = n_pad - 1  # any non-dummy slot may carry a real node
    else:
        id_limit = num_nodes
    if num_edges and (senders.min() < 0 or max(senders.max(), receivers.max()) >= id_limit):
        raise ValueError("edge endpoints out of range")

    # Always pad by >= 1 node so N_pad - 1 is a guaranteed dummy row.
    if n_pad is None:
        n_pad = round_up(num_nodes + 1, node_align)
    if n_pad <= num_nodes:
        raise ValueError(f"n_pad={n_pad} must exceed num_nodes={num_nodes}")
    # An EXPLICIT e_pad is a static-shape bucketing request (PPI batches
    # share one compiled shape): the stream layout then uses a worst-case
    # length bound independent of the degree distribution. e_pad=None uses
    # the exact per-graph stream length.
    explicit_e_pad = e_pad is not None
    if e_pad is None:
        e_pad = round_up(max(num_edges, 1), edge_align)
    if e_pad < num_edges:
        raise ValueError(f"e_pad={e_pad} < num_edges={num_edges}")

    # Receiver-major sort => receivers sorted => CSR rows contiguous.
    order = np.lexsort((senders, receivers))
    senders = senders[order]
    receivers = receivers[order]
    edge_weight = edge_weight[order]

    dummy = n_pad - 1
    if node_mask is None:
        node_mask = np.zeros((n_pad,), dtype=bool)
        node_mask[:num_nodes] = True

    stream_fields: dict = {}
    if n_pad % 128 == 0:
        # Stream-aligned physical layout: insert padding slots so every
        # EC-chunk of consecutive edges scatters into one 128-row tile
        # (ops.stream kernel contract). Padding inside tile t carries
        # receiver t*128+127 (keeps the array receiver-sorted), sender
        # dummy, weight 0, mask False.
        from pygat_tpu.ops.stream import (
            DEAD,
            EC,
            build_stream_layout,
            stream_length,
        )

        real_ptr = np.zeros((n_pad + 1,), dtype=np.int64)
        np.cumsum(np.bincount(receivers, minlength=n_pad), out=real_ptr[1:])
        lay = build_stream_layout(
            real_ptr,
            stream_pad=stream_length(e_pad, n_pad) if explicit_e_pad else None,
        )
        e_s = lay.slot.shape[0]
        live = lay.slot >= 0
        src = np.maximum(lay.slot, 0)
        senders_p = np.where(live, senders[src], dummy).astype(np.int32)
        receivers_p = np.where(
            live, receivers[src],
            lay.chunk_tile[np.arange(e_s) // EC].astype(np.int64) * 128 + 127,
        ).astype(np.int32)
        weight_p = np.where(live, edge_weight[src], 0.0).astype(np.float32)
        edge_mask = live
        e_pad = e_s

        c_lay = build_stream_layout(
            _csc_ptr(senders_p, n_pad),
            order=np.lexsort((receivers_p, senders_p)),
            stream_pad=stream_length(e_s, n_pad) if explicit_e_pad else None,
        )
        stream_fields = dict(
            r_local=jnp.asarray(lay.local),
            r_chunk=jnp.asarray(lay.chunk_tile),
            c_slot=jnp.asarray(np.maximum(c_lay.slot, 0).astype(np.int32)),
            c_local=jnp.asarray(c_lay.local),
            c_chunk=jnp.asarray(c_lay.chunk_tile),
        )
    else:
        # legacy padding (no stream kernels): all padding in the dummy row
        senders_p = pad_axis(senders.astype(np.int32), e_pad, value=dummy)
        receivers_p = pad_axis(receivers.astype(np.int32), e_pad, value=dummy)
        weight_p = pad_axis(edge_weight, e_pad, value=0.0)
        edge_mask = np.zeros((e_pad,), dtype=bool)
        edge_mask[:num_edges] = True

    # CSR row_ptr over the padded edge array (padding slots land in their
    # tile's last row — zeros there are harmless to every consumer).
    counts = np.bincount(receivers_p, minlength=n_pad)
    row_ptr = np.zeros((n_pad + 1,), dtype=np.int32)
    np.cumsum(counts, out=row_ptr[1:])

    # CSC (sender-major) permutation + offsets; padding edges (sender ==
    # dummy) sort last, into the dummy column segment.
    col_perm = np.lexsort((receivers_p, senders_p)).astype(np.int32)
    col_counts = np.bincount(senders_p, minlength=n_pad)
    col_ptr = np.zeros((n_pad + 1,), dtype=np.int32)
    np.cumsum(col_counts, out=col_ptr[1:])

    g = Graph(
        senders=jnp.asarray(senders_p),
        receivers=jnp.asarray(receivers_p),
        edge_weight=jnp.asarray(weight_p),
        edge_mask=jnp.asarray(edge_mask),
        row_ptr=jnp.asarray(row_ptr),
        node_mask=jnp.asarray(node_mask),
        n_node=jnp.asarray(num_nodes, dtype=jnp.int32),
        n_edge=jnp.asarray(num_edges, dtype=jnp.int32),
        col_perm=jnp.asarray(col_perm),
        col_ptr=jnp.asarray(col_ptr),
        **stream_fields,
    )
    try:
        _remember_host_edges(g.senders, (np.asarray(senders_p, np.int64),
                                         np.asarray(receivers_p, np.int64),
                                         np.asarray(weight_p, np.float32),
                                         np.asarray(edge_mask, bool)))
    except TypeError:  # non-weakref-able array type (e.g. under tracing)
        pass
    return g


def _csc_ptr(senders_p: np.ndarray, n_pad: int) -> np.ndarray:
    ptr = np.zeros((n_pad + 1,), dtype=np.int64)
    np.cumsum(np.bincount(senders_p, minlength=n_pad), out=ptr[1:])
    return ptr


def from_scipy(adj, *, n_pad: int | None = None, e_pad: int | None = None) -> Graph:
    """Build from a scipy sparse matrix where ``adj[i, j] != 0`` is edge j->i."""
    coo = adj.tocoo()
    return build_graph(
        senders=coo.col,
        receivers=coo.row,
        edge_weight=coo.data,
        num_nodes=int(adj.shape[0]),
        n_pad=n_pad,
        e_pad=e_pad,
    )


def block_diag(
    graphs: list[tuple[np.ndarray, np.ndarray, np.ndarray | None, int]],
    *,
    n_pad: int | None = None,
    e_pad: int | None = None,
) -> GraphBatch:
    """Merge ``(senders, receivers, weights, num_nodes)`` tuples into one
    disconnected padded graph with node-id offsets (block-diagonal batch)."""
    all_s, all_r, all_w = [], [], []
    offsets = [0]
    for s, r, w, n in graphs:
        s = np.asarray(s)
        r = np.asarray(r)
        all_s.append(s + offsets[-1])
        all_r.append(r + offsets[-1])
        all_w.append(np.ones_like(s, dtype=np.float32) if w is None else np.asarray(w, np.float32))
        offsets.append(offsets[-1] + int(n))
    num_nodes = offsets[-1]
    senders = np.concatenate(all_s) if all_s else np.zeros((0,), np.int64)
    receivers = np.concatenate(all_r) if all_r else np.zeros((0,), np.int64)
    weights = np.concatenate(all_w) if all_w else np.zeros((0,), np.float32)
    g = build_graph(senders, receivers, weights, num_nodes, n_pad=n_pad, e_pad=e_pad)

    gid = np.full((g.num_nodes_padded,), -1, dtype=np.int32)
    for k in range(len(graphs)):
        gid[offsets[k] : offsets[k + 1]] = k
    return GraphBatch(
        graph=g,
        graph_ids=jnp.asarray(gid),
        n_graph=jnp.asarray(len(graphs), dtype=jnp.int32),
    )
