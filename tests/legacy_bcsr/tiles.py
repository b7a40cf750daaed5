"""Host-side BCSR tiling for the Pallas kernels.

TPU has no fast gather/scatter; the MXU does 128x128 matmuls essentially for
free. So the sparse kernels re-express per-edge gather/scatter as ONE-HOT
MATMULS over 128-node tiles:

* nodes are grouped into tiles of 128 (rows I = receiver tiles, cols J =
  sender tiles);
* edges are grouped by (I, J) tile pair and padded to chunks of EDGE_CHUNK;
* inside a chunk, an edge is (recv_local, send_local, valid) with both
  locals in [0, 128); gathering Wh rows becomes
  ``OneHot(send_local) @ Wh_tile_J`` and scattering becomes
  ``OneHot(recv_local)^T @ messages`` — both MXU ops;
* chunks are ordered row-tile-major so a Pallas grid walking chunks can
  keep one output row tile resident in VMEM and accumulate across its
  chunks (flash-attention-style online softmax for the fused kernel).

This replaces the reference's torch.sparse/scatter_max native ops
(reference layers.py:70-95,145) with a layout XLA/Mosaic can run at MXU
speed. Tiling happens once per graph on the host (vectorized numpy).

Chunk-count note: chunk padding inflates edge count by up to EDGE_CHUNK per
nonempty (I, J) tile pair, so locality matters — community/RCM-style node
orderings keep neighbors in few col tiles. ``tile_stats`` reports the
inflation factor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pygat_tpu.graph import Graph

TILE = 128  # node tile (MXU lane width)
EDGE_CHUNK = 128  # edges per kernel step


class TiledGraph(NamedTuple):
    """BCSR edge layout on device. C = number of chunks (static, mult. of 8)."""

    # per-chunk metadata, int32 [C]
    chunk_row: jax.Array  # receiver tile index I
    chunk_col: jax.Array  # sender tile index J
    chunk_last: jax.Array  # 1 iff final chunk of its row tile
    # per-edge data [C, EDGE_CHUNK]
    recv_local: jax.Array  # int32: receiver - I*TILE
    send_local: jax.Array  # int32: sender - J*TILE
    valid: jax.Array  # f32 1/0
    edge_perm: jax.Array  # int32: original (graph COO) edge index; -1 padding
    n_tiles: int  # number of node tiles (N_pad / TILE)

    @property
    def num_chunks(self) -> int:
        return self.chunk_row.shape[0]


def tile_graph(graph: Graph, *, pad_chunks_to: int | None = None) -> TiledGraph:
    """Group the (already receiver-sorted) edge list by 128x128 tile pairs.

    Only real edges participate; padding edges are dropped (the kernels use
    ``valid`` masks instead). Every row tile appears at least once so the
    kernel initializes/flushes each output block. Chunk count is padded to
    a multiple of 8 (Mosaic block layout) and optionally to
    ``pad_chunks_to`` (compile-count bucketing).
    """
    mask = np.asarray(graph.edge_mask)
    orig_idx = np.flatnonzero(mask).astype(np.int64)
    senders = np.asarray(graph.senders)[mask].astype(np.int64)
    receivers = np.asarray(graph.receivers)[mask].astype(np.int64)

    n_pad = graph.num_nodes_padded
    if n_pad % TILE:
        raise ValueError(f"N_pad={n_pad} must be a multiple of {TILE}")
    n_tiles = n_pad // TILE

    row_t = receivers // TILE
    col_t = senders // TILE
    order = np.lexsort((senders, col_t, row_t))
    senders, receivers = senders[order], receivers[order]
    orig_idx = orig_idx[order]
    row_t, col_t = row_t[order], col_t[order]

    e = len(senders)
    # group = run of equal (row_t, col_t); vectorized chunking within groups
    if e:
        pair = row_t * n_tiles + col_t
        new_group = np.empty(e, bool)
        new_group[0] = True
        np.not_equal(pair[1:], pair[:-1], out=new_group[1:])
        group_id = np.cumsum(new_group) - 1
        group_start_idx = np.flatnonzero(new_group)
        group_sizes = np.diff(np.append(group_start_idx, e))
        pos_in_group = np.arange(e) - group_start_idx[group_id]
        chunks_per_group = -(-group_sizes // EDGE_CHUNK)
        chunk_base = np.concatenate([[0], np.cumsum(chunks_per_group)[:-1]])
        edge_chunk_id = chunk_base[group_id] + pos_in_group // EDGE_CHUNK
        edge_slot = pos_in_group % EDGE_CHUNK
        c_real = int(chunks_per_group.sum())

        chunk_row = np.zeros(c_real, np.int32)
        chunk_col = np.zeros(c_real, np.int32)
        # first edge of each chunk stamps the metadata
        first_of_chunk = np.flatnonzero(
            np.diff(np.concatenate([[-1], edge_chunk_id])) > 0
        )
        chunk_row[edge_chunk_id[first_of_chunk]] = row_t[first_of_chunk]
        chunk_col[edge_chunk_id[first_of_chunk]] = col_t[first_of_chunk]

        recv_l = np.zeros((c_real, EDGE_CHUNK), np.int32)
        send_l = np.zeros((c_real, EDGE_CHUNK), np.int32)
        valid = np.zeros((c_real, EDGE_CHUNK), np.float32)
        perm = np.full((c_real, EDGE_CHUNK), -1, np.int32)
        recv_l[edge_chunk_id, edge_slot] = (receivers - row_t * TILE).astype(np.int32)
        send_l[edge_chunk_id, edge_slot] = (senders - col_t * TILE).astype(np.int32)
        valid[edge_chunk_id, edge_slot] = 1.0
        perm[edge_chunk_id, edge_slot] = orig_idx.astype(np.int32)
    else:
        c_real = 0
        chunk_row = np.zeros(0, np.int32)
        chunk_col = np.zeros(0, np.int32)
        recv_l = np.zeros((0, EDGE_CHUNK), np.int32)
        send_l = np.zeros((0, EDGE_CHUNK), np.int32)
        valid = np.zeros((0, EDGE_CHUNK), np.float32)
        perm = np.full((0, EDGE_CHUNK), -1, np.int32)

    # every row tile must appear at least once (kernel init/flush contract)
    missing = np.setdiff1d(np.arange(n_tiles, dtype=np.int32),
                           np.unique(chunk_row[:c_real] if c_real else []))
    if missing.size:
        chunk_row = np.concatenate([chunk_row, missing.astype(np.int32)])
        chunk_col = np.concatenate([chunk_col, np.zeros(missing.size, np.int32)])
        recv_l = np.concatenate([recv_l, np.zeros((missing.size, EDGE_CHUNK), np.int32)])
        send_l = np.concatenate([send_l, np.zeros((missing.size, EDGE_CHUNK), np.int32)])
        valid = np.concatenate([valid, np.zeros((missing.size, EDGE_CHUNK), np.float32)])
        perm = np.concatenate([perm, np.full((missing.size, EDGE_CHUNK), -1, np.int32)])
        order2 = np.argsort(chunk_row, kind="stable")
        chunk_row, chunk_col = chunk_row[order2], chunk_col[order2]
        recv_l, send_l, valid = recv_l[order2], send_l[order2], valid[order2]
        perm = perm[order2]

    c = len(chunk_row)
    # pad to multiple of 8 (Mosaic (8, EDGE_CHUNK) block packing) and any
    # requested bucket; padding chunks attach to the last row tile, invalid
    target = max(pad_chunks_to or 0, -(-max(c, 1) // 8) * 8)
    if target > c:
        extra = target - c
        last_row = chunk_row[-1] if c else 0
        chunk_row = np.concatenate([chunk_row, np.full(extra, last_row, np.int32)])
        chunk_col = np.concatenate([chunk_col, np.zeros(extra, np.int32)])
        recv_l = np.concatenate([recv_l, np.zeros((extra, EDGE_CHUNK), np.int32)])
        send_l = np.concatenate([send_l, np.zeros((extra, EDGE_CHUNK), np.int32)])
        valid = np.concatenate([valid, np.zeros((extra, EDGE_CHUNK), np.float32)])
        perm = np.concatenate([perm, np.full((extra, EDGE_CHUNK), -1, np.int32)])

    chunk_last = np.zeros(len(chunk_row), np.int32)
    chunk_last[-1] = 1
    chunk_last[:-1] = (chunk_row[1:] != chunk_row[:-1]).astype(np.int32)

    return TiledGraph(
        chunk_row=jnp.asarray(chunk_row),
        chunk_col=jnp.asarray(chunk_col),
        chunk_last=jnp.asarray(chunk_last),
        recv_local=jnp.asarray(recv_l),
        send_local=jnp.asarray(send_l),
        valid=jnp.asarray(valid),
        edge_perm=jnp.asarray(perm),
        n_tiles=n_tiles,
    )


def tile_stats(tiles: TiledGraph) -> dict:
    """Edge-slot utilization (1.0 = no padding waste)."""
    v = np.asarray(tiles.valid)
    real = float(v.sum())
    total = float(v.size)
    return {
        "chunks": int(tiles.num_chunks),
        "edge_slots": int(total),
        "real_edges": int(real),
        "utilization": real / max(total, 1.0),
    }
