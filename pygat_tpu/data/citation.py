"""Transductive citation datasets: Cora / Citeseer / Pubmed.

Reproduces the reference loaders (utils.py:16-70):

* Cora from raw text ``cora.content`` + ``cora.cites`` (utils.py:21-33),
  fixed splits train=range(140), val=range(200,500), test=range(500,1500);
* Citeseer/Pubmed from DGL-exported ``{name}_dgl/`` tensors
  (utils.py:35-45) — ``adj_sparse.npz`` + ``labels/idx_*.pt``;
* shared post-processing: symmetrize, row-normalize features,
  D^-1/2 (A+I) D^-1/2 (utils.py:49-52).

Unlike the reference it does NOT densify the adjacency (utils.py:55's
O(N^2) memory cliff); the normalized sparse matrix feeds the static padded
Graph container once. Stripped blobs (see /root/reference/.MISSING_LARGE_BLOBS)
are regenerated deterministically via pygat_tpu.data.synthetic and recorded
in ``synthetic_parts``.
"""

from __future__ import annotations

import os
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from pygat_tpu.data import synthetic
from pygat_tpu.data.preprocess import (
    normalize_adj_with_self_loops,
    normalize_features,
    symmetrize,
)
from pygat_tpu.graph import Graph, from_scipy
from pygat_tpu.models.presets import (
    CITESEER_NUM_CLASSES,
    CITESEER_NUM_INPUT_FEATURES,
    CORA_NUM_CLASSES,
    CORA_NUM_INPUT_FEATURES,
    PUBMED_NUM_CLASSES,
    PUBMED_NUM_INPUT_FEATURES,
)
from pygat_tpu.utils.padding import pad_axis, round_up

REFERENCE_ROOT = "/root/reference"  # read-only checkout with partial blobs


class CitationDataset(NamedTuple):
    graph: Graph
    features: jax.Array  # [N_pad, F_pad] float32, row-normalized
    labels: jax.Array  # [N_pad] int32, -1 on padding
    idx_train: jax.Array
    idx_val: jax.Array
    idx_test: jax.Array
    num_classes: int
    num_features: int  # real (unpadded) feature count
    synthetic_parts: tuple[str, ...]

    @property
    def num_nodes(self) -> int:
        return int(self.n_real())

    def n_real(self):
        return self.graph.n_node


def _search_roots(data_root: str | None) -> list[str]:
    roots = []
    if data_root:
        roots.append(data_root)
    if os.environ.get("PYGAT_DATA"):
        roots.append(os.environ["PYGAT_DATA"])
    roots += [os.getcwd(), REFERENCE_ROOT]
    return roots


def _find(relpath: str, roots: list[str]) -> str | None:
    for r in roots:
        p = os.path.join(r, relpath)
        if os.path.exists(p):
            return p
    return None


def _warn_synth(dataset: str, part: str) -> None:
    print(
        f"[pygat_tpu.data] {dataset}: '{part}' not found (stripped blob?) — "
        "using deterministic synthetic stand-in",
        file=sys.stderr,
    )


def _load_cora(roots: list[str]):
    synth: list[str] = []
    content_path = _find("data/cora/cora.content", roots)
    cites_path = _find("data/cora/cora.cites", roots)
    if cites_path is None and content_path is None:
        _warn_synth("cora", "cora.cites/cora.content")
        s, r, labels = synthetic.planted_partition_graph(2708, CORA_NUM_CLASSES, "cora")
        adj = sp.coo_matrix(
            (np.ones(len(s), np.float32), (r, s)), shape=(2708, 2708)
        ).tocsr()
        features = synthetic.class_features(labels, CORA_NUM_INPUT_FEATURES, "cora")
        return adj, features, labels, ("topology", "features", "labels")

    if content_path is not None:
        # reference utils.py:21-29
        raw = np.genfromtxt(content_path, dtype=np.dtype(str))
        features = sp.csr_matrix(raw[:, 1:-1], dtype=np.float32)
        class_names = sorted(set(raw[:, -1]))
        labels = np.array([class_names.index(c) for c in raw[:, -1]], dtype=np.int32)
        ids = raw[:, 0].astype(np.int64)
    else:
        _warn_synth("cora", "cora.content")
        synth += ["features", "labels"]
        edges_raw = np.genfromtxt(cites_path, dtype=np.int64)
        ids = np.unique(edges_raw)
        features = labels = None  # filled below once edges are mapped

    idx_map = {int(j): i for i, j in enumerate(ids)}
    n = len(ids)
    edges_raw = np.genfromtxt(cites_path, dtype=np.int64)
    edges = np.array(
        [[idx_map[int(a)], idx_map[int(b)]] for a, b in edges_raw], dtype=np.int64
    )
    adj = sp.coo_matrix(
        (np.ones(len(edges), np.float32), (edges[:, 0], edges[:, 1])), shape=(n, n)
    ).tocsr()

    if features is None:
        labels = synthetic.propagate_labels(
            edges[:, 1], edges[:, 0], n, CORA_NUM_CLASSES, "cora"
        )
        features = synthetic.class_features(labels, CORA_NUM_INPUT_FEATURES, "cora")
    return adj, features, labels, tuple(synth)


def _load_dgl_export(name: str, roots: list[str], n_feat: int, n_classes: int):
    """Citeseer/Pubmed from the {name}_dgl/ export (utils.py:35-45)."""
    import torch  # cpu wheel, host-side only

    synth: list[str] = []
    folder = f"{name}_dgl"
    adj_path = _find(f"{folder}/adj_sparse.npz", roots)
    if adj_path is None:
        _warn_synth(name, f"{folder}/adj_sparse.npz")
        s, r, labels = synthetic.planted_partition_graph(
            19717 if name == "pubmed" else 3327, n_classes, name
        )
        n = labels.shape[0]
        adj = sp.coo_matrix((np.ones(len(s), np.float32), (r, s)), shape=(n, n)).tocsr()
        feats = synthetic.class_features(labels, n_feat, name)
        idx = np.arange(n)
        return adj, feats, labels, idx[:140], idx[200:500], idx[500:1500], (
            "topology",
            "features",
            "labels",
            "splits",
        )

    adj = sp.load_npz(adj_path).tocsr().astype(np.float32)
    n = adj.shape[0]

    def _load_pt(rel):
        p = _find(f"{folder}/{rel}", roots)
        return None if p is None else torch.load(p, map_location="cpu", weights_only=True)

    labels_t = _load_pt("labels.pt")
    if labels_t is None:
        _warn_synth(name, "labels.pt")
        synth.append("labels")
        coo = adj.tocoo()
        labels = synthetic.propagate_labels(coo.col, coo.row, n, n_classes, name)
    else:
        labels = labels_t.numpy().astype(np.int32)

    feats_t = _load_pt("features.pt")
    if feats_t is None:
        _warn_synth(name, "features.pt")
        synth.append("features")
        feats = synthetic.class_features(labels, n_feat, name)
    else:
        feats = feats_t.numpy().astype(np.float32)

    idx = {}
    for split in ("train", "val", "test"):
        t = _load_pt(f"idx_{split}.pt")
        if t is None:
            _warn_synth(name, f"idx_{split}.pt")
            synth.append(f"idx_{split}")
            rng = np.random.default_rng(72)
            perm = rng.permutation(n)
            sizes = {"train": 140, "val": 500, "test": 1000}
            off = {"train": 0, "val": 140, "test": 640}
            idx[split] = np.sort(perm[off[split] : off[split] + sizes[split]])
        else:
            idx[split] = t.numpy().astype(np.int64)

    return adj, feats, labels, idx["train"], idx["val"], idx["test"], tuple(synth)


def load_citation(dataset: str, data_root: str | None = None,
                  reorder: bool = False) -> CitationDataset:
    """Load a citation dataset.

    ``reorder=True`` relabels nodes in RCM order (native C++ graphops, numpy
    fallback) before building the padded Graph: an isomorphic relabeling
    (features/labels/splits permute along), it packs neighborhoods into few
    128-node tiles — raising the Pallas BCSR edge-slot utilization (Cora:
    0.24 -> see tile_stats) at zero semantic cost. Default off to preserve
    the reference's node numbering (e.g. Cora train split == range(140)).
    """
    roots = _search_roots(data_root)

    if dataset == "cora":
        adj, features, labels, synth = _load_cora(roots)
        n = adj.shape[0]
        idx_train = np.arange(140)
        idx_val = np.arange(200, 500)
        idx_test = np.arange(500, 1500)
        n_feat, n_classes = CORA_NUM_INPUT_FEATURES, CORA_NUM_CLASSES
    elif dataset == "citeseer":
        adj, features, labels, idx_train, idx_val, idx_test, synth = _load_dgl_export(
            "citeseer", roots, CITESEER_NUM_INPUT_FEATURES, CITESEER_NUM_CLASSES
        )
        n_feat, n_classes = CITESEER_NUM_INPUT_FEATURES, CITESEER_NUM_CLASSES
    elif dataset == "pubmed":
        adj, features, labels, idx_train, idx_val, idx_test, synth = _load_dgl_export(
            "pubmed", roots, PUBMED_NUM_INPUT_FEATURES, PUBMED_NUM_CLASSES
        )
        n_feat, n_classes = PUBMED_NUM_INPUT_FEATURES, PUBMED_NUM_CLASSES
    else:
        raise ValueError(f"unknown citation dataset {dataset!r}")

    n = adj.shape[0]
    # Shared post-processing, reference utils.py:49-52.
    adj = symmetrize(adj)
    features = normalize_features(features)
    adj_norm = normalize_adj_with_self_loops(adj)

    if reorder:
        from pygat_tpu.native import apply_reorder, rcm_order

        csr = adj_norm.tocsr()
        order = rcm_order(csr.indptr.astype(np.int32),
                          csr.indices.astype(np.int32), n)
        coo = csr.tocoo()
        # adj[i, j] => edge j->i; senders=col, receivers=row (graph.from_scipy)
        new_row, new_col, inverse = apply_reorder(
            order.astype(np.int64), coo.row.astype(np.int64),
            coo.col.astype(np.int64))
        adj_norm = sp.coo_matrix((coo.data, (new_row, new_col)), shape=(n, n))
        features = (features.tocsr() if sp.issparse(features) else
                    np.asarray(features))[order]
        labels = np.asarray(labels)[order]
        idx_train = inverse[np.asarray(idx_train, dtype=np.int64)]
        idx_val = inverse[np.asarray(idx_val, dtype=np.int64)]
        idx_test = inverse[np.asarray(idx_test, dtype=np.int64)]

    graph = from_scipy(adj_norm.tocsr())
    n_pad = graph.num_nodes_padded

    if sp.issparse(features):
        features = np.asarray(features.todense())
    features = np.asarray(features, dtype=np.float32)
    f_pad = round_up(features.shape[1])
    feats_p = pad_axis(pad_axis(features, n_pad, axis=0), f_pad, axis=1)

    labels_p = np.full((n_pad,), -1, dtype=np.int32)
    labels_p[:n] = labels

    return CitationDataset(
        graph=graph,
        features=jnp.asarray(feats_p),
        labels=jnp.asarray(labels_p),
        idx_train=jnp.asarray(np.asarray(idx_train, dtype=np.int32)),
        idx_val=jnp.asarray(np.asarray(idx_val, dtype=np.int32)),
        idx_test=jnp.asarray(np.asarray(idx_test, dtype=np.int32)),
        num_classes=int(n_classes),
        num_features=int(features.shape[1]),
        synthetic_parts=synth,
    )


def repad_citation(ds: CitationDataset, n_pad: int) -> CitationDataset:
    """Rebuild the dataset with a larger node padding (features/labels rows
    grow with zeros / -1). Used by the ring edge-partition path, which
    needs ``N_pad % (128 * n_shards) == 0`` so each shard's node range is
    128-row-tile aligned (the stream-kernel contract, ops/stream.py)."""
    from pygat_tpu.graph import build_graph

    g = ds.graph
    old_pad = g.num_nodes_padded
    if n_pad == old_pad:
        return ds
    if n_pad < int(g.n_node) + 1:
        raise ValueError(f"n_pad={n_pad} too small for {int(g.n_node)} nodes")
    mask = np.asarray(g.edge_mask)
    g2 = build_graph(
        np.asarray(g.senders)[mask],
        np.asarray(g.receivers)[mask],
        np.asarray(g.edge_weight)[mask],
        int(g.n_node),
        n_pad=n_pad,
    )
    feats = np.asarray(ds.features)
    labels = np.asarray(ds.labels)
    if n_pad > old_pad:
        feats = np.pad(feats, ((0, n_pad - old_pad), (0, 0)))
        labels = np.pad(labels, (0, n_pad - old_pad), constant_values=-1)
    else:
        feats = feats[:n_pad]
        labels = labels[:n_pad]
    return ds._replace(graph=g2, features=jnp.asarray(feats),
                       labels=jnp.asarray(labels))


def interleave_citation(ds: CitationDataset, n_shards: int,
                        n_pad: int | None = None) -> CitationDataset:
    """Cyclic node relabel that balances the ring edge partition's blocks.

    Contiguous shard ranges concentrate id-local edges (RCM output,
    citation crawls, self loops) in the DIAGONAL blocks of the
    (dest_shard, src_shard) grid, and ``partition_edges`` pads every block
    to the global max — measured 2.6x the mean block at 8 shards on the
    bench_scaling graph, i.e. 2.6x padded per-hop work for the ring. This
    transform deals real node ``v`` to shard ``v % d`` at rank ``v // d``,
    spreading every neighborhood across shards so block loads approach
    ``E / d^2`` (self loops spread evenly over the diagonal, which is their
    floor). Padding ids fill each shard's tail, so the dummy node
    ``n_pad - 1`` stays padding and the per-shard real rows are a prefix of
    the shard range (but NOT a global prefix — the graph carries an
    explicit node_mask).

    Training is node-permutation-equivariant: losses/accuracies match an
    unpermuted run up to float reassociation in the segment sums.
    Used by the ring path only (train/loop.py::_ring_setup); a multiple of
    ``128 * n_shards`` is required for ``n_pad`` (the per-shard stream-tile
    contract), defaulting to the dataset's current padding.
    """
    from pygat_tpu.graph import build_graph

    g = ds.graph
    d = int(n_shards)
    n_real = int(g.n_node)
    if n_pad is None:
        n_pad = g.num_nodes_padded
    if n_pad % (128 * d):
        raise ValueError(f"n_pad={n_pad} not a multiple of 128*{d}")
    if n_pad <= n_real:
        raise ValueError(f"n_pad={n_pad} too small for {n_real} real nodes")
    n_local = n_pad // d

    old_real = np.arange(n_real, dtype=np.int64)
    new_of_real = (old_real % d) * n_local + old_real // d
    # per-shard real counts differ by <= 1 and n_real < n_pad, so every
    # new id lands inside its shard range and the dummy slot stays free
    assert n_real == 0 or int(new_of_real.max()) < n_pad - 1

    mask_new = np.zeros(n_pad, bool)
    mask_new[new_of_real] = True

    emask = np.asarray(g.edge_mask)
    send = new_of_real[np.asarray(g.senders)[emask]]
    recv = new_of_real[np.asarray(g.receivers)[emask]]
    w = np.asarray(g.edge_weight)[emask]
    g2 = build_graph(send, recv, w, n_real, n_pad=n_pad, node_mask=mask_new)

    feats = np.asarray(ds.features)
    f_new = np.zeros((n_pad, feats.shape[1]), feats.dtype)
    f_new[new_of_real] = feats[:n_real]
    labels = np.asarray(ds.labels)
    l_new = np.full(n_pad, -1, labels.dtype)
    l_new[new_of_real] = labels[:n_real]
    remap = lambda idx: jnp.asarray(new_of_real[np.asarray(idx)])  # noqa: E731
    return ds._replace(
        graph=g2,
        features=jnp.asarray(f_new),
        labels=jnp.asarray(l_new),
        idx_train=remap(ds.idx_train),
        idx_val=remap(ds.idx_val),
        idx_test=remap(ds.idx_test),
    )


def dataset_stats(ds: CitationDataset) -> dict:
    """Startup stats mirroring the reference prints (train.py:104-110)."""
    n = int(ds.graph.n_node)
    e = int(ds.graph.n_edge)
    return {
        "nodes": n,
        "edges": (e - n) // 2,  # undirected edges excl. self loops, train.py:105
        "input_features": ds.num_features,
        "classes": ds.num_classes,
        "train_nodes": int(ds.idx_train.shape[0]),
        "val_nodes": int(ds.idx_val.shape[0]),
        "test_nodes": int(ds.idx_test.shape[0]),
        "synthetic_parts": list(ds.synthetic_parts),
    }
