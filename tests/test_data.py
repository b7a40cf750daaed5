"""Pipeline golden-stat tests (SURVEY §4.5): loader invariants that hold for
both real and synthetic-fallback data, plus reference-exact preprocessing."""

import numpy as np
import pytest
import scipy.sparse as sp

from pygat_tpu.data.citation import dataset_stats, load_citation
from pygat_tpu.data.preprocess import (
    normalize_adj_with_self_loops,
    normalize_features,
    symmetrize,
)


def test_symmetrize_matches_reference_formula(rng):
    a = sp.random(30, 30, density=0.1, random_state=7, format="csr", dtype=np.float64)
    got = symmetrize(a).toarray()
    ad = a.toarray()
    mask = (ad.T > ad)
    want = ad + ad.T * mask - ad * mask
    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_allclose(got, got.T, rtol=1e-12)


def test_normalize_adj_self_loops():
    a = sp.csr_matrix(np.array([[0, 1], [1, 0]], dtype=np.float64))
    out = normalize_adj_with_self_loops(a).toarray()
    # A+I has all-2 row sums; D^-1/2 (A+I) D^-1/2 = (A+I)/2
    np.testing.assert_allclose(out, np.array([[0.5, 0.5], [0.5, 0.5]]))


def test_normalize_features_rows_sum_to_one():
    x = np.abs(np.random.default_rng(0).standard_normal((10, 5))) + 0.1
    x[3] = 0.0  # zero row must stay zero, not NaN
    out = np.asarray(normalize_features(sp.csr_matrix(x)).todense())
    sums = out.sum(1)
    np.testing.assert_allclose(sums[[0, 1, 2, 4]], 1.0, rtol=1e-6)
    assert sums[3] == 0.0


@pytest.mark.parametrize("name", ["cora", "citeseer", "pubmed"])
def test_load_citation_invariants(name):
    ds = load_citation(name)
    stats = dataset_stats(ds)
    n = stats["nodes"]
    assert n > 1000
    assert ds.features.shape[0] == ds.graph.num_nodes_padded
    assert ds.features.shape[1] % 128 == 0

    # row-normalized features: sums in {0, 1}
    fsum = np.asarray(ds.features).sum(1)
    real = fsum[:n]
    assert ((np.abs(real - 1) < 1e-3) | (np.abs(real) < 1e-6)).all()
    assert (fsum[n:] == 0).all()

    # normalized adjacency is symmetric in value: w(i<-j) == w(j<-i)
    mask = np.asarray(ds.graph.edge_mask)
    send = np.asarray(ds.graph.senders)[mask]
    recv = np.asarray(ds.graph.receivers)[mask]
    w = np.asarray(ds.graph.edge_weight)[mask]
    lut = {(int(r), int(s)): float(x) for r, s, x in zip(recv, send, w)}
    for k in list(lut)[:500]:
        assert (k[1], k[0]) in lut
        np.testing.assert_allclose(lut[k], lut[(k[1], k[0])], rtol=1e-5)

    # every real node has a self loop (adj + I before normalization)
    assert (send == recv).sum() == n
    # labels valid on real nodes, -1 on padding
    labels = np.asarray(ds.labels)
    assert labels[:n].min() >= 0 and labels[:n].max() < ds.num_classes
    assert (labels[n:] == -1).all()

    # splits in range and disjoint
    tr, va, te = (np.asarray(x) for x in (ds.idx_train, ds.idx_val, ds.idx_test))
    assert len(set(tr) & set(va)) == 0 and len(set(va) & set(te)) == 0
    assert max(tr.max(), va.max(), te.max()) < n


def test_cora_fixed_splits():
    ds = load_citation("cora")
    assert np.asarray(ds.idx_train).tolist() == list(range(140))
    assert np.asarray(ds.idx_val).tolist() == list(range(200, 500))
    assert np.asarray(ds.idx_test).tolist() == list(range(500, 1500))
    assert ds.num_classes == 7 and ds.num_features == 1433


def test_citation_deterministic():
    a = load_citation("cora")
    b = load_citation("cora")
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
    np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features))


def test_reorder_is_isomorphic_and_packs_tiles():
    """RCM relabeling: eval forward agrees node-for-node with the original
    ordering, and BCSR edge-slot utilization improves."""
    import jax
    import jax.numpy as jnp

    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
    from tests.legacy_bcsr.tiles import tile_graph, tile_stats

    a = load_citation("cora")
    b = load_citation("cora", reorder=True)

    # same graph up to relabeling
    assert int(a.graph.n_edge) == int(b.graph.n_edge)
    assert int(a.graph.n_node) == int(b.graph.n_node)
    # labels are a permutation
    la = np.sort(np.asarray(a.labels)[np.asarray(a.labels) >= 0])
    lb = np.sort(np.asarray(b.labels)[np.asarray(b.labels) >= 0])
    np.testing.assert_array_equal(la, lb)

    # eval forward: per-node outputs agree under the permutation. Recover
    # the permutation by matching train indices (order preserved).
    cfg = GATConfig(nlayers=2, nheads=(2, 1), nfeats=(a.features.shape[1], 4, 7),
                    dropout=0.0, alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(3), cfg)
    out_a = apply_gat(params, cfg, a.features, a.graph, jax.random.PRNGKey(0),
                      train=False)
    out_b = apply_gat(params, cfg, b.features, b.graph, jax.random.PRNGKey(0),
                      train=False)
    ia = np.asarray(a.idx_train)
    ib = np.asarray(b.idx_train)
    np.testing.assert_allclose(np.asarray(out_a)[ia], np.asarray(out_b)[ib],
                               atol=2e-4)

    util_a = tile_stats(tile_graph(a.graph))["utilization"]
    util_b = tile_stats(tile_graph(b.graph))["utilization"]
    assert util_b > util_a, (util_a, util_b)
