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
