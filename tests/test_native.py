"""Native graphops (C++/ctypes) vs NumPy fallback equivalence, and the RCM
reorder's effect on BCSR tile utilization."""

import numpy as np
import pytest

from pygat_tpu import native
from pygat_tpu.graph import build_graph
from tests.legacy_bcsr.tiles import tile_graph, tile_stats


@pytest.fixture(scope="module")
def edges(rng=None):
    r = np.random.default_rng(7)
    n, e = 500, 4000
    return r.integers(0, n, e).astype(np.int32), r.integers(0, n, e).astype(np.int32), n


def test_build_csr_matches_lexsort(edges):
    s, r, n = edges
    rowptr, col, perm = native.build_csr(s, r, n)
    want = np.lexsort((s, r))
    assert rowptr[-1] == len(s)
    np.testing.assert_array_equal(col, s[want])
    np.testing.assert_array_equal(r[perm], r[want])
    np.testing.assert_array_equal(s[perm], s[want])
    counts = np.diff(rowptr)
    np.testing.assert_array_equal(counts, np.bincount(r, minlength=n))


def test_rcm_is_permutation(edges):
    s, r, n = edges
    rowptr, col, _ = native.build_csr(s, r, n)
    order = native.rcm_order(rowptr, col, n)
    assert sorted(order.tolist()) == list(range(n))


def test_sym_norm_weights(edges):
    s, r, n = edges
    w = native.sym_norm_weights(s, r, n)
    deg = np.bincount(r, minlength=n).astype(np.float64)
    ok = (deg[r] > 0) & (deg[s] > 0)
    with np.errstate(divide="ignore"):
        want = 1.0 / np.sqrt(deg[r] * deg[s])
    np.testing.assert_allclose(w[ok], want[ok], rtol=1e-5)
    assert (w[~ok] == 0).all()


def test_rcm_improves_tile_utilization():
    """A banded graph with scrambled node ids: RCM must substantially
    recover the band, shrinking nonempty 128x128 tiles."""
    rng = np.random.default_rng(3)
    n = 2048
    src = np.repeat(np.arange(n), 6)
    dst = (src + rng.integers(-3, 4, len(src))) % n
    scram = rng.permutation(n)
    s, r = scram[src], scram[dst]

    u_bad = tile_stats(tile_graph(build_graph(s, r, None, n)))["utilization"]
    rowptr, col, _ = native.build_csr(s.astype(np.int32), r.astype(np.int32), n)
    order = native.rcm_order(rowptr, col, n)
    s2, r2, _ = native.apply_reorder(order, s, r)
    u_good = tile_stats(tile_graph(build_graph(s2, r2, None, n)))["utilization"]
    assert u_good > u_bad * 1.5, (u_bad, u_good)


def test_numpy_fallback_matches_native(edges, monkeypatch):
    s, r, n = edges
    got_native = native.build_csr(s, r, n)
    got_rcm = native.rcm_order(got_native[0], got_native[1], n)
    # force the fallback path
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    got_np = native.build_csr(s, r, n)
    for a, b in zip(got_native[:2], got_np[:2]):
        np.testing.assert_array_equal(a, b)
    rcm_np = native.rcm_order(got_np[0], got_np[1], n)
    np.testing.assert_array_equal(got_rcm, rcm_np)
