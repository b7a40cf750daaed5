"""Panel-decomposed gather SpMM (ops/panel.py) vs the scatter/stream
reference — forward (both gather modes), overflow path, gradients;
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.ops.panel import build_panel_layout, panel_spmm_graph
from pygat_tpu.ops.spmm import spmm_graph


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(0)
    n, deg = 1024, 8
    base = np.repeat(np.arange(n, dtype=np.int64), deg)
    send = np.clip(base + rng.integers(-200, 200, base.shape[0]), 0, n - 1)
    send = np.concatenate([send, np.arange(n)])
    recv = np.concatenate([base, np.arange(n)])
    g = build_graph(send, recv, None, n)
    x = jnp.asarray(rng.standard_normal((g.num_nodes_padded, 64)).astype(np.float32))
    w = jnp.asarray(rng.random(g.senders.shape[0]).astype(np.float32))
    want = np.asarray(spmm_graph(jnp.where(g.edge_mask, w, 0.0), x, g))
    return g, x, w, want


@pytest.mark.parametrize("mode", ["onehot", "take"])
def test_panel_spmm_matches(clustered, mode):
    g, x, w, want = clustered
    lay = build_panel_layout(g)
    assert lay.n_overflow == 0  # +-200 locality fits the panels
    got = np.asarray(panel_spmm_graph(w, x, g, lay, precision="high",
                                      mode=mode))
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())


def test_panel_overflow_path(clustered):
    """A tight p_max cap pushes long-range edges through the XLA overflow
    pass; the result is still exact."""
    g, x, w, want = clustered
    lay = build_panel_layout(g, p_max=2)
    assert lay.n_panels == 2 and lay.n_overflow > 0
    got = np.asarray(panel_spmm_graph(w, x, g, lay, precision="high"))
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())


def test_panel_gradients(clustered):
    g, x, w, _ = clustered
    lay = build_panel_layout(g)

    def f(fn):
        return jax.grad(lambda v, d: (fn(v, d) ** 2).sum(), argnums=(0, 1))

    gw, gx = f(lambda v, d: panel_spmm_graph(v, d, g, lay, precision="high"))(w, x)
    gw_r, gx_r = f(
        lambda v, d: spmm_graph(jnp.where(g.edge_mask, v, 0.0), d, g)
    )(w, x)
    sw = float(jnp.abs(gw_r).max())
    sx = float(jnp.abs(gx_r).max())
    # reference backward runs the bf16-class stream kernels
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=3e-3 * sw)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=3e-3 * sx)


def test_panel_empty_tiles():
    """Bucketed shapes: real rows only in the low tiles -> empty output
    tiles and all-dead chunks still produce exact zeros."""
    rng = np.random.default_rng(3)
    n = 150
    s = np.concatenate([rng.integers(0, n, 600), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, 600), np.arange(n)])
    g = build_graph(s, r, None, n, n_pad=512, e_pad=2048)
    lay = build_panel_layout(g)
    x = jnp.asarray(rng.standard_normal((512, 32)).astype(np.float32))
    w = jnp.asarray(rng.random(g.senders.shape[0]).astype(np.float32))
    want = np.asarray(spmm_graph(jnp.where(g.edge_mask, w, 0.0), x, g))
    got = np.asarray(panel_spmm_graph(w, x, g, lay, precision="high"))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())
    assert np.abs(got[192:]).max() == 0.0  # tiles past the real rows


def test_panel_corner_backward_matches(clustered):
    """plans= swaps the panel backward for the gather-free corner route
    (expand + corner-turn + CSC stream scatter): forward must be identical
    and grads must match the XLA backward."""
    from pygat_tpu.ops.large import plan_csc_to_csr

    g, x, w, _ = clustered
    lay = build_panel_layout(g)
    plans = plan_csc_to_csr(g)

    out_c = panel_spmm_graph(w, x, g, lay, plans=plans, precision="high")
    out_x = panel_spmm_graph(w, x, g, lay, precision="high")
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_x))

    def f(fn):
        return jax.grad(lambda v, d: (fn(v, d) ** 2).sum(), argnums=(0, 1))

    gw_c, gx_c = f(lambda v, d: panel_spmm_graph(
        v, d, g, lay, plans=plans, precision="high"))(w, x)
    gw_x, gx_x = f(lambda v, d: panel_spmm_graph(
        v, d, g, lay, precision="high"))(w, x)
    sw = float(jnp.abs(gw_x).max())
    sx = float(jnp.abs(gx_x).max())
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_x),
                               atol=3e-3 * sw)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_x),
                               atol=3e-3 * sx)
