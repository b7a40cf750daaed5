"""Corner-turn permutation kernel (ops/corner.py) and the uniform-graph
expand+turn+scatter SpMM (ops/large.py) — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.ops.corner import (
    corner_permute,
    permute_rows,
    plan_corner_turn,
    plan_pair,
)
from pygat_tpu.ops.large import plan_csc_to_csr, spmm_corner_graph, stream_expand
from pygat_tpu.ops.spmm import spmm_graph


@pytest.mark.parametrize("mode", ["take", "onehot"])
def test_corner_permute_exact(mode):
    rng = np.random.default_rng(0)
    e, l = 4096, 64
    dest = rng.permutation(e)
    plan, plan_inv = plan_pair(dest)
    x = jnp.asarray(rng.standard_normal((e, l)).astype(np.float32))
    want = np.empty((e, l), np.float32)
    want[dest] = np.asarray(x)
    got = np.asarray(corner_permute(x, plan, mode=mode))
    atol = 0.0 if mode == "take" else 1e-4
    np.testing.assert_allclose(got, want, atol=atol)
    # round trip through the inverse plan
    back = np.asarray(corner_permute(jnp.asarray(got), plan_inv, mode=mode))
    np.testing.assert_allclose(back, np.asarray(x), atol=2 * atol)


def test_corner_multipass():
    """A row count large enough to force multiple radix passes."""
    rng = np.random.default_rng(1)
    e = 128 * 1024  # T=1024 -> 2+ passes under the span cap
    dest = rng.permutation(e)
    plan = plan_corner_turn(dest)
    assert len(plan.passes) >= 2
    # measured spans stay under the planner's cap
    from pygat_tpu.ops.corner import _P_MAX

    assert all(cp.p <= 2 * _P_MAX for cp in plan.passes), \
        [cp.p for cp in plan.passes]
    x = jnp.asarray(rng.standard_normal((e, 8)).astype(np.float32))
    got = np.asarray(corner_permute(x, plan))
    want = np.empty_like(got)
    want[dest] = np.asarray(x)
    np.testing.assert_allclose(got, want, atol=0.0)


def test_permute_rows_grad_under_jit():
    rng = np.random.default_rng(2)
    e, l = 2048, 32
    dest = rng.permutation(e)
    plan, plan_inv = plan_pair(dest)
    x = jnp.asarray(rng.standard_normal((e, l)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((e, l)).astype(np.float32))
    gx = jax.jit(jax.grad(
        lambda x_: (permute_rows(x_, plan, plan_inv) * c).sum()))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(c)[dest], atol=0.0)


@pytest.fixture(scope="module")
def uniform():
    rng = np.random.default_rng(0)
    n, deg = 1024, 8
    base = np.repeat(np.arange(n, dtype=np.int64), deg)
    send = rng.integers(0, n, base.shape[0])  # uniform: panels degenerate
    send = np.concatenate([send, np.arange(n)])
    recv = np.concatenate([base, np.arange(n)])
    g = build_graph(send, recv, None, n)
    x = jnp.asarray(rng.standard_normal((g.num_nodes_padded, 64)).astype(np.float32))
    w = jnp.asarray(rng.random(g.senders.shape[0]).astype(np.float32))
    return g, x, w


def test_stream_expand_matches_take(uniform):
    """Expand over the receiver stream == x[receivers] on live slots."""
    g, x, _ = uniform
    got = stream_expand(x, g.r_local, g.r_chunk, g.num_nodes_padded,
                        "high", True)
    live = np.asarray(g.r_local) < 128
    want = np.asarray(x)[np.asarray(g.receivers)]
    np.testing.assert_allclose(np.asarray(got)[live], want[live], atol=0.0)
    assert np.abs(np.asarray(got)[~live]).max() == 0.0


def test_spmm_corner_matches(uniform):
    g, x, w = uniform
    plans = plan_csc_to_csr(g)
    want = np.asarray(spmm_graph(jnp.where(g.edge_mask, w, 0.0), x, g))
    got = np.asarray(spmm_corner_graph(w, x, g, plans))
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())


def test_spmm_corner_grads(uniform):
    g, x, w = uniform
    plans = plan_csc_to_csr(g)
    f = jax.jit(jax.grad(
        lambda v, d: (spmm_corner_graph(v, d, g, plans) ** 2).sum(),
        argnums=(0, 1)))
    gw, gx = f(w, x)
    fr = jax.grad(
        lambda v, d: (spmm_graph(jnp.where(g.edge_mask, v, 0.0), d, g) ** 2).sum(),
        argnums=(0, 1))
    gw_r, gx_r = fr(w, x)
    sw = float(jnp.abs(gw_r).max()) + 1e-6
    sx = float(jnp.abs(gx_r).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r), atol=3e-3 * sw)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=3e-3 * sx)


def test_spmm_corner_bucketed_empty_tiles():
    """Explicit (n_pad, e_pad) bucket with empty tiles still exact."""
    rng = np.random.default_rng(5)
    n = 150
    s = np.concatenate([rng.integers(0, n, 600), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, 600), np.arange(n)])
    g = build_graph(s, r, None, n, n_pad=512, e_pad=2048)
    plans = plan_csc_to_csr(g)
    x = jnp.asarray(rng.standard_normal((512, 32)).astype(np.float32))
    w = jnp.asarray(rng.random(g.senders.shape[0]).astype(np.float32))
    want = np.asarray(spmm_graph(jnp.where(g.edge_mask, w, 0.0), x, g))
    got = np.asarray(spmm_corner_graph(w, x, g, plans))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())
