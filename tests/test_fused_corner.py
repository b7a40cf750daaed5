"""Gather-free fused attention (ops/fused_corner.py) vs the take-based
fused stream path — op-level and model-level, v1 and v2, interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from pygat_tpu.graph import build_graph
from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
from pygat_tpu.ops import fused_corner as fc
from pygat_tpu.ops import fused_stream as fs
from pygat_tpu.ops import segment as seg
from pygat_tpu.ops.large import plan_csc_to_csr


def _graph(n, deg, seed, **kw):
    rng = np.random.default_rng(seed)
    s = np.concatenate([rng.integers(0, n, n * deg), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, n * deg), np.arange(n)])
    g = build_graph(s, r, None, n, **kw)
    assert g.r_local is not None
    return g, rng


@pytest.fixture(scope="module")
def setup():
    g, rng = _graph(300, 6, 3)
    plans = plan_csc_to_csr(g)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32))
    return g, plans, x


def _cfg(lt):
    return GATConfig(nlayers=2, nheads=(4, 2), nfeats=(32, 16, 4),
                     dropout=0.6, alpha=0.2, layer_type=lt,
                     skip_connection=True)


def _run(params, cfg, x, g, plans, train=False):
    key = jax.random.PRNGKey(1)

    def loss(p):
        with seg.use_impl("stream"):
            out = apply_gat(p, cfg, x, g, key, train=train, plans=plans)
        return jnp.sum(jnp.sin(out)), out

    prev = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = "high"
    try:
        (lv, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
    finally:
        seg._STREAM_PRECISION = prev
    return out, ravel_pytree(grads)[0]


@pytest.mark.parametrize("lt", ["GAT_sparse", "GATv2_sparse"])
@pytest.mark.parametrize("train", [False, True])
def test_corner_model_matches_take(setup, lt, train):
    """Full 2-layer model with corner plans == the take-based fused path,
    forward AND parameter grads. Train mode draws identical dropout masks
    (same key, same _att_keepq site), so outputs must match too."""
    g, plans, x = setup
    cfg = _cfg(lt)
    params = init_gat(jax.random.PRNGKey(0), cfg)
    out_c, gr_c = _run(params, cfg, x, g, plans, train=train)
    out_t, gr_t = _run(params, cfg, x, g, None, train=train)
    assert bool(jnp.isfinite(out_c).all())
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_t),
                               atol=2e-4, rtol=1e-4)
    scale = float(jnp.abs(gr_t).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(gr_c), np.asarray(gr_t),
                               atol=5e-5 * scale)


def test_corner_op_v1_multipass():
    """Op-level parity with a forced multi-pass corner plan (tiny p_cap
    makes t >> cap on a small graph: group alignment, re-windowed tiles
    and the overflow fix-up all engage), with a nontrivial keepq."""
    g, rng = _graph(800, 5, 5)
    plans = plan_csc_to_csr(g, p_cap=3)
    assert len(plans.fwd.passes) >= 2, [cp.p for cp in plans.fwd.passes]
    h, f = 4, 16
    n_pad = g.num_nodes_padded
    e = g.num_edges_padded
    wh = jnp.asarray(rng.standard_normal((n_pad, h * f)).astype(np.float32))
    f_dst = jnp.asarray(rng.standard_normal((n_pad, h)).astype(np.float32))
    bound = jnp.abs(jnp.asarray(
        rng.standard_normal((n_pad, h)).astype(np.float32))) + 1.0
    a_src = jnp.asarray(rng.standard_normal((h, f)).astype(np.float32) * 0.1)
    keepq = jnp.asarray(
        (rng.random((e, h)) > 0.4).astype(np.float32) / 0.6)

    def run_corner(wh, f_dst, a_src):
        out, den = fc.fused_v1_attention_corner(
            wh, f_dst, bound, a_src, keepq, g, plans,
            alpha=0.2, precision="high", interpret=True)
        return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(den)), (out, den)

    def run_take(wh, f_dst, a_src):
        out, den = fs.fused_v1_attention(
            wh, f_dst, bound, a_src, keepq, g.senders, g.receivers,
            g.r_local, g.r_chunk, g.c_slot, g.c_local, g.c_chunk,
            0.2, "high", True)
        return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(den)), (out, den)

    (lc, (oc, dc)), gc = jax.value_and_grad(run_corner, argnums=(0, 1, 2),
                                            has_aux=True)(wh, f_dst, a_src)
    (lt, (ot, dt)), gt = jax.value_and_grad(run_take, argnums=(0, 1, 2),
                                            has_aux=True)(wh, f_dst, a_src)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(ot),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dt),
                               atol=1e-4, rtol=1e-4)
    for c, t in zip(gc, gt):
        scale = float(jnp.abs(t).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(c), np.asarray(t),
                                   atol=1e-4 * scale)


def test_corner_op_v2_multipass():
    g, rng = _graph(800, 5, 6)
    plans = plan_csc_to_csr(g, p_cap=3)
    h, f = 4, 16
    n_pad = g.num_nodes_padded
    e = g.num_edges_padded
    whi = jnp.asarray(rng.standard_normal((n_pad, h * f)).astype(np.float32))
    whj = jnp.asarray(rng.standard_normal((n_pad, h * f)).astype(np.float32))
    ub = jnp.abs(jnp.asarray(
        rng.standard_normal((n_pad, h)).astype(np.float32))) + 1.0
    a = jnp.asarray(rng.standard_normal((h, f)).astype(np.float32) * 0.1)
    keepq = jnp.asarray(
        (rng.random((e, h)) > 0.4).astype(np.float32) / 0.6)

    def run_corner(whi, whj, a):
        out, den = fc.fused_v2_attention_corner(
            whi, whj, ub, a, keepq, g, plans,
            alpha=0.2, precision="high", interpret=True)
        return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(den)), (out, den)

    def run_take(whi, whj, a):
        out, den = fs.fused_v2_attention(
            whi, whj, ub, a, keepq, g.senders, g.receivers,
            g.r_local, g.r_chunk, g.c_slot, g.c_local, g.c_chunk,
            0.2, "high", True)
        return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(den)), (out, den)

    (lc, (oc, dc)), gc = jax.value_and_grad(run_corner, argnums=(0, 1, 2),
                                            has_aux=True)(whi, whj, a)
    (lt, (ot, dt)), gt = jax.value_and_grad(run_take, argnums=(0, 1, 2),
                                            has_aux=True)(whi, whj, a)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(ot),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(dt),
                               atol=1e-4, rtol=1e-4)
    for c, t in zip(gc, gt):
        scale = float(jnp.abs(t).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(c), np.asarray(t),
                                   atol=1e-4 * scale)


def test_corner_bucketed_graph(setup):
    """Bucketed (explicit pads) graph: empty tiles, all-dead chunks, dead
    CSC slots — the corner path must stay finite and match."""
    rng = np.random.default_rng(11)
    n = 140
    s = np.concatenate([rng.integers(0, n, 500), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, 500), np.arange(n)])
    g = build_graph(s, r, None, n, n_pad=512, e_pad=2048)
    plans = plan_csc_to_csr(g)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32))
    cfg = _cfg("GAT_sparse")
    params = init_gat(jax.random.PRNGKey(0), cfg)
    out_c, gr_c = _run(params, cfg, x, g, plans)
    out_t, gr_t = _run(params, cfg, x, g, None)
    assert bool(jnp.isfinite(out_c).all())
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_t),
                               atol=2e-4, rtol=1e-4)
    scale = float(jnp.abs(gr_t).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(gr_c), np.asarray(gr_t),
                               atol=5e-5 * scale)


def test_corner_threads_through_train_steps():
    """plans= threads from the train-step factories into the fused layers:
    one train step with the corner window build must produce the SAME loss
    and next-step params as the take build (identical windows -> identical
    arithmetic), and set_corner('on') must make maybe_plan_corner return
    plans for small graphs."""
    import optax

    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.ops import segment as seg
    from pygat_tpu.ops.large import maybe_plan_corner, set_corner
    from pygat_tpu.train.loop import make_transductive_steps
    from pygat_tpu.train.state import init_state

    rng = np.random.default_rng(5)
    n = 300
    s = np.concatenate([rng.integers(0, n, n * 5), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, n * 5), np.arange(n)])
    g = build_graph(s, r, None, n)
    assert maybe_plan_corner(g) is None  # auto: far below the N threshold
    set_corner("on")
    try:
        plans = maybe_plan_corner(g)
        assert plans is not None
    finally:
        set_corner("auto")

    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, g.num_nodes_padded))
    idx = jnp.arange(128)
    cfg = GATConfig(nlayers=2, nheads=(4, 1), nfeats=(32, 8, 4),
                    dropout=0.6, alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(3), cfg)
    tx = optax.adam(5e-3)

    results = []
    for p in (plans, None):
        with seg.use_impl("stream"):
            train_step, _ = make_transductive_steps(
                cfg, tx, segment_impl="stream", plans=p)
            state = init_state(params, tx, jax.random.PRNGKey(0))
            state2, loss, acc, _ = train_step(state, x, g, labels, idx)
        results.append((float(loss), state2.params))
    assert results[0][0] == results[1][0]
    for a, b in zip(jax.tree_util.tree_leaves(results[0][1]),
                    jax.tree_util.tree_leaves(results[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
