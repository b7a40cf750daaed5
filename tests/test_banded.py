"""Banded window build (ops/banded.py) vs the take-based paths — plan
invariants, the window-gather kernel, fused v1/v2 ops (fwd + grads), SpMM,
and the model-level dispatch. Interpret mode on the CPU mesh; the
compiled-Mosaic twin lives under the ``tpu`` marker (test_tpu_compiled.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from pygat_tpu.graph import build_graph
from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
from pygat_tpu.ops import banded as bd
from pygat_tpu.ops import fused_stream as fs
from pygat_tpu.ops import segment as seg
from pygat_tpu.ops.stream import DEAD, EC, TILE


def _graph(n, deg, seed, spread=None, **kw):
    """spread=None: uniform senders; spread=k: clustered within +-k."""
    rng = np.random.default_rng(seed)
    base = np.repeat(np.arange(n, dtype=np.int64), deg)
    if spread is None:
        s = rng.integers(0, n, base.shape[0])
    else:
        s = np.clip(base + rng.integers(-spread, spread, base.shape[0]),
                    0, n - 1)
    s = np.concatenate([s, np.arange(n)])
    r = np.concatenate([base, np.arange(n)])
    g = build_graph(s, r, None, n, **kw)
    assert g.r_local is not None
    return g, rng


def _plan_invariants(g, plan):
    n_pad = g.num_nodes_padded
    w = plan.w
    s_loc = np.asarray(plan.s_loc)
    r_local = np.asarray(plan.r_local)
    band = np.asarray(plan.band)
    r_chunk = np.asarray(plan.r_chunk)
    senders = np.asarray(plan.senders)
    receivers = np.asarray(plan.receivers)
    live = r_local != DEAD
    assert plan.num_slots == plan.num_chunks * EC
    assert plan.num_chunks % 8 == 0
    # chunk tiles non-decreasing, all tiles visited
    assert (np.diff(r_chunk) >= 0).all()
    assert set(range(n_pad // TILE)) == set(r_chunk.tolist())
    # bands keep the window in range
    assert (band >= 0).all() and (band + w <= n_pad // TILE).all()
    # live slots decode to the right nodes
    slot_chunk = np.arange(plan.num_slots) // EC
    assert (s_loc[live] >= 0).all() and (s_loc[live] < w * TILE).all()
    assert (senders[live]
            == band[slot_chunk[live]] * TILE + s_loc[live]).all()
    assert (receivers[live]
            == r_chunk[slot_chunk[live]] * TILE + r_local[live]).all()
    # dead slots are inert
    assert (s_loc[~live] == w * TILE).all()
    # every real edge appears exactly once (multiset match on (s, r))
    mask = np.asarray(g.edge_mask)
    ref = sorted(zip(np.asarray(g.senders)[mask].tolist(),
                     np.asarray(g.receivers)[mask].tolist()))
    got = sorted(zip(senders[live].tolist(), receivers[live].tolist()))
    assert ref == got
    perm = plan.perm
    assert (perm[live] >= 0).all() and (perm[~live] == -1).all()
    assert len(set(perm[live].tolist())) == live.sum()


@pytest.mark.parametrize("spread", [None, 300])
def test_band_plan_invariants(spread):
    g, _ = _graph(700, 5, 0, spread=spread)
    plan = bd.build_band_plan(g, w=3)
    _plan_invariants(g, plan)
    if spread is not None:
        assert plan.fill > 0.5  # clustered graphs pack well


def test_band_plan_window_clip():
    # tiny graph: window wider than the table must clamp, not crash
    g, _ = _graph(100, 3, 1)
    plan = bd.build_band_plan(g, w=64)
    assert plan.w == g.num_nodes_padded // TILE
    _plan_invariants(g, plan)


@pytest.mark.parametrize("exact", [True, False])
def test_banded_take_matches_gather(exact):
    g, rng = _graph(900, 6, 2, spread=250)
    plan = bd.build_band_plan(g, w=4)
    tab = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 72)).astype(np.float32))
    out = bd.banded_take(tab, plan, exact=exact, interpret=True)
    ref_tab = np.asarray(tab if exact
                         else tab.astype(jnp.bfloat16).astype(jnp.float32))
    ref = ref_tab[np.asarray(plan.senders)]
    ref[np.asarray(plan.r_local) == DEAD] = 0.0
    np.testing.assert_array_equal(np.asarray(out, np.float32), ref)


def _fused_operands(g, rng, h=4, f=16):
    n_pad = g.num_nodes_padded
    hf = h * f
    wh = jnp.asarray(rng.standard_normal((n_pad, hf)).astype(np.float32))
    whj = jnp.asarray(rng.standard_normal((n_pad, hf)).astype(np.float32))
    f_dst = jnp.asarray(rng.standard_normal((n_pad, h)).astype(np.float32))
    bound = jnp.abs(f_dst) + 2.0
    a = jnp.asarray(rng.standard_normal((h, f)).astype(np.float32) * 0.1)
    return wh, whj, f_dst, bound, a


def test_fused_v1_banded_matches_stream():
    g, rng = _graph(800, 6, 3, spread=220)
    plan = bd.build_band_plan(g, w=4)
    wh, whj, f_dst, bound, a = _fused_operands(g, rng)
    ones_r = jnp.ones((g.num_edges_padded, 4), jnp.float32)
    ones_b = jnp.ones((plan.num_slots, 4), jnp.float32)

    def loss_ref(wh, f_dst, a):
        o, d = fs.fused_v1_attention(
            wh, f_dst, bound, a, ones_r, g.senders, g.receivers,
            g.r_local, g.r_chunk, g.c_slot, g.c_local, g.c_chunk,
            0.2, "high", True)
        return (o * whj).sum() + (d ** 2).sum(), (o, d)

    def loss_band(wh, f_dst, a):
        o, d = bd.fused_v1_attention_banded(
            wh, f_dst, bound, a, ones_b, plan,
            alpha=0.2, precision="high", interpret=True)
        return (o * whj).sum() + (d ** 2).sum(), (o, d)

    (lr, (o_r, d_r)), g_r = jax.value_and_grad(loss_ref, (0, 1, 2),
                                               has_aux=True)(wh, f_dst, a)
    (lb, (o_b, d_b)), g_b = jax.value_and_grad(loss_band, (0, 1, 2),
                                               has_aux=True)(wh, f_dst, a)
    np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_r),
                               rtol=1e-5, atol=1e-5)
    for rr, bb in zip(g_r, g_b):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(rr),
                                   rtol=2e-4, atol=2e-5)


def test_fused_v2_banded_matches_stream():
    g, rng = _graph(800, 6, 4, spread=220)
    plan = bd.build_band_plan(g, w=4)
    whi, whj, f_dst, ub, a = _fused_operands(g, rng)
    ones_r = jnp.ones((g.num_edges_padded, 4), jnp.float32)
    ones_b = jnp.ones((plan.num_slots, 4), jnp.float32)

    def loss_ref(whi, whjx, a):
        o, d = fs.fused_v2_attention(
            whi, whjx, ub, a, ones_r, g.senders, g.receivers,
            g.r_local, g.r_chunk, g.c_slot, g.c_local, g.c_chunk,
            0.2, "high", True)
        return (o * whj).sum() + (d ** 2).sum(), (o, d)

    def loss_band(whi, whjx, a):
        o, d = bd.fused_v2_attention_banded(
            whi, whjx, ub, a, ones_b, plan,
            alpha=0.2, precision="high", interpret=True)
        return (o * whj).sum() + (d ** 2).sum(), (o, d)

    (lr, (o_r, d_r)), g_r = jax.value_and_grad(loss_ref, (0, 1, 2),
                                               has_aux=True)(whi, whj, a)
    (lb, (o_b, d_b)), g_b = jax.value_and_grad(loss_band, (0, 1, 2),
                                               has_aux=True)(whi, whj, a)
    np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_r),
                               rtol=1e-5, atol=1e-5)
    for rr, bb in zip(g_r, g_b):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(rr),
                                   rtol=2e-4, atol=2e-5)


def test_spmm_banded_matches_spmm_graph():
    from pygat_tpu.ops.spmm import spmm_graph

    g, rng = _graph(600, 5, 5, spread=200)
    plan = bd.build_band_plan(g, w=4)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 48)).astype(np.float32))
    vals = jnp.asarray(
        rng.standard_normal(g.num_edges_padded).astype(np.float32))
    prev = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = "high"  # match the banded call's limb count
    try:
        with seg.use_impl("stream"):
            ref = spmm_graph(vals, x, g)
    finally:
        seg._STREAM_PRECISION = prev
    # the same per-edge values permuted into banded order (host-side)
    perm = plan.perm
    vals_b = np.zeros(plan.num_slots, np.float32)
    live = perm >= 0
    vals_b[live] = np.asarray(vals)[perm[live]]
    got = bd.spmm_banded(jnp.asarray(vals_b), x, plan,
                         precision="high", interpret=True, fused=False)
    # both sides are two-limb (~1e-5 relative) reductions over different
    # summation orders
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    # fused single-pass kernel == two-pass composition (same banded order,
    # same precision class)
    got_f = bd.spmm_banded(jnp.asarray(vals_b), x, plan,
                           precision="high", interpret=True, fused=True)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(got),
                               rtol=5e-4, atol=5e-4)


def test_spmm_banded_fused_grads_match_oracle():
    """Custom VJP of the fused banded SpMM vs a numpy oracle over the
    plan's live slots (dvals = <g_out[recv], x[send]>, dx = sender
    scatter of vals * g_out[recv])."""
    g, rng = _graph(520, 4, 11, spread=150)
    plan = bd.build_band_plan(g, w=4)
    n_pad = g.num_nodes_padded
    x = jnp.asarray(rng.standard_normal((n_pad, 40)).astype(np.float32))
    vals_b = np.zeros(plan.num_slots, np.float32)
    live = plan.perm >= 0
    vals_b[live] = rng.standard_normal(int(live.sum())).astype(np.float32)
    ct = jnp.asarray(
        rng.standard_normal((n_pad, 40)).astype(np.float32))

    def loss(v, xx):
        out = bd.spmm_banded(v, xx, plan, precision="high", interpret=True)
        return jnp.sum(out * ct)

    dv, dx = jax.grad(loss, (0, 1))(jnp.asarray(vals_b), x)

    s = np.asarray(plan.senders)
    r = np.asarray(plan.receivers)
    rc = np.asarray(plan.r_chunk)
    glob_r = rc[np.arange(plan.num_slots) // EC] * TILE \
        + np.asarray(plan.r_local)
    ctn, xn = np.asarray(ct), np.asarray(x)
    dv_ref = np.zeros(plan.num_slots, np.float32)
    dv_ref[live] = (ctn[glob_r[live]] * xn[s[live]]).sum(1)
    dx_ref = np.zeros_like(xn)
    np.add.at(dx_ref, s[live], vals_b[live, None] * ctn[glob_r[live]])
    np.testing.assert_allclose(np.asarray(dv)[live], dv_ref[live],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dx), dx_ref,
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("lt", ["GAT_sparse", "GATv2_sparse"])
@pytest.mark.parametrize("train", [False, True])
def test_banded_model_matches_take(lt, train):
    """apply_gat(plans=BandPlan) == apply_gat(plans=None), fwd and grads
    (eval deterministic exact-class; train differs only in rng streams, so
    compare eval outputs + train finiteness)."""
    g, rng = _graph(500, 6, 6, spread=180)
    plan = bd.build_band_plan(g, w=4)
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(32, 16, 4),
                    dropout=0.6, alpha=0.2, layer_type=lt,
                    skip_connection=True)
    params = init_gat(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def loss(p, plans):
        with seg.use_impl("stream"):
            out = apply_gat(p, cfg, x, g, key, train=train, plans=plans)
        return jnp.sum(jnp.sin(out)), out

    prev = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = "high"
    try:
        (l_t, o_t), g_t = jax.value_and_grad(loss, has_aux=True)(params, None)
        (l_b, o_b), g_b = jax.value_and_grad(loss, has_aux=True)(params, plan)
    finally:
        seg._STREAM_PRECISION = prev
    if train:
        # different rng consumption order (banded slots) — just finiteness
        assert np.isfinite(np.asarray(o_b)).all()
        assert np.isfinite(ravel_pytree(g_b)[0]).all()
    else:
        # high-mode two-limb reductions in different summation orders:
        # ~1e-5-relative noise compounded over two layers
        np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_t),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(ravel_pytree(g_b)[0],
                                   ravel_pytree(g_t)[0],
                                   rtol=1e-3, atol=1e-3)


def test_maybe_plan_band_gating(monkeypatch):
    g, _ = _graph(600, 5, 7, spread=200)
    monkeypatch.setattr(bd, "_BAND_MODE", "auto")
    monkeypatch.setattr(bd, "_BAND_N", 10**6)
    assert bd.maybe_plan_band(g) is None  # below threshold
    monkeypatch.setattr(bd, "_BAND_N", 0)
    plan = bd.maybe_plan_band(g)
    assert plan is not None and isinstance(plan, bd.BandPlan)
    monkeypatch.setattr(bd, "_BAND_MODE", "off")
    assert bd.maybe_plan_band(g) is None
    # poor locality in auto mode falls back to take
    gu, _ = _graph(2000, 2, 8, spread=None)  # uniform, low degree
    monkeypatch.setattr(bd, "_BAND_MODE", "auto")
    monkeypatch.setattr(bd, "_BAND_N", 0)
    pu = bd.build_band_plan(gu, w=4)
    if pu.fill < bd._BAND_MIN_FILL:
        assert bd.maybe_plan_band(gu) is None
    monkeypatch.setattr(bd, "_BAND_MODE", "on")
    assert bd.maybe_plan_band(gu) is not None
