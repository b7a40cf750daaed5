"""Compiled-Mosaic gate: every Pallas kernel family lowered on the REAL
TPU (no interpret mode) and checked against an XLA/numpy oracle.

Interpret mode has hidden two compile-breaking bugs already (multi-vreg
gather, matmul operand precision — CLAUDE.md), and one more this round
(bf16 matmul accumulators are rejected by Mosaic). Run before every
snapshot:

    PYGAT_TPU_TESTS=1 python -m pytest -m tpu -q

Under the default CPU-mesh conftest these all skip (the ``tpu`` marker +
skipif). Tolerances are f32-class where the kernel path is exact-select /
two-limb ('high') and bf16-class for 'fastest'.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_ON_TPU = os.environ.get("PYGAT_TPU_TESTS") == "1"

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not _ON_TPU,
        reason="compiled-Mosaic tests need the real TPU (PYGAT_TPU_TESTS=1)",
    ),
]


def _clustered_graph(n=4096, deg=8, seed=0):
    from pygat_tpu.graph import build_graph

    rng = np.random.default_rng(seed)
    base = np.repeat(np.arange(n, dtype=np.int64), deg)
    s = np.clip(base + rng.integers(-700, 700, base.shape[0]), 0, n - 1)
    s = np.concatenate([s, np.arange(n)])
    r = np.concatenate([base, np.arange(n)])
    return build_graph(s, r, None, n), rng


@pytest.fixture(scope="module")
def gr():
    assert jax.default_backend() == "tpu"
    return _clustered_graph()


def _oracle_spmm(g, vals, x):
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    m = np.asarray(g.edge_mask)
    out = np.zeros((g.num_nodes_padded, x.shape[1]), np.float32)
    np.add.at(out, r[m], np.asarray(vals)[m, None] * np.asarray(x)[s[m]])
    return out


def test_compiled_stream_spmm(gr):
    from pygat_tpu.ops import segment as seg
    from pygat_tpu.ops.spmm import spmm_graph

    g, rng = gr
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 96)).astype(np.float32))
    vals = jnp.asarray(
        rng.standard_normal(g.num_edges_padded).astype(np.float32))
    prev = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = "high"
    try:
        with seg.use_impl("stream"):
            out = jax.jit(spmm_graph)(vals, x, g)
    finally:
        seg._STREAM_PRECISION = prev
    ref = _oracle_spmm(g, vals, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def _fused_operands(g, rng, h=4, f=32):
    n_pad = g.num_nodes_padded
    hf = h * f
    wh = jnp.asarray(rng.standard_normal((n_pad, hf)).astype(np.float32))
    whj = jnp.asarray(rng.standard_normal((n_pad, hf)).astype(np.float32))
    f_dst = jnp.asarray(rng.standard_normal((n_pad, h)).astype(np.float32))
    bound = jnp.abs(f_dst) + 2.0
    a = jnp.asarray(rng.standard_normal((h, f)).astype(np.float32) * 0.1)
    return wh, whj, f_dst, bound, a


def _oracle_v1(g, wh, f_dst, bound, a, alpha=0.2):
    n_pad, hf = wh.shape
    h, f = a.shape
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    m = np.asarray(g.edge_mask)
    whn = np.asarray(wh)
    l_src = (whn.reshape(n_pad, h, f) * np.asarray(a)).sum(-1)  # [N, H]
    raw = np.asarray(f_dst)[r] + l_src[s]
    lk = np.where(raw >= 0, raw, alpha * raw)
    num = np.where(m[:, None], np.exp(lk - np.asarray(bound)[r]), 0.0)
    out = np.zeros((n_pad, hf), np.float32)
    den = np.zeros((n_pad, h), np.float32)
    np.add.at(den, r, num)
    np.add.at(out, r, whn[s] * np.repeat(num, f, axis=1))
    return out, den


@pytest.mark.parametrize("precision", ["fastest", "high"])
def test_compiled_fused_v1_take(gr, precision):
    from pygat_tpu.ops.fused_stream import fused_v1_attention

    g, rng = gr
    wh, whj, f_dst, bound, a = _fused_operands(g, rng)
    kq = jnp.ones((g.num_edges_padded, 4), jnp.float32)

    def loss(wh, f_dst, a):
        o, d = fused_v1_attention(
            wh, f_dst, bound, a, kq, g.senders, g.receivers, g.r_local,
            g.r_chunk, g.c_slot, g.c_local, g.c_chunk, 0.2, precision,
            False)
        return (o * whj).sum() + (d ** 2).sum(), (o, d)

    (_, (o, d)), grads = jax.jit(
        jax.value_and_grad(loss, (0, 1, 2), has_aux=True))(wh, f_dst, a)
    ro, rd = _oracle_v1(g, wh, f_dst, bound, a)
    tol = 1e-3 if precision == "high" else 5e-2
    np.testing.assert_allclose(np.asarray(o), ro, rtol=tol, atol=tol * 10)
    np.testing.assert_allclose(np.asarray(d), rd, rtol=tol, atol=tol)
    assert all(np.isfinite(np.asarray(x)).all() for x in grads)


@pytest.mark.parametrize("precision", ["fastest", "high"])
def test_compiled_fused_banded_v1(gr, precision):
    from pygat_tpu.ops.banded import build_band_plan, fused_v1_attention_banded

    g, rng = gr
    plan = build_band_plan(g, w=4)
    wh, whj, f_dst, bound, a = _fused_operands(g, rng)
    kq = jnp.ones((plan.num_slots, 4), jnp.float32)

    def loss(wh, f_dst, a):
        o, d = fused_v1_attention_banded(
            wh, f_dst, bound, a, kq, plan, alpha=0.2, precision=precision,
            interpret=False)
        return (o * whj).sum() + (d ** 2).sum(), (o, d)

    (_, (o, d)), grads = jax.jit(
        jax.value_and_grad(loss, (0, 1, 2), has_aux=True))(wh, f_dst, a)
    ro, rd = _oracle_v1(g, wh, f_dst, bound, a)
    tol = 1e-3 if precision == "high" else 5e-2
    np.testing.assert_allclose(np.asarray(o), ro, rtol=tol, atol=tol * 10)
    np.testing.assert_allclose(np.asarray(d), rd, rtol=tol, atol=tol)
    assert all(np.isfinite(np.asarray(x)).all() for x in grads)


def test_compiled_fused_v2_take_vs_banded(gr):
    """v2 compiled: take path and banded path agree with each other (both
    exact-class in 'high') — cross-check without a third oracle."""
    from pygat_tpu.ops.banded import build_band_plan, fused_v2_attention_banded
    from pygat_tpu.ops.fused_stream import fused_v2_attention

    g, rng = gr
    plan = build_band_plan(g, w=4)
    whi, whj, f_dst, ub, a = _fused_operands(g, rng)
    kq = jnp.ones((g.num_edges_padded, 4), jnp.float32)
    kqb = jnp.ones((plan.num_slots, 4), jnp.float32)

    o_t, d_t = jax.jit(lambda *xs: fused_v2_attention(
        *xs, g.senders, g.receivers, g.r_local, g.r_chunk, g.c_slot,
        g.c_local, g.c_chunk, 0.2, "high", False))(whi, whj, ub, a, kq)
    o_b, d_b = jax.jit(lambda *xs: fused_v2_attention_banded(
        *xs, plan, alpha=0.2, precision="high", interpret=False))(
        whi, whj, ub, a, kqb)
    np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_t),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_t),
                               rtol=1e-3, atol=1e-3)


def test_compiled_fused_v2_window_modes(gr):
    """Both v2 take-path window layouts compile and agree: 'combined'
    (one [E, 2HF] gather + DMA stream, round-5 default) vs 'split' (two
    [E, HF] windows, the round-4 layout). The combined kernel's in-kernel
    lane slices (gji[:, :hf] at hf=128) are exactly what interpret mode
    cannot vet."""
    from pygat_tpu.ops import fused_stream as fs

    g, rng = gr
    whi, whj, f_dst, ub, a = _fused_operands(g, rng)
    kq = jnp.ones((g.num_edges_padded, 4), jnp.float32)
    outs = {}
    prev = fs._v2_window_mode()
    try:
        for mode in ("combined", "split"):
            fs.set_v2_window(mode)
            outs[mode] = jax.jit(lambda *xs: fs.fused_v2_attention(
                *xs, g.senders, g.receivers, g.r_local, g.r_chunk,
                g.c_slot, g.c_local, g.c_chunk, 0.2, "high", False))(
                whi, whj, ub, a, kq)
    finally:
        fs.set_v2_window(prev)
    for got, ref in zip(outs["combined"], outs["split"]):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("precision", ["fastest", "high"])
def test_compiled_spmm_banded_fused(gr, precision):
    """The fused banded SpMM kernel (weighted select + scatter in one
    pass) compiled, fwd + custom-VJP grads, vs the numpy oracle."""
    from pygat_tpu.ops.banded import build_band_plan, spmm_banded

    g, rng = gr
    plan = build_band_plan(g, w=4)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 96)).astype(np.float32))
    vals_b = np.zeros(plan.num_slots, np.float32)
    live = plan.perm >= 0
    vals_b[live] = rng.standard_normal(int(live.sum())).astype(np.float32)

    def loss(v, xx):
        out = spmm_banded(v, xx, plan, precision=precision,
                          interpret=False)
        return jnp.sum(out ** 2), out

    (_, out), grads = jax.jit(
        jax.value_and_grad(loss, (0, 1), has_aux=True))(
        jnp.asarray(vals_b), x)
    s = np.asarray(plan.senders)
    rl = np.asarray(plan.r_local)
    rc = np.asarray(plan.r_chunk)
    glob_r = rc[np.arange(plan.num_slots) // 256] * 128 + rl
    ref = np.zeros((g.num_nodes_padded, 96), np.float32)
    np.add.at(ref, glob_r[live], vals_b[live, None] * np.asarray(x)[s[live]])
    if precision == "high":
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3,
                                   atol=1e-3)
    else:
        # fastest = one bf16 pass: ~deg (≈16 here) rounded terms of unit
        # scale per output, worst-case ~deg * bf16_eps ≈ 0.13 absolute at
        # cancellation points (module-scoped rng means the draw varies
        # with test order — the bound must hold for any draw)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-2,
                                   atol=0.15)
    assert all(np.isfinite(np.asarray(gg)).all() for gg in grads)


def test_compiled_banded_take_exact(gr):
    from pygat_tpu.ops.banded import banded_take, build_band_plan
    from pygat_tpu.ops.stream import DEAD

    g, rng = gr
    plan = build_band_plan(g, w=4)
    tab = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 128)).astype(np.float32))
    out = jax.jit(lambda t: banded_take(t, plan, exact=True,
                                        interpret=False))(tab)
    ref = np.asarray(tab)[np.asarray(plan.senders)]
    ref[np.asarray(plan.r_local) == DEAD] = 0.0
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_compiled_fused_corner_v1(gr):
    from pygat_tpu.ops.fused_corner import fused_v1_attention_corner
    from pygat_tpu.ops.large import plan_csc_to_csr

    g, rng = gr
    plans = plan_csc_to_csr(g)
    wh, whj, f_dst, bound, a = _fused_operands(g, rng)
    kq = jnp.ones((g.num_edges_padded, 4), jnp.float32)
    o, d = jax.jit(lambda *xs: fused_v1_attention_corner(
        *xs, g, plans, alpha=0.2, precision="high", interpret=False))(
        wh, f_dst, bound, a, kq)
    ro, rd = _oracle_v1(g, wh, f_dst, bound, a)
    np.testing.assert_allclose(np.asarray(o), ro, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(d), rd, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_compiled_ring_hop_kernels():
    """The ring's per-shard stream AND fused per-hop kernels compiled under
    a (1, 1) mesh shard_map — the layout every multi-chip hop runs.

    ~15 min wall (the ring shard_map program is a slow chip compile) —
    excluded from the fast gate via ``-m "tpu and not slow"``."""
    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
    from pygat_tpu.parallel.mesh import make_mesh
    from pygat_tpu.parallel.partition import partition_edges
    from pygat_tpu.parallel.ring_model import ring_apply_gat

    assert jax.default_backend() == "tpu"
    g, rng = _clustered_graph(n=1024, deg=6, seed=1)
    mesh = make_mesh(1, 1)
    part = partition_edges(g, 1)
    cfg = GATConfig(nlayers=2, nheads=(4, 1), nfeats=(32, 16, 7),
                    dropout=0.0, alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    out_ring = jax.jit(lambda p, xx: ring_apply_gat(
        p, cfg, xx, part, mesh, key, train=False))(params, x)
    out_ref = jax.jit(lambda p, xx: apply_gat(
        p, cfg, xx, g, key, train=False))(params, x)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ref),
                               rtol=5e-2, atol=5e-2)
