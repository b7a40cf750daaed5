"""Fused attention stream kernel (ops/fused_stream.py) vs the unfused
XLA+scatter path — forward and gradients, v1 and v2, interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from pygat_tpu.graph import build_graph
from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
from pygat_tpu.ops import fused_stream as fs
from pygat_tpu.ops import segment as seg


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    n = 300
    s = np.concatenate([rng.integers(0, n, n * 6), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, n * 6), np.arange(n)])
    g = build_graph(s, r, None, n)
    assert g.r_local is not None
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32))
    return g, x


def _cfg(lt):
    return GATConfig(nlayers=2, nheads=(4, 2), nfeats=(32, 16, 4),
                     dropout=0.6, alpha=0.2, layer_type=lt,
                     skip_connection=True)


def _run(params, cfg, x, g, impl, precision="high", train=False):
    key = jax.random.PRNGKey(1)

    def loss(p):
        with seg.use_impl(impl):
            out = apply_gat(p, cfg, x, g, key, train=train)
        return jnp.sum(jnp.sin(out)), out

    prev = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = precision
    try:
        (lv, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
    finally:
        seg._STREAM_PRECISION = prev
    return out, ravel_pytree(grads)[0]


@pytest.mark.parametrize("lt", ["GAT_sparse", "GATv2_sparse"])
def test_fused_matches_scatter(setup, lt):
    """Fused Pallas attention (high precision, interpret) == the unfused
    scatter path, forward AND parameter gradients, through the full
    2-layer model (dropout off so both paths are deterministic)."""
    g, x = setup
    cfg = _cfg(lt)
    params = init_gat(jax.random.PRNGKey(0), cfg)
    # scoped impl only inside _run: the global default (off on the CPU
    # mesh, on on TPU where stream is the auto impl) must be untouched
    before = fs.fused_enabled(g)
    out_f, gr_f = _run(params, cfg, x, g, "stream")
    assert fs.fused_enabled(g) is before
    out_p, gr_p = _run(params, cfg, x, g, "scatter")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-4, rtol=1e-4)
    scale = float(jnp.abs(gr_p).max())
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_p),
                               atol=5e-5 * scale)


@pytest.mark.parametrize("lt", ["GAT_sparse", "GATv2_sparse"])
def test_fused_fastest_mode(setup, lt):
    """Single-limb bf16 mode tracks the f32 path at bf16-class tolerance."""
    g, x = setup
    cfg = _cfg(lt)
    params = init_gat(jax.random.PRNGKey(0), cfg)
    out_f, gr_f = _run(params, cfg, x, g, "stream", precision="fastest")
    out_p, gr_p = _run(params, cfg, x, g, "scatter")
    scale = float(jnp.abs(out_p).max())
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=3e-2 * scale)
    # bf16 logits pass through exp, so isolated gradient elements can see
    # a few percent of the max-scale — the same class of error as running
    # every matmul at TPU default precision
    gscale = float(jnp.abs(gr_p).max())
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_p),
                               atol=6e-2 * gscale)


@pytest.mark.parametrize("lt", ["GAT_sparse", "GATv2_sparse"])
def test_fused_train_step_learns(setup, lt):
    """Full train steps through the fused kernels (with dropout, in-loop
    rng) are finite and reduce the loss."""
    from pygat_tpu.data.citation import CitationDataset
    from pygat_tpu.train.loop import make_transductive_steps
    from pygat_tpu.train.state import init_state, make_optimizer

    g, x = setup
    x = x * 0.25  # citation-pipeline-like feature scale (row-normalized)
    n = int(g.n_node)
    rng = np.random.default_rng(5)
    lab = np.full(g.num_nodes_padded, -1, np.int32)
    lab[:n] = rng.integers(0, 4, n)
    data = CitationDataset(
        graph=g, features=x, labels=jnp.asarray(lab),
        idx_train=jnp.arange(128), idx_val=jnp.arange(150, 214),
        idx_test=jnp.arange(214, 300), num_classes=4, num_features=32,
        synthetic_parts=("all",),
    )
    cfg = _cfg(lt)
    tx = make_optimizer(0.01, 5e-4)
    state = init_state(init_gat(jax.random.PRNGKey(0), cfg), tx,
                       jax.random.PRNGKey(1))
    with seg.use_impl("stream"):
        step, _ = make_transductive_steps(cfg, tx)
        losses = []
        for _ in range(30):
            state, loss, *_ = step(state, data.features, data.graph,
                                   data.labels, data.idx_train)
            losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.parametrize("impl", ["scatter", "stream"])
def test_denominator_underflow_grads_finite(setup, impl):
    """Regression (found by the fused train test, applies to EVERY segment
    backend): large activations make the bound-shifted softmax denominator
    underflow toward the f32 subnormal band, where the division backward
    (agg/den^2) used to overflow to inf and NaN every gradient. The DEN_MIN
    clamp must keep train-mode gradients finite."""
    g, x = setup
    cfg = _cfg("GAT_sparse")  # dropout 0.6 amplifies activation spread
    params = init_gat(jax.random.PRNGKey(0), cfg)

    def loss(p, key):
        with seg.use_impl(impl):
            out = apply_gat(p, cfg, x, g, key, train=True)
        return jnp.sum(out**2)

    grads = jax.jit(jax.grad(loss))(params, jax.random.PRNGKey(1))
    flat = ravel_pytree(grads)[0]
    assert bool(jnp.isfinite(flat).all())


def test_fused_empty_tiles_and_bucketed_shapes():
    """A bucketed graph (explicit e_pad, nodes only in the low tiles) has
    empty output tiles and all-dead chunks; fused == scatter still."""
    rng = np.random.default_rng(11)
    n = 140  # real rows only in tiles 0-1 of n_pad=512
    s = np.concatenate([rng.integers(0, n, 500), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, 500), np.arange(n)])
    g = build_graph(s, r, None, n, n_pad=512, e_pad=2048)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32))
    cfg = _cfg("GAT_sparse")
    params = init_gat(jax.random.PRNGKey(0), cfg)
    out_f, gr_f = _run(params, cfg, x, g, "stream")
    out_p, gr_p = _run(params, cfg, x, g, "scatter")
    assert bool(jnp.isfinite(out_f).all())
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-4, rtol=1e-4)
    scale = float(jnp.abs(gr_p).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_p),
                               atol=5e-5 * scale)


def test_softmax_div_backward_stable_in_den_danger_band():
    """Regression: the clamp alone is not enough. With den just above
    DEN_MIN, the naive division VJP associates g/den^2 first, which
    overflows to inf; mixed-sign inf terms then cancel to NaN in the sum
    over F, poisoning every upstream gradient (observed end-to-end as NaN
    W/a grads on large-spread features at dropout 0.6). softmax_div's
    custom VJP forms -sum(g*out)/den — one power of den — and must stay
    finite AND match the exact (float64) cotangents across the band."""
    from pygat_tpu.models.layers import softmax_div

    rng = np.random.default_rng(7)
    dens = np.array([2e-18, 1e-17, 1e-15, 1e-12, 1e-6, 1.0, 0.0, 1e-19],
                    dtype=np.float32)  # last two: clamped rows
    n, h, f = dens.shape[0], 2, 8
    den = jnp.asarray(np.tile(dens[:, None], (1, h)))
    # agg rows scaled like real numerators: |agg| <= ~2.5 * den * |msg|
    msg = rng.standard_normal((n, h, f)).astype(np.float32) * 40
    agg = jnp.asarray(dens[:, None, None] * msg)
    g_up = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32)
                       * 2e4)

    def loss(agg_, den_):
        return jnp.sum(softmax_div(agg_, den_) * g_up)

    d_agg, d_den = jax.grad(loss, argnums=(0, 1))(agg, den)
    assert bool(jnp.isfinite(d_agg).all())
    assert bool(jnp.isfinite(d_den).all())
    # exact values from float64 (clamped rows contribute zero den-grad)
    live = dens > 1e-18
    den64 = np.where(live, dens, 1.0)[:, None].astype(np.float64)
    a64 = np.asarray(agg, np.float64)
    g64 = np.asarray(g_up, np.float64)
    ref_agg = g64 / den64[:, :, None]
    ref_den = np.where(live[:, None],
                       -(g64 * a64).sum(-1) / den64 ** 2, 0.0)
    np.testing.assert_allclose(np.asarray(d_agg, np.float64), ref_agg,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_den, np.float64), ref_den,
                               rtol=1e-4)


def test_large_spread_features_train_grads_finite():
    """End-to-end repro of the den-danger-band NaN: unnormalized
    standard-normal features at f_in=128 with dropout 0.6 push the
    bound-shifted softmax denominators of many rows into (1e-18, 1e-12);
    before softmax_div, the 2-layer fused v1 train backward returned NaN
    for every layer-0 parameter (W: all 8192 entries) on this exact
    graph/key. Must be finite for v1 AND v2, fused and unfused."""
    rng = np.random.default_rng(72)
    n, f = 3000, 128
    s = np.concatenate([rng.integers(0, n, n * 5), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, n * 5), np.arange(n)])
    g = build_graph(s, r, None, n)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, f)).astype(np.float32))

    for lt in ("GAT_sparse", "GATv2_sparse"):
        cfg = GATConfig(nlayers=2, nheads=(8, 1), nfeats=(f, 8, 7),
                        dropout=0.6, alpha=0.2, layer_type=lt)
        params = init_gat(jax.random.PRNGKey(72), cfg)

        def loss(p, key):
            with seg.use_impl("stream"):
                out = apply_gat(p, cfg, x, g, key, train=True)
            return jnp.sum(out[:n] ** 2)

        grads = jax.jit(jax.grad(loss))(params, jax.random.PRNGKey(1))
        flat = ravel_pytree(grads)[0]
        assert bool(jnp.isfinite(flat).all()), lt
