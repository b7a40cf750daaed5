"""Per-layer activation parity vs. the NumPy transliteration of the
reference math (BASELINE.json: "Per-layer activations must match the
PyTorch reference allclose"). Dropout disabled — RNG streams differ."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.models.layers import (
    V1Params,
    V2Params,
    gat_v1_dense,
    gat_v1_sparse,
    gat_v2_dense,
    gat_v2_sparse,
)
from tests import reference_math as ref

ALPHA = 0.2
F_IN, F_OUT = 12, 6


def _setup(random_graph_tuple, rng, v2=False, skip=False):
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    n_pad = g.num_nodes_padded

    h = rng.standard_normal((n, F_IN)).astype(np.float32)
    h_pad = np.zeros((n_pad, F_IN), np.float32)
    h_pad[:n] = h
    adj = np.zeros((n, n), np.float32)
    adj[recv, send] = w

    win = 2 * F_IN if v2 else F_IN
    W = rng.standard_normal((win, F_OUT)).astype(np.float32) * 0.3
    a_len = F_OUT if v2 else 2 * F_OUT
    a = rng.standard_normal(a_len).astype(np.float32) * 0.3
    skip_w = rng.standard_normal((F_IN, F_OUT)).astype(np.float32) * 0.3 if skip else None
    return g, h, h_pad, adj, W, a, skip_w, n


KEY = jax.random.PRNGKey(0)  # unused: train=False disables dropout


@pytest.mark.parametrize("concat", [True, False])
@pytest.mark.parametrize("skip", [False, True])
def test_v1_dense_parity(random_graph_tuple, rng, concat, skip):
    g, h, h_pad, adj, W, a, skip_w, n = _setup(random_graph_tuple, rng, skip=skip)
    params = V1Params(jnp.asarray(W), jnp.asarray(a), None if skip_w is None else jnp.asarray(skip_w))
    mask = g.to_dense(binary=True) > 0
    out = gat_v1_dense(params, jnp.asarray(h_pad), mask, KEY,
                       alpha=ALPHA, drop=0.6, concat=concat, train=False)
    want = ref.v1_dense_head(W, a, h, adj, ALPHA, concat, skip_w)
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("concat", [True, False])
@pytest.mark.parametrize("skip", [False, True])
def test_v1_sparse_parity(random_graph_tuple, rng, concat, skip):
    g, h, h_pad, adj, W, a, skip_w, n = _setup(random_graph_tuple, rng, skip=skip)
    params = V1Params(jnp.asarray(W), jnp.asarray(a), None if skip_w is None else jnp.asarray(skip_w))
    out = gat_v1_sparse(params, jnp.asarray(h_pad), g, KEY,
                        alpha=ALPHA, drop=0.6, concat=concat, train=False)
    want = ref.v1_sparse_head(W, a, h, adj, ALPHA, concat, skip_w)
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("concat", [True, False])
def test_v2_dense_parity_with_broadcast_quirk(random_graph_tuple, rng, concat):
    g, h, h_pad, adj, W, a, skip_w, n = _setup(random_graph_tuple, rng, v2=True)
    params = V2Params(jnp.asarray(W), jnp.asarray(a), None)
    mask = g.to_dense(binary=True) > 0
    out = gat_v2_dense(params, jnp.asarray(h_pad), mask, KEY,
                       alpha=ALPHA, drop=0.6, concat=concat, train=False)
    want = ref.v2_dense_head(W, a, h, adj, ALPHA, concat, None)
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("concat", [True, False])
@pytest.mark.parametrize("skip", [False, True])
def test_v2_sparse_parity(random_graph_tuple, rng, concat, skip):
    g, h, h_pad, adj, W, a, skip_w, n = _setup(random_graph_tuple, rng, v2=True, skip=skip)
    params = V2Params(jnp.asarray(W), jnp.asarray(a), None if skip_w is None else jnp.asarray(skip_w))
    out = gat_v2_sparse(params, jnp.asarray(h_pad), g, KEY,
                        alpha=ALPHA, drop=0.6, concat=concat, train=False)
    want = ref.v2_sparse_head(W, a, h, adj, ALPHA, concat, skip_w)
    np.testing.assert_allclose(np.asarray(out)[:n], want, rtol=2e-4, atol=2e-5)


def test_sparse_equals_dense_v1(random_graph_tuple, rng):
    """The edge-list path must reproduce the dense masked softmax exactly
    (SURVEY §7 step 3: verify sparse ≡ dense)."""
    g, h, h_pad, adj, W, a, _, n = _setup(random_graph_tuple, rng)
    params = V1Params(jnp.asarray(W), jnp.asarray(a), None)
    mask = g.to_dense(binary=True) > 0
    dense = gat_v1_dense(params, jnp.asarray(h_pad), mask, KEY,
                         alpha=ALPHA, drop=0.0, concat=True, train=False)
    sparse = gat_v1_sparse(params, jnp.asarray(h_pad), g, KEY,
                           alpha=ALPHA, drop=0.0, concat=True, train=False)
    np.testing.assert_allclose(np.asarray(dense)[:n], np.asarray(sparse)[:n],
                               rtol=1e-4, atol=1e-5)


def test_heads_batched_path_matches_per_head_vmap(random_graph_tuple, rng):
    """apply_gat's TPU-layout head-batched GAT_sparse path == per-head
    gat_v1_sparse composition (dropout off)."""
    import jax

    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat

    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    f_in = 12
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(f_in, 6, 3),
                    dropout=0.0, alpha=0.2, layer_type="GAT_sparse",
                    skip_connection=True)
    params = init_gat(jax.random.PRNGKey(7), cfg)
    h = jnp.asarray(rng.standard_normal((g.num_nodes_padded, f_in)).astype(np.float32))

    out = apply_gat(params, cfg, h, g, jax.random.PRNGKey(0), train=False)

    # oracle: vmap per head, concat / mean exactly like the model container
    x = h
    for i, lp in enumerate(params):
        concat = i < cfg.nlayers - 1
        outs = jax.vmap(
            lambda p: gat_v1_sparse(p, x, g, None, alpha=cfg.alpha, drop=0.0,
                                    concat=concat, train=False)
        )(lp)
        x = (jnp.moveaxis(outs, 0, 1).reshape(outs.shape[1], -1)
             if concat else outs.mean(axis=0))

    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)


def test_heads_batched_v2_matches_per_head_vmap(random_graph_tuple, rng):
    """apply_gat's head-batched GATv2_sparse path == per-head gat_v2_sparse
    composition (dropout off)."""
    import jax

    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat

    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    f_in = 10
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(f_in, 6, 3),
                    dropout=0.0, alpha=0.2, layer_type="GATv2_sparse",
                    skip_connection=True)
    params = init_gat(jax.random.PRNGKey(11), cfg)
    h = jnp.asarray(rng.standard_normal((g.num_nodes_padded, f_in)).astype(np.float32))

    out = apply_gat(params, cfg, h, g, jax.random.PRNGKey(0), train=False)

    x = h
    for i, lp in enumerate(params):
        concat = i < cfg.nlayers - 1
        outs = jax.vmap(
            lambda p: gat_v2_sparse(p, x, g, None, alpha=cfg.alpha, drop=0.0,
                                    concat=concat, train=False)
        )(lp)
        x = (jnp.moveaxis(outs, 0, 1).reshape(outs.shape[1], -1)
             if concat else outs.mean(axis=0))

    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)


def test_heads_path_huge_logits_stable(random_graph_tuple, rng):
    """The bound-based softmax stabilization must keep exp() finite for
    extreme projections (the reference README:30 instability scenario)."""
    import jax

    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat

    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    f_in = 8
    cfg = GATConfig(nlayers=2, nheads=(4, 1), nfeats=(f_in, 4, 3),
                    dropout=0.0, alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(5), cfg)
    # scale weights so per-edge logits reach +-hundreds
    params = jax.tree_util.tree_map(lambda p: p * 60.0, params)
    h = jnp.asarray(rng.standard_normal((g.num_nodes_padded, f_in)).astype(np.float32) * 5)
    out = apply_gat(params, cfg, h, g, jax.random.PRNGKey(0), train=False)
    assert bool(jnp.isfinite(out[:n]).all())


def test_heads_path_dropout_statistics(random_graph_tuple, rng):
    """Train-mode mask statistics: roughly p of the attention numerators
    drop, survivors are scaled by 1/(1-p), and per-head masks differ."""
    import jax

    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat

    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    f_in = 16
    cfg = GATConfig(nlayers=1, nheads=(4,), nfeats=(f_in, 8), dropout=0.5,
                    alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(1), cfg)
    h = jnp.asarray(rng.standard_normal((g.num_nodes_padded, f_in)).astype(np.float32))

    outs = [np.asarray(apply_gat(params, cfg, h, g, jax.random.PRNGKey(s),
                                 train=True)) for s in (0, 1)]
    ref = np.asarray(apply_gat(params, cfg, h, g, jax.random.PRNGKey(0),
                               train=False))
    # different seeds give different training outputs; eval differs from both
    assert not np.allclose(outs[0], outs[1])
    assert not np.allclose(outs[0], ref)
    assert np.isfinite(outs[0][:n]).all()

    # direct mask statistics via the head-batched draw
    from pygat_tpu.models.layers import draw_masks

    m = draw_masks(jax.random.PRNGKey(3), "GAT_sparse", 0.5,
                   n=512, f_in=64, f_out=8, e=2048, heads=4)
    frac = float(np.asarray(m.m_in).mean())
    assert 0.47 < frac < 0.53
    # per-head masks are independent draws
    a, b = np.asarray(m.m_in[0]), np.asarray(m.m_in[1])
    assert (a != b).mean() > 0.3


def test_dense_head_scan_matches_vmap(random_graph_tuple):
    """The memory-diet dense path (sequential rematerialized heads, used
    above the [H, N, N] byte threshold) == the vmapped path, values and
    gradients (eval mode: dropout masks are the only rng divergence)."""
    import pygat_tpu.models.gat as gat_mod
    from pygat_tpu.graph import build_graph
    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat

    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((g.num_nodes_padded, 24)).astype(np.float32))
    for lt in ("GAT", "GATv2"):
        cfg = GATConfig(nlayers=2, nheads=(3, 2), nfeats=(24, 6, 4),
                        dropout=0.0, alpha=0.2, layer_type=lt,
                        skip_connection=True)
        params = init_gat(jax.random.PRNGKey(2), cfg)
        key = jax.random.PRNGKey(0)

        def loss(p, thresh):
            old = gat_mod._DENSE_VMAP_BYTES
            gat_mod._DENSE_VMAP_BYTES = thresh
            try:
                out = apply_gat(p, cfg, x, g, key, train=False)
            finally:
                gat_mod._DENSE_VMAP_BYTES = old
            return (out * out).sum(), out

        (lv, out_v), grad_v = jax.value_and_grad(loss, has_aux=True)(params, 2 << 30)
        (ls, out_s), grad_s = jax.value_and_grad(loss, has_aux=True)(params, 0)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_v),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(grad_s),
                        jax.tree_util.tree_leaves(grad_v)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_default_matmul_precision_smoke(random_graph_tuple, rng):
    """conftest pins jax_default_matmul_precision='highest' so parity tests
    verify lowering rather than bf16 noise — which means the DEFAULT
    (production) precision is otherwise never exercised by the suite. Run
    one sparse forward under the default precision with loosened tolerance
    against the 'highest'-precision output (advisor r3)."""
    import jax

    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat

    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    f_in = 12
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(f_in, 6, 3),
                    dropout=0.0, alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(7), cfg)
    h = jnp.asarray(rng.standard_normal((g.num_nodes_padded, f_in)).astype(np.float32))

    want = apply_gat(params, cfg, h, g, jax.random.PRNGKey(0), train=False)
    with jax.default_matmul_precision("default"):
        got = jax.jit(
            lambda p, x, k: apply_gat(p, cfg, x, g, k, train=False)
        )(params, h, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(got).all())
    # bf16 one-pass tolerance on TPU; exact-f32 on the CPU mesh
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
