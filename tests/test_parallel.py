"""Multi-device tests on the forced 8-CPU-device mesh (SURVEY §4.4):
sharded step == single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.data import synthetic
from pygat_tpu.data.citation import CitationDataset
from pygat_tpu.graph import build_graph
from pygat_tpu.models.gat import GATConfig, init_gat
from pygat_tpu.parallel import make_mesh, sharded_fit_inputs
from pygat_tpu.train.loop import make_transductive_steps
from pygat_tpu.train.state import init_state, make_optimizer


def _tiny_dataset(n=300, classes=4, f=128):
    s, r, labels = synthetic.planted_partition_graph(n, classes, "par", avg_degree=8)
    s = np.concatenate([s, np.arange(n)])
    r = np.concatenate([r, np.arange(n)])
    g = build_graph(s, r, None, n, n_pad=512, e_pad=round(len(s) / 128 + 1) * 128)
    feats = synthetic.class_features(labels, 32, "par", density=0.2)
    x = np.zeros((g.num_nodes_padded, f), np.float32)
    x[:n, :32] = feats
    lab = np.full(g.num_nodes_padded, -1, np.int32)
    lab[:n] = labels
    return CitationDataset(
        graph=g,
        features=jnp.asarray(x),
        labels=jnp.asarray(lab),
        idx_train=jnp.arange(128),
        idx_val=jnp.arange(150, 214),
        idx_test=jnp.arange(214, 300),
        num_classes=classes,
        num_features=32,
        synthetic_parts=("all",),
    )


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_step_matches_single_device(mesh_shape):
    assert jax.device_count() == 8
    data = _tiny_dataset()
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(128, 8, 4), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse")
    tx = make_optimizer(0.01, 5e-4)
    params = init_gat(jax.random.PRNGKey(0), cfg)
    state = init_state(params, tx, jax.random.PRNGKey(1))
    train_step, eval_step = make_transductive_steps(cfg, tx)

    # single device
    s1, loss1, acc1, _ = train_step(state, data.features, data.graph,
                                    data.labels, data.idx_train)

    # sharded over the mesh (dropout off => bitwise-comparable math)
    mesh = make_mesh(*mesh_shape)
    sdata, sstate = sharded_fit_inputs(data, state, mesh)
    s2, loss2, acc2, _ = train_step(sstate, sdata.features, sdata.graph,
                                    sdata.labels, sdata.idx_train)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(float(acc1), float(acc2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_sharded_multi_step_training_converges():
    """A few sharded steps must actually reduce the loss (collectives in the
    backward pass are exercised, not just the forward)."""
    data = _tiny_dataset()
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(128, 8, 4), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse")
    tx = make_optimizer(0.02, 0.0)
    params = init_gat(jax.random.PRNGKey(0), cfg)
    state = init_state(params, tx, jax.random.PRNGKey(1))
    train_step, _ = make_transductive_steps(cfg, tx)

    mesh = make_mesh(4, 2)
    sdata, sstate = sharded_fit_inputs(data, state, mesh)
    losses = []
    for _ in range(12):
        sstate, loss, _, _ = train_step(sstate, sdata.features, sdata.graph,
                                        sdata.labels, sdata.idx_train)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_mesh_entry_is_side_effect_free():
    """Regression (VERDICT r2 weak #1): entering a multi-device mesh must
    not mutate the process-global segment impl — a single-device run after
    a mesh run keeps the stream kernel."""
    from pygat_tpu.ops import segment as seg
    from pygat_tpu.train.loop import _enter_mesh, _mesh_segment_impl

    data = _tiny_dataset()
    cfg = GATConfig(nlayers=1, nheads=(2,), nfeats=(128, 4), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse")
    tx = make_optimizer(0.01, 0.0)
    state = init_state(init_gat(jax.random.PRNGKey(0), cfg), tx,
                       jax.random.PRNGKey(1))

    seg.set_segment_impl("stream")
    try:
        mesh = make_mesh(8, 1)
        assert _mesh_segment_impl(mesh) == "scatter"
        _enter_mesh(data, state, mesh)
        assert seg._segment_impl == "stream"  # global untouched
        # a meshed step traces with the scoped scatter override...
        train_step, _ = make_transductive_steps(cfg, tx,
                                                segment_impl="scatter")
        sdata, sstate = sharded_fit_inputs(data, state, mesh)
        _, loss, *_ = train_step(sstate, sdata.features, sdata.graph,
                                 sdata.labels, sdata.idx_train)
        assert np.isfinite(float(loss))
        # ...and afterwards the stream kernel is still the active impl
        assert seg._stream_enabled()
        data2 = _tiny_dataset()
        out = seg.segment_sum_receivers(
            jnp.ones((data2.graph.num_edges_padded, 8), jnp.float32)
            * data2.graph.edge_mask[:, None],
            data2.graph,
        )
        want = jax.ops.segment_sum(
            jnp.ones((data2.graph.num_edges_padded, 8), jnp.float32)
            * data2.graph.edge_mask[:, None],
            data2.graph.receivers,
            num_segments=data2.graph.num_nodes_padded,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-2)
    finally:
        seg.set_segment_impl("auto")


def test_fit_transductive_ring_partition():
    """fit_transductive(mesh=..., partition='ring') reproduces the
    single-device trajectory (dropout off) through the halo-exchange path."""
    import os

    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import fit_transductive

    data = _tiny_dataset()
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(128, 8, 4), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse")
    kw = dict(lr=0.01, weight_decay=5e-4, epochs=5, patience=50, seed=3,
              checkpoint_dir=None,
              logger=TrainLogger(stream=open(os.devnull, "w")))
    res_plain = fit_transductive(cfg, data, **kw)
    res_ring = fit_transductive(cfg, data, mesh=make_mesh(4, 2),
                                partition="ring", **kw)
    np.testing.assert_allclose(res_ring.history, res_plain.history,
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(res_ring.test_acc, res_plain.test_acc,
                               rtol=1e-3)


def test_param_head_sharding_layout():
    from jax.sharding import PartitionSpec as P
    from pygat_tpu.parallel.sharding import param_pspecs

    cfg = GATConfig(nlayers=2, nheads=(8, 1), nfeats=(64, 8, 4), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4, 2)
    specs = param_pspecs(params, mesh)
    # 8 heads shard on model axis; the single-head output layer replicates
    assert specs[0].W == P("model", None, None)
    assert specs[1].W == P(None, None, None)


# ---------------------------------------------------------------------------
# Inductive (PPI) data parallelism — VERDICT r1 item 3 / SURVEY §2.11 item 1
# ---------------------------------------------------------------------------


def _tiny_ppi(n_graphs=8, n=40, f=16, labels_dim=6):
    import scipy.sparse as sp

    from pygat_tpu.data.ppi import PPIData, PPIGraph
    from pygat_tpu.data.preprocess import normalize_adj
    from pygat_tpu.data.synthetic import planted_partition_graph

    rng = np.random.default_rng(0)
    R = rng.standard_normal((f, labels_dim)).astype(np.float32)

    def mk(n, name):
        s, r, _ = planted_partition_graph(n, 3, name, avg_degree=6)
        adj = sp.coo_matrix((np.ones(len(s), np.float32), (r, s)), shape=(n, n)).tocsr()
        adj.data[:] = 1.0
        adj = normalize_adj(adj + sp.eye(n, format="csr", dtype=np.float32)).tocoo()
        feats = rng.standard_normal((n, f)).astype(np.float32)
        labels = (feats @ R > 0.5).astype(np.float32)
        return PPIGraph(feats, labels, adj.col.astype(np.int64),
                        adj.row.astype(np.int64), adj.data.astype(np.float32), n)

    return PPIData(
        train=[mk(n, f"t{i}") for i in range(n_graphs)],
        valid=[mk(n - 5, "v0"), mk(n - 3, "v1")],
        test=[mk(n - 8, "x0"), mk(n - 2, "x1")],
        synthetic_parts=("all",),
    )


def test_inductive_dp_matches_replicated():
    """Sharded super-batch training (graph-batches on 'data', heads on
    'model') == the same super-batched math on a 1-device mesh."""
    from pygat_tpu.data.ppi import batch_bounds, make_batches
    from pygat_tpu.parallel.distributed import shard_train_state
    from pygat_tpu.train.loop import (
        make_sharded_inductive_epochs,
        place_superbatches,
        stack_batches,
        superbatch,
    )

    data = _tiny_ppi()
    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse", skip_connection=True)
    tx = make_optimizer(0.01, 0.0)
    params = init_gat(jax.random.PRNGKey(3), cfg)

    n_pad, e_pad = batch_bounds(data.train, 2)
    stacked = stack_batches(
        list(make_batches(data.train, 2, n_pad=n_pad, e_pad=e_pad))
    )
    sb, w = superbatch(stacked, 4)  # [S=1, D=4, ...]

    results = {}
    for shape in ((4, 2), (1, 1)):
        mesh = make_mesh(*shape)
        state = shard_train_state(
            init_state(params, tx, jax.random.PRNGKey(5)), mesh
        )
        train_epoch, eval_epoch = make_sharded_inductive_epochs(cfg, tx, mesh)
        psb, pw = place_superbatches(sb, w, mesh)
        for _ in range(3):
            state, (losses, f1s) = train_epoch(state, psb, pw)
        ev = eval_epoch(state.params, psb, pw)
        results[shape] = (np.asarray(losses), np.asarray(f1s),
                          [np.asarray(v) for v in ev],
                          jax.tree_util.tree_leaves(state.params))
    a, b = results[(4, 2)], results[(1, 1)]
    np.testing.assert_allclose(a[0], b[0], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(a[1], b[1], rtol=2e-4, atol=1e-5)
    for va, vb in zip(a[2], b[2]):
        np.testing.assert_allclose(va, vb, rtol=2e-4, atol=1e-5)
    for la, lb in zip(a[3], b[3]):
        np.testing.assert_allclose(la, lb, rtol=5e-4, atol=1e-5)


def test_fit_inductive_fast_mesh():
    """fit_inductive_fast(mesh=...) trains end-to-end; a 1-device-data mesh
    reproduces the unsharded scanned loop exactly (D=1 grouping == the
    sequential per-batch optimizer schedule)."""
    import os

    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import fit_inductive_fast

    data = _tiny_ppi()
    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse", skip_connection=True)
    kw = dict(batch_size=2, lr=0.01, weight_decay=0.0, epochs=4, patience=10,
              logger=TrainLogger(stream=open(os.devnull, "w")))

    res_plain = fit_inductive_fast(cfg, data, **kw)
    res_rep = fit_inductive_fast(cfg, data, mesh=make_mesh(1, 1), **kw)
    np.testing.assert_allclose(res_rep.history, res_plain.history,
                               rtol=2e-4, atol=1e-5)

    res_dp = fit_inductive_fast(cfg, data, mesh=make_mesh(4, 2), **kw)
    assert np.isfinite(res_dp.history).all()
    assert res_dp.test_acc > 0.3


def test_initialize_distributed_single_process_noop():
    """No coordinator configured anywhere: initialize_distributed reports
    single-host (False) and leaves the process fully usable — the narrowed
    exception contract of VERDICT r3 item 7."""
    import jax.numpy as jnp

    from pygat_tpu.parallel.mesh import initialize_distributed

    assert initialize_distributed() is False
    assert float(jnp.ones((4,)).sum()) == 4.0
