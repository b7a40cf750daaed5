import numpy as np
import pytest

from pygat_tpu.data.ppi import PPIGraph, batch_bounds, load_ppi, make_batches
from pygat_tpu.models.presets import PPI_NUM_CLASSES, PPI_NUM_INPUT_FEATURES


@pytest.fixture(scope="module")
def ppi():
    return load_ppi()


def test_ppi_split_sizes(ppi):
    # 20 train / 2 valid / 2 test graphs (load_data_ppi.py:132)
    assert len(ppi.train) == 20
    assert len(ppi.valid) == 2
    assert len(ppi.test) == 2
    # real graph_id node counts
    assert sum(g.num_nodes for g in ppi.train) == 44906
    assert sum(g.num_nodes for g in ppi.valid) == 6514
    assert sum(g.num_nodes for g in ppi.test) == 5524


def test_ppi_graph_invariants(ppi):
    for g in ppi.train[:3] + ppi.valid + ppi.test:
        assert g.features.shape == (g.num_nodes, PPI_NUM_INPUT_FEATURES)
        assert g.labels.shape == (g.num_nodes, PPI_NUM_CLASSES)
        assert set(np.unique(g.labels)) <= {0.0, 1.0}
        # self loops present (adj + I)
        assert (g.senders == g.receivers).sum() == g.num_nodes
        # symmetric normalized adjacency
        lut = {}
        for s, r, w in zip(g.senders[:2000], g.receivers[:2000], g.weights[:2000]):
            lut[(int(s), int(r))] = float(w)
        full = {(int(s), int(r)): float(w) for s, r, w in zip(g.senders, g.receivers, g.weights)}
        for (s, r), w in list(lut.items())[:300]:
            assert (r, s) in full
            np.testing.assert_allclose(w, full[(r, s)], rtol=1e-5)


def test_batching_static_shapes(ppi):
    n_pad, e_pad = batch_bounds(ppi.train, 2)
    assert n_pad % 128 == 0 and e_pad % 128 == 0
    shapes = set()
    total_nodes = 0
    for pb in make_batches(ppi.train, 2, n_pad=n_pad, e_pad=e_pad, shuffle=True, seed=1):
        shapes.add((pb.features.shape, pb.labels.shape,
                    pb.batch.graph.num_nodes_padded, pb.batch.graph.num_edges_padded))
        total_nodes += int(pb.batch.graph.n_node)
    assert len(shapes) == 1, f"batches must share one static shape, got {shapes}"
    assert total_nodes == 44906
    # 20 graphs / batch_size 2 = 10 batches
    assert len(list(make_batches(ppi.train, 2, n_pad=n_pad, e_pad=e_pad))) == 10


def test_batch_block_diag_no_cross_edges(ppi):
    n_pad, e_pad = batch_bounds(ppi.valid, 2)
    (pb,) = list(make_batches(ppi.valid, 2, n_pad=n_pad, e_pad=e_pad))
    gid = np.asarray(pb.batch.graph_ids)
    send = np.asarray(pb.batch.graph.senders)
    recv = np.asarray(pb.batch.graph.receivers)
    mask = np.asarray(pb.batch.graph.edge_mask)
    # every edge stays within one member graph
    assert (gid[send[mask]] == gid[recv[mask]]).all()
    assert int(pb.batch.n_graph) == 2


def test_shuffle_changes_order_deterministically(ppi):
    n_pad, e_pad = batch_bounds(ppi.train, 2)
    a = [int(pb.batch.graph.n_node) for pb in
         make_batches(ppi.train, 2, n_pad=n_pad, e_pad=e_pad, shuffle=True, seed=3)]
    b = [int(pb.batch.graph.n_node) for pb in
         make_batches(ppi.train, 2, n_pad=n_pad, e_pad=e_pad, shuffle=True, seed=3)]
    c = [int(pb.batch.graph.n_node) for pb in
         make_batches(ppi.train, 2, n_pad=n_pad, e_pad=e_pad, shuffle=True, seed=4)]
    assert a == b
    assert a != c


def test_inductive_fit_smoke(tmp_path):
    """Tiny synthetic multi-graph problem end-to-end through fit_inductive."""
    import os

    from pygat_tpu.data.ppi import PPIData
    from pygat_tpu.data.synthetic import planted_partition_graph
    from pygat_tpu.models.gat import GATConfig
    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import fit_inductive
    import scipy.sparse as sp
    from pygat_tpu.data.preprocess import normalize_adj

    rng = np.random.default_rng(0)
    R = rng.standard_normal((16, 6)).astype(np.float32)

    def mk(n, name):
        s, r, _ = planted_partition_graph(n, 3, name, avg_degree=6)
        adj = sp.coo_matrix((np.ones(len(s), np.float32), (r, s)), shape=(n, n)).tocsr()
        adj.data[:] = 1.0
        adj = normalize_adj(adj + sp.eye(n, format="csr", dtype=np.float32)).tocoo()
        feats = rng.standard_normal((n, 16)).astype(np.float32)
        labels = (feats @ R > 0.5).astype(np.float32)
        return PPIGraph(feats, labels, adj.col.astype(np.int64),
                        adj.row.astype(np.int64), adj.data.astype(np.float32), n)

    data = PPIData(
        train=[mk(40, f"t{i}") for i in range(4)],
        valid=[mk(30, "v0"), mk(35, "v1")],
        test=[mk(30, "x0"), mk(25, "x1")],
        synthetic_parts=("all",),
    )
    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse", skip_connection=True)
    res = fit_inductive(
        cfg, data, batch_size=2, lr=0.01, weight_decay=0.0, epochs=30, patience=30,
        checkpoint_dir=str(tmp_path), logger=TrainLogger(stream=open(os.devnull, "w")),
        log_batches=False,
    )
    assert res.test_acc > 0.5, f"micro-F1 too low: {res.test_acc}"
    from pygat_tpu.train import checkpoint as ckpt
    kept = [e for e, _ in ckpt.list_checkpoints(str(tmp_path), "ppi")]
    # rotation keeps the best checkpoint plus the final epoch (resume support)
    assert kept == sorted({res.best_epoch, res.epochs_run - 1}), kept


def _synth_ppi():
    """Tiny multi-graph PPIData shared by the loop tests."""
    import scipy.sparse as sp

    from pygat_tpu.data.ppi import PPIData
    from pygat_tpu.data.preprocess import normalize_adj
    from pygat_tpu.data.synthetic import planted_partition_graph

    rng = np.random.default_rng(0)
    R = rng.standard_normal((16, 6)).astype(np.float32)

    def mk(n, name):
        s, r, _ = planted_partition_graph(n, 3, name, avg_degree=6)
        adj = sp.coo_matrix((np.ones(len(s), np.float32), (r, s)), shape=(n, n)).tocsr()
        adj.data[:] = 1.0
        adj = normalize_adj(adj + sp.eye(n, format="csr", dtype=np.float32)).tocoo()
        feats = rng.standard_normal((n, 16)).astype(np.float32)
        labels = (feats @ R > 0.5).astype(np.float32)
        return PPIGraph(feats, labels, adj.col.astype(np.int64),
                        adj.row.astype(np.int64), adj.data.astype(np.float32), n)

    return PPIData(
        train=[mk(40, f"t{i}") for i in range(4)],
        valid=[mk(30, "v0"), mk(35, "v1")],
        test=[mk(30, "x0"), mk(25, "x1")],
        synthetic_parts=("all",),
    )


def test_banked_assembly_matches_block_diag():
    """Device-side bank collate (assemble_banked_batch) == host block_diag:
    same layer outputs on every real row, including with a dead pad slot."""
    import jax
    import jax.numpy as jnp

    from pygat_tpu.data.ppi import assemble_banked_batch, bank_bounds, build_bank
    from pygat_tpu.graph import block_diag
    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
    from pygat_tpu.ops import segment as seg

    data = _synth_ppi()
    n_pg, e_pg = bank_bounds([data.train])
    bank = build_bank(data.train, n_pg, e_pg)

    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse", skip_connection=True)
    params = init_gat(jax.random.PRNGKey(0), cfg)

    members = [data.train[3], data.train[1]]
    x, g, y = assemble_banked_batch(
        bank, jnp.asarray([3, 1], jnp.int32), jnp.asarray([True, True]))
    gh = block_diag([(m.senders, m.receivers, m.weights, m.num_nodes)
                     for m in members], n_pad=2 * n_pg).graph
    fh = np.zeros((2 * n_pg, 128), np.float32)
    n0, n1 = members[0].num_nodes, members[1].num_nodes
    fh[:n0] = np.asarray(bank.features[3][:n0])
    fh[n0:n0 + n1] = np.asarray(bank.features[1][:n1])

    # a dead pad slot (live=False) must not change the live block's output
    x2, g2, _ = assemble_banked_batch(
        bank, jnp.asarray([3, 1], jnp.int32), jnp.asarray([True, False]))

    prev = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = "high"
    try:
        with seg.use_impl("stream"):
            ob = apply_gat(params, cfg, x, g, jax.random.PRNGKey(1), train=False)
            oh = apply_gat(params, cfg, jnp.asarray(fh), gh,
                           jax.random.PRNGKey(1), train=False)
            ob2 = apply_gat(params, cfg, x2, g2, jax.random.PRNGKey(1),
                            train=False)
    finally:
        seg._STREAM_PRECISION = prev
    np.testing.assert_allclose(np.asarray(ob[:n0]), np.asarray(oh[:n0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ob[n_pg:n_pg + n1]),
                               np.asarray(oh[n0:n0 + n1]), atol=1e-4)
    # (atol: dropping block 1's nodes shifts the global softmax bound, a
    # pure exponent re-scaling that moves f32 rounding by ~1e-5)
    np.testing.assert_allclose(np.asarray(ob2[:n0]), np.asarray(ob[:n0]),
                               atol=5e-5)
    assert not bool(g2.node_mask[n_pg:].any())
    assert int(g2.n_node) == n0


def test_inductive_banked_trains_and_resumes(tmp_path):
    """fit_inductive_banked (on-device shuffle/collate, K epochs/dispatch)
    learns the synthetic task and resumes exactly from a chunk
    checkpoint."""
    import os

    from pygat_tpu.models.gat import GATConfig
    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import fit_inductive_banked

    data = _synth_ppi()
    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse", skip_connection=True)
    kw = dict(batch_size=2, lr=0.01, weight_decay=0.0, patience=40,
              epoch_chunk=5, logger=TrainLogger(stream=open(os.devnull, "w")))
    res = fit_inductive_banked(cfg, data, epochs=30,
                               checkpoint_dir=str(tmp_path), **kw)
    assert np.isfinite(res.history).all()
    assert res.test_acc > 0.5, f"micro-F1 too low: {res.test_acc}"
    assert res.epochs_run == 30

    # resume: continue to 40 epochs from the chunk checkpoint; the first 30
    # history entries are preserved verbatim
    res2 = fit_inductive_banked(cfg, data, epochs=40,
                                checkpoint_dir=str(tmp_path), resume=True,
                                **kw)
    assert res2.epochs_run == 40
    np.testing.assert_allclose(np.asarray(res2.history[:30]),
                               np.asarray(res.history), rtol=0)
    assert res2.best_val_loss <= res.best_val_loss + 1e-12


def test_inductive_fast_matches_classic(tmp_path):
    """fit_inductive_fast (scan-over-stacked-batches, one dispatch/epoch)
    reproduces fit_inductive exactly: same batches, same math, dropout off."""
    import os

    from pygat_tpu.data.ppi import PPIData
    from pygat_tpu.data.synthetic import planted_partition_graph
    from pygat_tpu.models.gat import GATConfig
    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import fit_inductive, fit_inductive_fast
    import scipy.sparse as sp
    from pygat_tpu.data.preprocess import normalize_adj

    rng = np.random.default_rng(0)
    R = rng.standard_normal((16, 6)).astype(np.float32)

    def mk(n, name):
        s, r, _ = planted_partition_graph(n, 3, name, avg_degree=6)
        adj = sp.coo_matrix((np.ones(len(s), np.float32), (r, s)), shape=(n, n)).tocsr()
        adj.data[:] = 1.0
        adj = normalize_adj(adj + sp.eye(n, format="csr", dtype=np.float32)).tocoo()
        feats = rng.standard_normal((n, 16)).astype(np.float32)
        labels = (feats @ R > 0.5).astype(np.float32)
        return PPIGraph(feats, labels, adj.col.astype(np.int64),
                        adj.row.astype(np.int64), adj.data.astype(np.float32), n)

    data = PPIData(
        train=[mk(40, f"t{i}") for i in range(4)],
        valid=[mk(30, "v0"), mk(35, "v1")],
        test=[mk(30, "x0"), mk(25, "x1")],
        synthetic_parts=("all",),
    )
    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse", skip_connection=True)
    kw = dict(batch_size=2, lr=0.01, weight_decay=0.0, epochs=8, patience=8,
              checkpoint_dir=None,
              logger=TrainLogger(stream=open(os.devnull, "w")))
    a = fit_inductive(cfg, data, log_batches=False, **kw)
    b = fit_inductive_fast(cfg, data, **kw)
    np.testing.assert_allclose(np.asarray(b.history), np.asarray(a.history),
                               rtol=2e-4)
    assert a.best_epoch == b.best_epoch
    np.testing.assert_allclose(b.test_acc, a.test_acc, atol=2e-3)


def test_banked_chunking_never_changes_selection():
    """The banked loop's early-stop contract (VERDICT r3 item 9): chunked
    execution may OVERSHOOT in compute but never in selection. epoch_chunk=1
    is exactly the host-per-epoch policy (the host checks patience after
    every epoch); any larger chunk must stop at the same epoch, select the
    same best epoch/val, and produce the same test score — the device-side
    patience gate keeps overshoot epochs from updating the best model."""
    import os

    from pygat_tpu.models.gat import GATConfig
    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import fit_inductive_banked

    data = _synth_ppi()
    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse", skip_connection=True)
    # high lr -> oscillating val loss, so the final chunk's overshoot
    # epochs WILL dip below the pre-stop best (the case the gate exists for)
    kw = dict(batch_size=2, lr=0.08, weight_decay=0.0, epochs=60, patience=4,
              checkpoint_dir=None,
              logger=TrainLogger(stream=open(os.devnull, "w")))
    a = fit_inductive_banked(cfg, data, epoch_chunk=1, **kw)
    b = fit_inductive_banked(cfg, data, epoch_chunk=16, **kw)

    assert a.epochs_run < 60, "task must early-stop for this test to bite"
    assert b.epochs_run == a.epochs_run
    assert b.best_epoch == a.best_epoch
    np.testing.assert_allclose(b.best_val_loss, a.best_val_loss, rtol=0)
    np.testing.assert_allclose(np.asarray(b.history), np.asarray(a.history),
                               rtol=0)
    assert b.test_acc == a.test_acc
    # selection invariant: the best model is the argmin of the HOST-visible
    # history (strict-< keeps the first minimum, matching np.argmin)
    for r in (a, b):
        assert r.best_epoch == int(np.argmin(r.history))
        np.testing.assert_allclose(r.best_val_loss, min(r.history), rtol=0)


def test_banked_dp_matches_single_device():
    """make_banked_epochs over the mesh 'data' axis == the exact same DP
    math unsharded (``dp=`` slots, no mesh): sharding constraints and
    GSPMD partitioning must never change results. Also checks the DP loop
    learns (f1 rises across the chunk)."""
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from pygat_tpu.data.ppi import bank_bounds, build_bank
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.parallel import make_mesh
    from pygat_tpu.train.loop import make_banked_epochs
    from pygat_tpu.train.state import init_state, make_optimizer

    data = _synth_ppi()
    cfg = GATConfig(nlayers=2, nheads=(2, 2), nfeats=(128, 16, 6),
                    dropout=0.0, alpha=0.2, layer_type="GAT_sparse",
                    skip_connection=True)
    n_pg, e_pg = bank_bounds([data.train, data.valid])
    bank_tr = build_bank(data.train, n_pg, e_pg)
    bank_va = build_bank(data.valid, n_pg, e_pg)
    tx = make_optimizer(0.01, 0.0)
    params = init_gat(jax.random.PRNGKey(7), cfg)

    d = 4
    mesh = make_mesh(d, 1, devices=jax.devices()[:d])

    def run_chunk(mesh_, dp_):
        state = init_state(params, tx, jax.random.PRNGKey(1))
        run = make_banked_epochs(cfg, tx, 1, len(data.train),
                                 len(data.valid), 6, patience=None,
                                 mesh=mesh_, dp=dp_)
        carry = (state, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf),
                 state.params, jnp.asarray(-1, jnp.int32))
        carry, metrics = run(carry, bank_tr, bank_va,
                             jnp.asarray(100, jnp.int32))
        return carry, jax.device_get(metrics)

    carry_dp, m_dp = run_chunk(mesh, None)
    carry_ref, m_ref = run_chunk(None, d)

    # identical math: per-epoch metrics and final params agree
    for a, b in zip(m_dp, m_ref):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ravel_pytree(carry_dp[0].params)[0],
                               ravel_pytree(carry_ref[0].params)[0],
                               rtol=2e-3, atol=2e-4)
    # and the DP loop actually learns on the synthetic task
    assert np.isfinite(m_dp[0]).all()
    assert m_dp[3][-1] > m_dp[3][0]  # val f1 improves over the chunk
