"""Ring halo-exchange attention (shard_map + ppermute + online segment
softmax) vs the single-device XLA path — forward and gradients — on the
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.ops.sparse_attention import _xla_forward
from pygat_tpu.parallel import make_mesh
from pygat_tpu.parallel.partition import EdgePartition, partition_edges, ring_gat_attention


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    n = 400
    dense = rng.random((n, n)) < 0.04
    np.fill_diagonal(dense, True)
    recv, send = np.nonzero(dense)
    g = build_graph(send, recv, None, n, n_pad=512)
    H, F = 2, 16
    fd = jnp.asarray(rng.standard_normal((H, 512)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((H, 512)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 512, F)).astype(np.float32))
    return g, fd, fs, wh


def test_partition_edges_layout(setup):
    g, fd, fs, wh = setup
    part = partition_edges(g, 4)
    assert part.n_local == 128
    em = np.asarray(part.edge_mask)
    assert em.sum() == int(g.n_edge)
    # block (d, s) holds edges from shard s to shard d with local indices
    rl = np.asarray(part.recv_local)
    sl = np.asarray(part.send_local)
    assert rl[em].max() < 128 and sl[em].max() < 128
    recv_glob = (np.arange(4)[:, None, None] * 128 + rl)[em]
    send_glob = (np.arange(4)[None, :, None] * 128 + sl)[em]
    mask = np.asarray(g.edge_mask)
    want = set(zip(np.asarray(g.receivers)[mask].tolist(),
                   np.asarray(g.senders)[mask].tolist()))
    assert set(zip(recv_glob.tolist(), send_glob.tolist())) == want


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_matches_single_device(setup, n_shards):
    g, fd, fs, wh = setup
    mesh = make_mesh(n_shards, 1, devices=jax.devices()[:n_shards])
    part = partition_edges(g, n_shards)
    out_ring = ring_gat_attention(fd, fs, wh, part, mesh, alpha=0.2)
    out_ref = _xla_forward(fd, fs, wh, g.senders, g.receivers, g.edge_mask, 0.2)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


def test_ring_gradients_match(setup):
    g, fd, fs, wh = setup
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    part = partition_edges(g, 4)

    def loss_ring(fd, fs, wh):
        return jnp.sum(jnp.sin(ring_gat_attention(fd, fs, wh, part, mesh, alpha=0.2)))

    def loss_ref(fd, fs, wh):
        return jnp.sum(jnp.sin(_xla_forward(fd, fs, wh, g.senders, g.receivers,
                                            g.edge_mask, 0.2)))

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(fd, fs, wh)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(fd, fs, wh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# Ring attention wired into a full train step (VERDICT r1 item 5):
# ring step == GSPMD step over several optimizer steps, v1 AND v2.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("layer_type", ["GAT_sparse", "GATv2_sparse"])
def test_ring_train_step_matches_gspmd(layer_type):
    from pygat_tpu.data import synthetic
    from pygat_tpu.data.citation import CitationDataset
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.parallel.distributed import sharded_fit_inputs
    from pygat_tpu.parallel.ring_model import make_ring_transductive_steps
    from pygat_tpu.train.loop import make_transductive_steps
    from pygat_tpu.train.state import init_state, make_optimizer

    n = 300
    s, r, labels = synthetic.planted_partition_graph(n, 4, "ring", avg_degree=8)
    s = np.concatenate([s, np.arange(n)])
    r = np.concatenate([r, np.arange(n)])
    g = build_graph(s, r, None, n, n_pad=512)
    feats = synthetic.class_features(labels, 32, "ring", density=0.2)
    x = np.zeros((512, 64), np.float32)
    x[:n, :32] = feats
    lab = np.full(512, -1, np.int32)
    lab[:n] = labels
    data = CitationDataset(
        graph=g, features=jnp.asarray(x), labels=jnp.asarray(lab),
        idx_train=jnp.arange(128), idx_val=jnp.arange(150, 214),
        idx_test=jnp.arange(214, 300), num_classes=4, num_features=32,
        synthetic_parts=("all",),
    )
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(64, 8, 4), dropout=0.0,
                    alpha=0.2, layer_type=layer_type, skip_connection=True)
    tx = make_optimizer(0.01, 5e-4)
    params = init_gat(jax.random.PRNGKey(0), cfg)

    # reference trajectory: GSPMD single-device step
    state_a = init_state(params, tx, jax.random.PRNGKey(1))
    step_a, eval_a = make_transductive_steps(cfg, tx)
    losses_a = []
    for _ in range(5):
        state_a, loss, acc, _ = step_a(state_a, data.features, data.graph,
                                       data.labels, data.idx_train)
        losses_a.append(float(loss))

    # ring trajectory on a (4, 2) mesh with sharded inputs
    mesh = make_mesh(4, 2)
    part = partition_edges(g, 4)
    sdata, sstate = sharded_fit_inputs(
        data, init_state(params, tx, jax.random.PRNGKey(1)), mesh
    )
    step_b, eval_b = make_ring_transductive_steps(cfg, tx, part, mesh)
    losses_b = []
    state_b = sstate
    for _ in range(5):
        state_b, loss, acc, _ = step_b(state_b, sdata.features, sdata.labels,
                                       sdata.idx_train)
        losses_b.append(float(loss))

    np.testing.assert_allclose(losses_b, losses_a, rtol=2e-4, atol=1e-5)
    lv_a = float(eval_a(state_a.params, data.features, data.graph,
                        data.labels, data.idx_val)[0])
    lv_b = float(eval_b(state_b.params, sdata.features, sdata.labels,
                        sdata.idx_val)[0])
    np.testing.assert_allclose(lv_b, lv_a, rtol=2e-4, atol=1e-5)


def test_ring_v2_attention_matches_layer(setup):
    """ring_gat_attention_v2 == the single-device v2 segment-softmax math."""
    from pygat_tpu.ops.segment import segment_softmax_stable, segment_sum
    from pygat_tpu.parallel.partition import ring_gat_attention_v2

    g, _, _, wh = setup
    rng = np.random.default_rng(9)
    H, F = wh.shape[0], wh.shape[-1]
    whi = jnp.asarray(rng.standard_normal((H, 512, F)).astype(np.float32))
    whj = jnp.asarray(rng.standard_normal((H, 512, F)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((H, F)).astype(np.float32))
    alpha = 0.2

    def one_head(wi, wj, ah):
        pre = wi[g.receivers] + wj[g.senders]
        logit = jnp.where(pre >= 0, pre, alpha * pre) @ ah
        num, den = segment_softmax_stable(
            logit, g.receivers, 512, edge_mask=g.edge_mask, row_ptr=g.row_ptr
        )
        out = segment_sum(num[:, None] * wi[g.senders], g.receivers, 512)
        return out / jnp.where(den > 0, den, 1.0)[:, None]

    want = jax.vmap(one_head)(whi, whj, a)
    mesh = make_mesh(4, 2)
    part = partition_edges(g, 4)
    got = ring_gat_attention_v2(whi, whj, a, part, mesh, alpha=alpha)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
