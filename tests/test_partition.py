"""Ring halo-exchange attention (shard_map + ppermute + per-shard segment
reductions) vs the single-device XLA path — forward and gradients — on the
8-device CPU mesh. Includes stream-layout (Pallas kernel, interpret mode)
vs scatter-fallback equivalence for the multi-chip fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.ops import segment as seg
from tests.legacy_bcsr.sparse_attention import _xla_forward
from pygat_tpu.parallel import make_mesh
from pygat_tpu.parallel.partition import (
    EdgePartition,
    partition_edges,
    ring_gat_attention,
)

H, F = 2, 16


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    n = 400
    dense = rng.random((n, n)) < 0.04
    np.fill_diagonal(dense, True)
    recv, send = np.nonzero(dense)
    g = build_graph(send, recv, None, n, n_pad=512)
    fd = jnp.asarray(rng.standard_normal((H, 512)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 512, F)).astype(np.float32))
    a_src = jnp.asarray(rng.standard_normal((H, F)).astype(np.float32))
    return g, fd, wh, a_src


def _to_whf(wh):  # [H, N, F] -> [N, H*F]
    return jnp.moveaxis(wh, 0, 1).reshape(wh.shape[1], -1)


def _from_out(out, h=H):  # [N, H*F] -> [H, N, F]
    n = out.shape[0]
    return jnp.moveaxis(out.reshape(n, h, -1), 0, 1)


def test_partition_edges_layout(setup):
    g, fd, wh, a_src = setup
    part = partition_edges(g, 4)
    assert part.n_local == 128
    assert part.has_stream  # 128 % 128 == 0 -> stream-aligned blocks
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
    # per-block receivers stay sorted through the stream padding
    for d in range(4):
        for s in range(4):
            assert (np.diff(rl[d, s]) >= 0).all()
    # dead slots never fire the one-hot
    loc = np.asarray(part.local)
    assert (loc[~em] == 128).all()
    np.testing.assert_array_equal(rl[em] % 128, loc[em])


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_matches_single_device(setup, n_shards):
    g, fd, wh, a_src = setup
    mesh = make_mesh(n_shards, 1, devices=jax.devices()[:n_shards])
    part = partition_edges(g, n_shards)
    fs = jnp.einsum("hnf,hf->hn", wh, a_src)
    out_ring = ring_gat_attention(fd.T, _to_whf(wh), a_src, part, mesh,
                                  alpha=0.2)
    out_ref = _xla_forward(fd, fs, wh, g.senders, g.receivers, g.edge_mask, 0.2)
    np.testing.assert_allclose(np.asarray(_from_out(out_ring)),
                               np.asarray(out_ref), rtol=1e-4, atol=1e-5)


def test_ring_gradients_match(setup):
    g, fd, wh, a_src = setup
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    part = partition_edges(g, 4)
    fdT, whf = fd.T, _to_whf(wh)

    def loss_ring(fdT, whf, a_src):
        return jnp.sum(jnp.sin(
            ring_gat_attention(fdT, whf, a_src, part, mesh, alpha=0.2)
        ))

    def loss_ref(fdT, whf, a_src):
        wh_ = jnp.moveaxis(whf.reshape(512, H, F), 0, 1)
        fs = jnp.einsum("hnf,hf->hn", wh_, a_src)
        return jnp.sum(jnp.sin(_xla_forward(
            fdT.T, fs, wh_, g.senders, g.receivers, g.edge_mask, 0.2
        )))

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(fdT, whf, a_src)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(fdT, whf, a_src)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_ring_stream_matches_scatter(setup, variant):
    """THE multi-chip fast path: per-shard stream-scatter kernels (interpret
    mode on CPU) inside the ring == the sorted-scatter fallback, forward
    and gradients (VERDICT r2 item 1 done-condition)."""
    from pygat_tpu.parallel.partition import ring_gat_attention_v2

    g, fd, wh, a_src = setup
    mesh = make_mesh(4, 2)
    part = partition_edges(g, 4)
    assert part.has_stream
    rng = np.random.default_rng(7)
    whj = jnp.asarray(rng.standard_normal((512, H * F)).astype(np.float32))
    fdT, whf = fd.T, _to_whf(wh)

    if variant == "v1":
        def run(fdT, whf, a_src):
            return ring_gat_attention(fdT, whf, a_src, part, mesh, alpha=0.2)
        args = (fdT, whf, a_src)
    else:
        def run(whi, whj, a):
            return ring_gat_attention_v2(whi, whj, a, part, mesh, alpha=0.2)
        args = (whf, whj, a_src)

    def value_and_grads(impl):
        with seg.use_impl(impl):
            out = run(*args)
            grads = jax.grad(lambda *a: jnp.sum(jnp.sin(run(*a))),
                             argnums=tuple(range(len(args))))(*args)
        return out, grads

    out_sc, g_sc = value_and_grads("scatter")
    # two-limb kernel precision (~1e-5 per reduction) for a strict check
    prev_prec = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = "high"
    try:
        out_st, g_st = value_and_grads("stream")
    finally:
        seg._STREAM_PRECISION = prev_prec
    scale = float(jnp.abs(out_sc).max())
    np.testing.assert_allclose(np.asarray(out_st), np.asarray(out_sc),
                               atol=1e-3 * scale)
    for a, b in zip(g_st, g_sc):
        s = float(jnp.abs(b).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3 * s)


# ---------------------------------------------------------------------------
# Ring attention wired into a full train step (VERDICT r1 item 5):
# ring step == GSPMD step over several optimizer steps, v1 AND v2.
# ---------------------------------------------------------------------------


def _ring_dataset():
    from pygat_tpu.data import synthetic
    from pygat_tpu.data.citation import CitationDataset

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
    return CitationDataset(
        graph=g, features=jnp.asarray(x), labels=jnp.asarray(lab),
        idx_train=jnp.arange(128), idx_val=jnp.arange(150, 214),
        idx_test=jnp.arange(214, 300), num_classes=4, num_features=32,
        synthetic_parts=("all",),
    )


@pytest.mark.parametrize("layer_type", ["GAT_sparse", "GATv2_sparse"])
def test_ring_train_step_matches_gspmd(layer_type):
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.parallel.distributed import sharded_fit_inputs
    from pygat_tpu.parallel.ring_model import make_ring_transductive_steps
    from pygat_tpu.train.loop import make_transductive_steps
    from pygat_tpu.train.state import init_state, make_optimizer

    data = _ring_dataset()
    g = data.graph
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


@pytest.mark.parametrize("layer_type", ["GAT_sparse", "GATv2_sparse"])
def test_ring_stream_train_step_matches_gspmd(layer_type):
    """Full train steps through the per-shard STREAM kernels (interpret
    mode) track the single-device GSPMD trajectory — the 'fast kernel
    exists multi-chip' acceptance test."""
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.parallel.distributed import sharded_fit_inputs
    from pygat_tpu.parallel.ring_model import make_ring_transductive_steps
    from pygat_tpu.train.loop import make_transductive_steps
    from pygat_tpu.train.state import init_state, make_optimizer

    data = _ring_dataset()
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(64, 8, 4), dropout=0.0,
                    alpha=0.2, layer_type=layer_type, skip_connection=True)
    tx = make_optimizer(0.01, 5e-4)
    params = init_gat(jax.random.PRNGKey(0), cfg)

    state_a = init_state(params, tx, jax.random.PRNGKey(1))
    step_a, _ = make_transductive_steps(cfg, tx)
    losses_a = []
    for _ in range(3):
        state_a, loss, *_ = step_a(state_a, data.features, data.graph,
                                   data.labels, data.idx_train)
        losses_a.append(float(loss))

    mesh = make_mesh(4, 2)
    part = partition_edges(data.graph, 4)
    assert part.has_stream
    sdata, sstate = sharded_fit_inputs(
        data, init_state(params, tx, jax.random.PRNGKey(1)), mesh
    )
    with seg.use_impl("stream"):
        step_b, _ = make_ring_transductive_steps(cfg, tx, part, mesh)
        losses_b = []
        state_b = sstate
        for _ in range(3):
            state_b, loss, *_ = step_b(state_b, sdata.features, sdata.labels,
                                       sdata.idx_train)
            losses_b.append(float(loss))
    # stream kernel runs at bf16-class ('fastest') precision
    np.testing.assert_allclose(losses_b, losses_a, rtol=3e-3)


def test_ring_v2_attention_matches_layer(setup):
    """ring_gat_attention_v2 == the single-device v2 segment-softmax math."""
    from pygat_tpu.ops.segment import segment_softmax_stable, segment_sum
    from pygat_tpu.parallel.partition import ring_gat_attention_v2

    g, _, wh, a_src = setup
    rng = np.random.default_rng(9)
    whi = jnp.asarray(rng.standard_normal((H, 512, F)).astype(np.float32))
    whj = jnp.asarray(rng.standard_normal((H, 512, F)).astype(np.float32))
    a = a_src
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
    got = ring_gat_attention_v2(_to_whf(whi), _to_whf(whj), a, part, mesh,
                                alpha=alpha)
    np.testing.assert_allclose(np.asarray(_from_out(got)), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Balance interleave (round 4): cyclic node relabel feeding the ring path.
# ---------------------------------------------------------------------------


def _idlocal_dataset():
    """Synthetic citation stand-in whose edges are id-local (like RCM
    output), so the contiguous partition is diagonal-heavy."""
    import __graft_entry__ as ge

    return ge._synthetic_citation(900, 64, 3, "interleave-test", n_pad=1024)


def test_interleave_preserves_dataset_semantics():
    from pygat_tpu.data.citation import interleave_citation

    data = _idlocal_dataset()
    d = 4
    out = interleave_citation(data, d)
    g0, g1 = data.graph, out.graph
    assert int(g1.n_node) == int(g0.n_node)
    assert int(g1.n_edge) == int(g0.n_edge)
    assert int(g1.node_mask.sum()) == int(g0.node_mask.sum())
    # real node v moved to (v % d) * n_local + v // d; features and labels
    # moved with it, idx arrays remapped through the same permutation
    n_real = int(g0.n_node)
    n_local = g1.num_nodes_padded // d
    v = np.arange(n_real)
    new = (v % d) * n_local + v // d
    np.testing.assert_array_equal(np.asarray(out.labels)[new],
                                  np.asarray(data.labels)[:n_real])
    np.testing.assert_allclose(np.asarray(out.features)[new],
                               np.asarray(data.features)[:n_real])
    np.testing.assert_array_equal(np.asarray(out.idx_test),
                                  new[np.asarray(data.idx_test)])
    # same multiset of edges under the relabeling
    m0, m1 = np.asarray(g0.edge_mask), np.asarray(g1.edge_mask)
    e0 = {(int(new[s]), int(new[r]))
          for s, r in zip(np.asarray(g0.senders)[m0],
                          np.asarray(g0.receivers)[m0])}
    e1 = {(int(s), int(r))
          for s, r in zip(np.asarray(g1.senders)[m1],
                          np.asarray(g1.receivers)[m1])}
    assert e0 == e1
    # per-shard real rows are a prefix of the shard range, dummy stays free
    mask = np.asarray(g1.node_mask).reshape(d, n_local)
    assert not mask[-1, -1]
    for s in range(d):
        k = int(mask[s].sum())
        assert mask[s, :k].all() and not mask[s, k:].any()


def test_interleave_balances_ring_blocks():
    """On an id-local graph the interleave must not increase the padded
    block length, and the balanced per-block max must drop toward the
    mean (diagonal self loops are the floor)."""
    from pygat_tpu.data.citation import interleave_citation

    data = _idlocal_dataset()
    d = 4
    out = interleave_citation(data, d)
    p0 = partition_edges(data.graph, d)
    p1 = partition_edges(out.graph, d)
    assert p1.recv_local.shape[2] <= p0.recv_local.shape[2]

    def max_block(g):
        m = np.asarray(g.edge_mask)
        send = np.asarray(g.senders)[m]
        recv = np.asarray(g.receivers)[m]
        nl = g.num_nodes_padded // d
        c = np.zeros((d, d), np.int64)
        np.add.at(c, (recv // nl, send // nl), 1)
        return int(c.max())

    assert max_block(out.graph) < max_block(data.graph)


def test_interleaved_ring_matches_plain_forward():
    """ring attention on the interleaved graph == single-device XLA on the
    ORIGINAL graph, compared through the permutation."""
    from pygat_tpu.data.citation import interleave_citation
    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
    from pygat_tpu.parallel.ring_model import ring_apply_gat

    data = _idlocal_dataset()
    d = 4
    out = interleave_citation(data, d)
    n_real = int(data.graph.n_node)
    n_local = out.graph.num_nodes_padded // d
    v = np.arange(n_real)
    new = (v % d) * n_local + v // d

    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(64, 8, 3),
                    dropout=0.0, alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(7), cfg)
    key = jax.random.PRNGKey(0)
    want = apply_gat(params, cfg, data.features, data.graph, key, train=False)
    mesh = make_mesh(d, 2)
    from pygat_tpu.parallel.partition import partition_edges as pe
    part = pe(out.graph, d)
    got = ring_apply_gat(params, cfg, out.features, part, mesh, key,
                         train=False)
    np.testing.assert_allclose(np.asarray(got)[new],
                               np.asarray(want)[:n_real],
                               rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Halo compression (round 5): direct per-pair halo exchange vs the full
# rotation — metadata invariants, forward parity, gradient parity, and the
# stream-kernel variant.
# ---------------------------------------------------------------------------


def test_halo_metadata_invariants(setup):
    g, fd, wh, a_src = setup
    d = 4
    part = partition_edges(g, d)
    assert part.has_halo and part.h_rows % 128 == 0
    hidx = np.asarray(part.halo_idx)
    hs = np.asarray(part.h_send)
    sl = np.asarray(part.send_local)
    em = np.asarray(part.edge_mask)
    for di in range(d):
        for si in range(d):
            if di == si:
                continue
            live = em[di, si]
            # halo positions decode back to the original local sender ids
            np.testing.assert_array_equal(
                hidx[si, di][hs[di, si][live]], sl[di, si][live])
            # halo list covers exactly the block's unique senders
            u = np.unique(sl[di, si][live])
            assert set(u.tolist()) <= set(hidx[si, di].tolist())


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_ring_halo_matches_single_device(setup, n_shards):
    g, fd, wh, a_src = setup
    mesh = make_mesh(n_shards, 1, devices=jax.devices()[:n_shards])
    part = partition_edges(g, n_shards)
    fs = jnp.einsum("hnf,hf->hn", wh, a_src)
    out_ring = ring_gat_attention(fd.T, _to_whf(wh), a_src, part, mesh,
                                  alpha=0.2, halo=True)
    out_ref = _xla_forward(fd, fs, wh, g.senders, g.receivers, g.edge_mask,
                           0.2)
    np.testing.assert_allclose(np.asarray(_from_out(out_ring)),
                               np.asarray(out_ref), rtol=1e-4, atol=1e-5)


def test_ring_halo_gradients_match(setup):
    g, fd, wh, a_src = setup
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    part = partition_edges(g, 4)
    fdT, whf = fd.T, _to_whf(wh)

    def loss(fdT, whf, a_src, halo):
        return jnp.sum(jnp.sin(
            ring_gat_attention(fdT, whf, a_src, part, mesh, alpha=0.2,
                               halo=halo)))

    g_h = jax.grad(loss, argnums=(0, 1, 2))(fdT, whf, a_src, True)
    g_r = jax.grad(loss, argnums=(0, 1, 2))(fdT, whf, a_src, False)
    for a, b in zip(g_h, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("layer_type", ["GAT_sparse", "GATv2_sparse"])
@pytest.mark.parametrize("stream", [False, True])
def test_ring_halo_model_matches_rotation(layer_type, stream):
    """Full ring_apply_gat with halo == full rotation (fwd + grads), under
    both the scatter fallback and the per-shard stream/fused kernels."""
    from jax.flatten_util import ravel_pytree

    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.parallel.ring_model import ring_apply_gat

    rng = np.random.default_rng(11)
    n = 700
    d = 4
    dense = rng.random((n, n)) < 0.02
    np.fill_diagonal(dense, True)
    recv, send = np.nonzero(dense)
    g = build_graph(send, recv, None, n, n_pad=1024)
    mesh = make_mesh(d, 1, devices=jax.devices()[:d])
    part = partition_edges(g, d)
    cfg = GATConfig(nlayers=2, nheads=(4, 2), nfeats=(24, 8, 5),
                    dropout=0.0, alpha=0.2, layer_type=layer_type)
    params = init_gat(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1024, 24)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    impl = "stream" if stream else "scatter"
    prev = seg._STREAM_PRECISION
    seg._STREAM_PRECISION = "high"
    try:
        with seg.use_impl(impl):
            def loss(p, halo):
                out = ring_apply_gat(p, cfg, x, part, mesh, key,
                                     train=False, halo=halo)
                return jnp.sum(jnp.sin(out)), out

            (l_h, o_h), gr_h = jax.value_and_grad(
                loss, has_aux=True)(params, True)
            (l_r, o_r), gr_r = jax.value_and_grad(
                loss, has_aux=True)(params, False)
    finally:
        seg._STREAM_PRECISION = prev
    np.testing.assert_allclose(np.asarray(o_h), np.asarray(o_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ravel_pytree(gr_h)[0], ravel_pytree(gr_r)[0],
                               rtol=1e-3, atol=1e-5)
