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
