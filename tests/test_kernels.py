"""Kernel-layer tests: SpMM/SDDMM custom VJPs vs autodiff of a dense oracle,
fused Pallas attention (interpret mode) vs the XLA segment path, forward and
gradient (SURVEY §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.ops.sddmm import sddmm_graph
from pygat_tpu.ops.spmm import spmm_graph
from tests.legacy_bcsr.sparse_attention import _xla_forward, gat_attention_v1
from tests.legacy_bcsr.tiles import EDGE_CHUNK, tile_graph, tile_stats


@pytest.fixture
def small_graph(rng):
    n = 150
    dense = rng.random((n, n)) < 0.07
    np.fill_diagonal(dense, True)
    recv, send = np.nonzero(dense)
    g = build_graph(send, recv, None, n, n_pad=256)
    return g, n, recv, send


def test_spmm_forward_and_grads(small_graph, rng):
    g, n, recv, send = small_graph
    e_pad = g.num_edges_padded
    vals = jnp.asarray(rng.standard_normal(e_pad).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32))

    def dense_ref(vals, b):
        a = jnp.zeros((256, 256)).at[g.receivers, g.senders].set(
            jnp.where(g.edge_mask, vals, 0.0)
        )
        return a @ b

    def loss_sp(vals, b):
        return jnp.sum(jnp.cos(spmm_graph(vals, b, g)))

    def loss_dn(vals, b):
        return jnp.sum(jnp.cos(dense_ref(vals, b)))

    v1, g1 = jax.value_and_grad(loss_sp, argnums=(0, 1))(vals, b)
    v2, g2 = jax.value_and_grad(loss_dn, argnums=(0, 1))(vals, b)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[0])[np.asarray(g.edge_mask)],
                               np.asarray(g2[0])[np.asarray(g.edge_mask)],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-5)


def test_sddmm_forward_and_grads(small_graph, rng):
    g, n, recv, send = small_graph
    a = jnp.asarray(rng.standard_normal((256, 12)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256, 12)).astype(np.float32))

    out = sddmm_graph(a, b, g)
    mask = np.asarray(g.edge_mask)
    want = np.einsum(
        "ef,ef->e", np.asarray(a)[np.asarray(g.receivers)], np.asarray(b)[np.asarray(g.senders)]
    )
    np.testing.assert_allclose(np.asarray(out)[mask], want[mask], rtol=1e-4)
    assert (np.asarray(out)[~mask] == 0).all()

    # grads vs autodiff through an explicit gather formulation
    def loss_custom(a, b):
        return jnp.sum(jnp.sin(sddmm_graph(a, b, g)))

    def loss_ref(a, b):
        o = jnp.sum(a[g.receivers] * b[g.senders], axis=-1)
        o = jnp.where(g.edge_mask, o, 0.0)
        return jnp.sum(jnp.sin(o) * g.edge_mask)

    g1 = jax.grad(loss_custom, argnums=(0, 1))(a, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


def test_tile_graph_structure(small_graph):
    g, n, recv, send = small_graph
    tiles = tile_graph(g)
    assert tiles.num_chunks % 8 == 0
    stats = tile_stats(tiles)
    assert stats["real_edges"] == int(g.n_edge)
    # chunks row-major
    cr = np.asarray(tiles.chunk_row)
    assert (np.diff(cr) >= 0).all()
    # every tile present
    assert set(cr.tolist()) == set(range(tiles.n_tiles))
    # locals in range
    assert np.asarray(tiles.recv_local).max() < 128
    assert np.asarray(tiles.send_local).max() < 128
    # reconstruct the edge set from tiles
    v = np.asarray(tiles.valid).astype(bool)
    rr = (cr[:, None] * 128 + np.asarray(tiles.recv_local))[v]
    ss = (np.asarray(tiles.chunk_col)[:, None] * 128 + np.asarray(tiles.send_local))[v]
    got = set(zip(rr.tolist(), ss.tolist()))
    want = set(zip(recv.tolist(), send.tolist()))
    assert got == want


def test_fused_attention_interpret_matches_xla(small_graph, rng):
    g, n, recv, send = small_graph
    tiles = tile_graph(g)
    H, F = 2, 128
    fd = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 256, F)).astype(np.float32))
    o1 = gat_attention_v1(fd, fs, wh, g, tiles, alpha=0.2, backend="pallas",
                          interpret=True)
    o2 = _xla_forward(fd, fs, wh, g.senders, g.receivers, g.edge_mask, 0.2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-5)


def test_fused_attention_grads_match_xla(small_graph, rng):
    g, n, recv, send = small_graph
    tiles = tile_graph(g)
    H, F = 2, 128
    fd = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 256, F)).astype(np.float32))

    def lp(fd, fs, wh):
        o = gat_attention_v1(fd, fs, wh, g, tiles, alpha=0.2, backend="pallas",
                             interpret=True)
        return jnp.sum(jnp.sin(o) * 0.1)

    def lx(fd, fs, wh):
        o = _xla_forward(fd, fs, wh, g.senders, g.receivers, g.edge_mask, 0.2)
        return jnp.sum(jnp.sin(o) * 0.1)

    g1 = jax.grad(lp, argnums=(0, 1, 2))(fd, fs, wh)
    g2 = jax.grad(lx, argnums=(0, 1, 2))(fd, fs, wh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_fused_attention_numerical_stability(small_graph, rng):
    """Huge logit components must not overflow (reference README:30 concern)."""
    g, n, recv, send = small_graph
    tiles = tile_graph(g)
    fd = jnp.full((1, 256), 300.0)
    fs = jnp.full((1, 256), 300.0)
    wh = jnp.asarray(rng.standard_normal((1, 256, 128)).astype(np.float32))
    o = gat_attention_v1(fd, fs, wh, g, tiles, alpha=0.2, backend="pallas",
                         interpret=True)
    assert bool(jnp.isfinite(o).all())


def test_fused_dropout_matches_xla_same_mask(small_graph, rng):
    """Attention dropout: both backends draw the keep mask from the same
    jax PRNG key, so fused (interpret) and XLA must agree exactly."""
    g, n, recv, send = small_graph
    tiles = tile_graph(g)
    H, F = 2, 128
    fd = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 256, F)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    o1 = gat_attention_v1(fd, fs, wh, g, tiles, alpha=0.2, backend="pallas",
                          interpret=True, dropout_rate=0.5, dropout_rng=key,
                          train=True)
    o2 = gat_attention_v1(fd, fs, wh, g, None, alpha=0.2, backend="xla",
                          dropout_rate=0.5, dropout_rng=key, train=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-5)
    # and it must differ from the no-dropout output
    o3 = gat_attention_v1(fd, fs, wh, g, tiles, alpha=0.2, backend="pallas",
                          interpret=True)
    assert float(jnp.abs(o1 - o3).max()) > 1e-3


def test_fused_dropout_grads_match_xla(small_graph, rng):
    g, n, recv, send = small_graph
    tiles = tile_graph(g)
    H, F = 2, 128
    fd = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((H, 256)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 256, F)).astype(np.float32))
    key = jax.random.PRNGKey(3)

    def lp(fd, fs, wh):
        o = gat_attention_v1(fd, fs, wh, g, tiles, alpha=0.2, backend="pallas",
                             interpret=True, dropout_rate=0.4, dropout_rng=key,
                             train=True)
        return jnp.sum(jnp.sin(o) * 0.1)

    def lx(fd, fs, wh):
        o = gat_attention_v1(fd, fs, wh, g, None, alpha=0.2, backend="xla",
                             dropout_rate=0.4, dropout_rng=key, train=True)
        return jnp.sum(jnp.sin(o) * 0.1)

    g1 = jax.grad(lp, argnums=(0, 1, 2))(fd, fs, wh)
    g2 = jax.grad(lx, argnums=(0, 1, 2))(fd, fs, wh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
