"""Stream-scatter kernel (ops/stream.py) correctness.

CPU tests run the kernel in interpreter mode on small graphs; the
``PYGAT_TPU_TESTS=1`` test runs the COMPILED Mosaic kernel on a real TPU
and pins pallas==xla numerics there (VERDICT r1 item 1).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.ops import segment as seg
from pygat_tpu.ops.stream import (
    EC,
    build_stream_layout,
    stream_length,
    stream_scatter,
)


@pytest.fixture()
def graph():
    rng = np.random.default_rng(7)
    n = 300
    s = np.concatenate([rng.integers(0, n, 1400), np.arange(n)])
    r = np.concatenate([rng.integers(0, n, 1400), np.arange(n)])
    return build_graph(s, r, None, n)


def test_graph_carries_stream_layout(graph):
    g = graph
    assert g.r_local is not None and g.r_chunk is not None
    assert g.c_slot is not None and g.c_local is not None
    e_s = g.num_edges_padded
    assert e_s % EC == 0 and g.r_local.shape == (e_s,)
    # every chunk's live receivers live inside its declared 128-row tile
    recv = np.asarray(g.receivers)
    mask = np.asarray(g.edge_mask)
    chunk_tile = np.asarray(g.r_chunk)
    local = np.asarray(g.r_local)
    for c in range(e_s // EC):
        sl = slice(c * EC, (c + 1) * EC)
        live = mask[sl]
        assert (recv[sl][live] // 128 == chunk_tile[c]).all()
        np.testing.assert_array_equal(
            recv[sl][live] % 128, local[sl][live]
        )
    # dead slots never fire the one-hot
    assert (local[~mask] == 128).all()
    # receivers stay sorted through the alignment padding
    assert (np.diff(recv) >= 0).all()


def test_stream_matches_scatter_fwd_and_vjp(graph):
    g = graph
    rng = np.random.default_rng(0)
    n_pad = g.num_nodes_padded
    data = jnp.asarray(
        rng.standard_normal((g.num_edges_padded, 40)).astype(np.float32)
    ) * g.edge_mask[:, None]

    want_r = jax.ops.segment_sum(data, g.receivers, num_segments=n_pad)
    want_s = jax.ops.segment_sum(data, g.senders, num_segments=n_pad)

    seg.set_segment_impl("stream")
    try:
        got_r = seg.segment_sum_receivers(data, g)
        got_s = seg.segment_sum_senders(data, g)
        scale = float(jnp.abs(want_r).max())
        np.testing.assert_allclose(got_r, want_r, atol=3e-3 * scale)
        np.testing.assert_allclose(got_s, want_s, atol=3e-3 * scale)

        # 'high' precision: two bf16 limbs ~1e-5 relative
        seg._STREAM_PRECISION = "high"
        got_r2 = seg.segment_sum_receivers(data, g)
        np.testing.assert_allclose(got_r2, want_r, atol=5e-5 * scale)

        # VJP of a segment sum is a gather — exact
        gr = jax.grad(lambda d: seg.segment_sum_receivers(d, g).sum())(data)
        np.testing.assert_array_equal(np.asarray(gr), 1.0)
        gs = jax.grad(
            lambda x: seg.gather_senders(x, g).sum()
        )(jnp.zeros((n_pad, 40), jnp.float32))
        deg = np.bincount(np.asarray(g.senders), minlength=n_pad)
        np.testing.assert_allclose(
            gs, np.broadcast_to(deg[:, None], gs.shape).astype(np.float32)
        )
    finally:
        seg.set_segment_impl("auto")
        seg._STREAM_PRECISION = "fastest"


def test_stream_layer_matches_scatter_layer(graph):
    """Full head-batched v1/v2 layer under impl=stream == impl=scatter."""
    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat

    g = graph
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 64)).astype(np.float32)
    )
    for lt in ("GAT_sparse", "GATv2_sparse"):
        cfg = GATConfig(nlayers=2, nheads=(4, 1), nfeats=(64, 8, 5),
                        dropout=0.0, alpha=0.2, layer_type=lt)
        params = init_gat(jax.random.PRNGKey(5), cfg)
        key = jax.random.PRNGKey(0)
        seg.set_segment_impl("scatter")
        want = apply_gat(params, cfg, x, g, key, train=False)
        seg.set_segment_impl("stream")
        try:
            got = apply_gat(params, cfg, x, g, key, train=False)
        finally:
            seg.set_segment_impl("auto")
        # two layers of bf16-class aggregation compound; ~1% of scale
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(got, want, atol=1.5e-2 * scale)


def test_stream_grad_matches_scatter_grad(graph):
    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
    from pygat_tpu.ops.fused_stream import set_fused_attention

    # this test targets the stream SEGMENT kernels; the fused-attention
    # kernel (which 'auto' turns on with the stream impl, at bf16-class
    # precision wider than this tolerance) has its own parity suite in
    # test_fused.py
    set_fused_attention("off")

    g = graph
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes_padded, 32)).astype(np.float32)
    )
    cfg = GATConfig(nlayers=1, nheads=(3,), nfeats=(32, 6), dropout=0.0,
                    alpha=0.2, layer_type="GAT_sparse")
    params = init_gat(jax.random.PRNGKey(5), cfg)

    def loss(p, impl):
        seg.set_segment_impl(impl)
        try:
            out = apply_gat(p, cfg, x, g, jax.random.PRNGKey(0), train=False)
            return (out * out).sum()
        finally:
            seg.set_segment_impl("auto")

    try:
        g_scatter = jax.grad(lambda p: loss(p, "scatter"))(params)
        g_stream = jax.grad(lambda p: loss(p, "stream"))(params)
    finally:
        set_fused_attention("auto")
    for a, b in zip(jax.tree_util.tree_leaves(g_scatter),
                    jax.tree_util.tree_leaves(g_stream)):
        scale = float(jnp.abs(a).max()) + 1e-6
        np.testing.assert_allclose(b, a, atol=1e-2 * scale)


def test_empty_tiles_are_zero_initialized():
    """Regression (ADVICE r2 high): a 128-row output tile with NO incident
    edges must still be visited by >= 1 grid step, else its HBM block stays
    uninitialized (NaN rows on TPU). Build a graph whose middle tile is
    empty and check the stream segment-sum returns exact zeros there."""
    n = 383  # padded to 3 tiles of 128 (row 383 is the dummy)
    # edges only into tile 0 and tile 2; tile 1 (rows 128..255) is empty
    rng = np.random.default_rng(5)
    r = np.concatenate([rng.integers(0, 100, 500),
                        rng.integers(256, 380, 500)])
    s = rng.integers(0, n, 1000)
    g = build_graph(s, r, None, n, n_pad=384)
    # every tile must be covered by at least one chunk
    covered = set(np.asarray(g.r_chunk).tolist())
    assert covered == {0, 1, 2}, covered

    data = jnp.ones((g.num_edges_padded, 8), jnp.float32) * g.edge_mask[:, None]
    seg.set_segment_impl("stream")
    try:
        out = seg.segment_sum_receivers(data, g)
    finally:
        seg.set_segment_impl("auto")
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[128:256], 0.0)
    want = np.asarray(jax.ops.segment_sum(data, g.receivers, num_segments=384))
    np.testing.assert_allclose(out, want, atol=1e-2)


def test_stream_length_bound_is_sufficient():
    """The static bucketing bound covers any degree distribution."""
    rng = np.random.default_rng(11)
    n_pad = 512
    for trial in range(5):
        e = int(rng.integers(100, 3000))
        ids = np.sort(rng.integers(0, n_pad - 1, e))
        ptr = np.zeros(n_pad + 1, np.int64)
        np.cumsum(np.bincount(ids, minlength=n_pad), out=ptr[1:])
        bound = stream_length(e, n_pad)
        lay = build_stream_layout(ptr, stream_pad=bound)  # must not raise
        assert lay.slot.shape[0] == bound


def test_ppi_batches_share_one_stream_shape():
    """Explicit e_pad (the PPI bucketing path) yields identical stream
    shapes for different degree distributions."""
    rng = np.random.default_rng(12)
    shapes = set()
    for trial in range(3):
        n = 200 + 30 * trial
        e = 900 + 211 * trial
        s = rng.integers(0, n, e)
        r = np.sort(rng.integers(0, n, e))
        g = build_graph(s, r, None, n, n_pad=384, e_pad=2048)
        shapes.add((g.num_edges_padded, g.c_slot.shape[0],
                    g.r_chunk.shape[0]))
    assert len(shapes) == 1, shapes


@pytest.mark.skipif(
    os.environ.get("PYGAT_TPU_TESTS") != "1",
    reason="compiled-Mosaic numerics need a real TPU (set PYGAT_TPU_TESTS=1)",
)
def test_stream_compiled_on_tpu_matches_xla():
    """Runs the real (non-interpret) Mosaic lowering on the attached TPU and
    pins its numerics against the XLA scatter at Pubmed scale."""
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    n_pad, e = 19840, 108416
    ids = np.sort(rng.integers(0, 19717, e)).astype(np.int64)
    ptr = np.zeros(n_pad + 1, np.int64)
    np.cumsum(np.bincount(ids, minlength=n_pad), out=ptr[1:])
    lay = build_stream_layout(ptr)
    e_s = lay.local.shape[0]
    data_np = np.zeros((e_s, 72), np.float32)
    live = lay.slot >= 0
    data_np[live] = rng.standard_normal((e, 72)).astype(np.float32)
    ids_s = np.full(e_s, n_pad - 1, np.int64)
    ids_s[live] = ids[lay.slot[live]]
    data = jnp.asarray(data_np)
    want = jax.ops.segment_sum(
        data, jnp.asarray(ids_s), num_segments=n_pad, indices_are_sorted=True
    )
    # layout arrays must be jit ARGUMENTS: closing over them embeds ~100k
    # element constants into the program and lowering takes minutes
    local = jnp.asarray(lay.local)
    chunk_tile = jnp.asarray(lay.chunk_tile)
    run = jax.jit(stream_scatter, static_argnums=(3,),
                  static_argnames=("precision",))
    for precision, tol in (("fastest", 3e-3), ("high", 3e-5)):
        got = run(data, local, chunk_tile, n_pad, precision=precision)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(got, want, atol=tol * scale)
