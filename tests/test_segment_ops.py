import jax
import jax.numpy as jnp
import numpy as np

import pytest

from pygat_tpu.graph import build_graph
from pygat_tpu.ops.segment import (
    segment_max,
    segment_softmax_stable,
    segment_sum,
    sender_segment_sum,
    set_segment_impl,
    sorted_segment_max,
    sorted_segment_sum,
    take_receivers,
    take_senders,
)


@pytest.fixture
def scan_impl():
    """Force the segmented-scan lowering (the TPU fast path) on CPU tests."""
    set_segment_impl("scan")
    yield
    set_segment_impl("auto")


def test_segment_sum_max_sorted(rng):
    ids = np.sort(rng.integers(0, 10, size=100)).astype(np.int32)
    data = rng.standard_normal(100).astype(np.float32)
    s = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 12))
    m = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 12))
    for k in range(12):
        sel = data[ids == k]
        if sel.size:
            np.testing.assert_allclose(s[k], sel.sum(), rtol=1e-5)
            np.testing.assert_allclose(m[k], sel.max(), rtol=1e-5)
        else:
            assert s[k] == 0


def test_segment_softmax_matches_dense(random_graph_tuple, rng):
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    e_pad = g.num_edges_padded
    logits = rng.standard_normal(e_pad).astype(np.float32) * 4

    num, denom = segment_softmax_stable(
        jnp.asarray(logits), g.receivers, g.num_nodes_padded, edge_mask=g.edge_mask
    )
    att = np.asarray(num) / np.where(np.asarray(denom) > 0, np.asarray(denom), 1.0)[
        np.asarray(g.receivers)
    ]

    # dense oracle: row-softmax over real edges only
    recv_np = np.asarray(g.receivers)[: len(send)]
    send_np = np.asarray(g.senders)[: len(send)]
    dense = np.full((n, n), -np.inf)
    dense[recv_np, send_np] = logits[: len(send)]
    dense = dense - np.nanmax(np.where(np.isfinite(dense), dense, np.nan), axis=1, keepdims=True)
    dense_e = np.where(np.isfinite(dense), np.exp(dense), 0.0)
    dense_att = dense_e / dense_e.sum(axis=1, keepdims=True)

    np.testing.assert_allclose(att[: len(send)], dense_att[recv_np, send_np], rtol=1e-5)
    # padding edges contribute nothing
    assert (np.asarray(num)[len(send):] == 0).all()


def test_segment_softmax_huge_logits_stable(random_graph_tuple):
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    # The reference README:30 notes softmax instability; the scatter_max
    # trick (layers.py:145-146) must keep exp() finite for large logits.
    logits = jnp.full((g.num_edges_padded,), 500.0, dtype=jnp.float32)
    num, denom = segment_softmax_stable(
        logits, g.receivers, g.num_nodes_padded, edge_mask=g.edge_mask
    )
    assert bool(jnp.isfinite(num).all())
    assert bool(jnp.isfinite(denom).all())


# ---------------------------------------------------------------------------
# Scan-based sorted-segment fast path vs the scatter reference (fwd + grad)
# ---------------------------------------------------------------------------


def test_sorted_segment_ops_match_scatter(random_graph_tuple, rng, scan_impl):
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    e_pad = g.num_edges_padded
    n_pad = g.num_nodes_padded
    data1 = jnp.asarray(rng.standard_normal(e_pad).astype(np.float32))
    data2 = jnp.asarray(rng.standard_normal((e_pad, 5)).astype(np.float32))

    for d in (data1, data2):
        ref = segment_sum(d, g.receivers, n_pad)
        got = sorted_segment_sum(d, g.receivers, g.row_ptr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

        ref_s = segment_sum(d, g.senders, n_pad, sorted_ids=False)
        got_s = sender_segment_sum(d, g.senders, g.col_perm, g.col_ptr)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-5, atol=1e-5)

    ref_m = np.asarray(segment_max(data1, g.receivers, n_pad))
    got_m = np.asarray(sorted_segment_max(data1, g.receivers, g.row_ptr))
    finite = np.isfinite(ref_m)
    np.testing.assert_allclose(got_m[finite], ref_m[finite], atol=1e-6)
    assert (got_m[~finite] == -9e15).all()


def test_sorted_segment_vjps_are_gathers(random_graph_tuple, rng, scan_impl):
    """Custom VJPs: d(sorted_segment_sum)/d(data) == cotangent gathered at
    ids; d(take_*)/dx == opposite-order segment sum of the cotangent."""
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    e_pad, n_pad = g.num_edges_padded, g.num_nodes_padded
    data = jnp.asarray(rng.standard_normal(e_pad).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))

    # segment-sum VJP vs autodiff of the scatter reference
    ct = jnp.asarray(rng.standard_normal(n_pad).astype(np.float32))
    _, vjp = jax.vjp(lambda d: sorted_segment_sum(d, g.receivers, g.row_ptr), data)
    _, vjp_ref = jax.vjp(lambda d: segment_sum(d, g.receivers, n_pad), data)
    np.testing.assert_allclose(np.asarray(vjp(ct)[0]), np.asarray(vjp_ref(ct)[0]),
                               rtol=1e-5, atol=1e-5)

    # gather VJPs vs autodiff of plain indexing
    ct_e = jnp.asarray(rng.standard_normal(e_pad).astype(np.float32))
    _, vjp1 = jax.vjp(lambda v: take_receivers(v, g.receivers, g.row_ptr), x)
    _, vjp1_ref = jax.vjp(lambda v: v[g.receivers], x)
    np.testing.assert_allclose(np.asarray(vjp1(ct_e)[0]), np.asarray(vjp1_ref(ct_e)[0]),
                               rtol=1e-5, atol=1e-5)

    _, vjp2 = jax.vjp(lambda v: take_senders(v, g.senders, g.col_perm, g.col_ptr), x)
    _, vjp2_ref = jax.vjp(lambda v: v[g.senders], x)
    np.testing.assert_allclose(np.asarray(vjp2(ct_e)[0]), np.asarray(vjp2_ref(ct_e)[0]),
                               rtol=1e-5, atol=1e-5)


def test_segment_softmax_scan_path_matches_scatter(random_graph_tuple, rng, scan_impl):
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    logits = jnp.asarray(rng.standard_normal(g.num_edges_padded).astype(np.float32) * 4)
    num_a, den_a = segment_softmax_stable(
        logits, g.receivers, g.num_nodes_padded, edge_mask=g.edge_mask
    )
    num_b, den_b = segment_softmax_stable(
        logits, g.receivers, g.num_nodes_padded, edge_mask=g.edge_mask,
        row_ptr=g.row_ptr,
    )
    np.testing.assert_allclose(np.asarray(num_b), np.asarray(num_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(den_b), np.asarray(den_a), atol=1e-4)
