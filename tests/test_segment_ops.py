import jax.numpy as jnp
import numpy as np

from pygat_tpu.graph import build_graph
from pygat_tpu.ops.segment import segment_max, segment_softmax_stable, segment_sum


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
