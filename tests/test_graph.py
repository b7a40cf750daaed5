import numpy as np
import pytest

from pygat_tpu.graph import block_diag, build_graph
from pygat_tpu.utils.padding import bucket_size, geometric_buckets, round_up


def test_round_up():
    assert round_up(1) == 128
    assert round_up(128) == 128
    assert round_up(129) == 256
    assert round_up(5, 8) == 8


def test_buckets():
    bs = geometric_buckets(1000)
    assert bs[-1] >= 1000
    assert bucket_size(700, bs) >= 700
    with pytest.raises(ValueError):
        bucket_size(10**9, (128, 256))


def test_build_graph_shapes_and_sorting(random_graph_tuple):
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    n_pad, e_pad = g.num_nodes_padded, g.num_edges_padded
    assert n_pad % 128 == 0 and n_pad > n
    assert e_pad % 128 == 0 and e_pad >= len(send)

    recv_np = np.asarray(g.receivers)
    assert (np.diff(recv_np) >= 0).all(), "receivers must be sorted"
    assert int(g.n_edge) == len(send)
    # padding edges at the dummy node
    assert (recv_np[len(send):] == n_pad - 1).all()
    assert not np.asarray(g.edge_mask)[len(send):].any()
    assert np.asarray(g.edge_mask)[: len(send)].all()

    # CSR row_ptr consistent with receivers
    row_ptr = np.asarray(g.row_ptr)
    assert row_ptr[0] == 0 and row_ptr[-1] == e_pad
    for i in [0, 1, n // 2, n - 1]:
        seg = recv_np[row_ptr[i] : row_ptr[i + 1]]
        assert (seg == i).all()


def test_to_dense_round_trip(random_graph_tuple):
    send, recv, w, n = random_graph_tuple
    g = build_graph(send, recv, w, n)
    dense = np.asarray(g.to_dense())
    expect = np.zeros((g.num_nodes_padded, g.num_nodes_padded), np.float32)
    expect[recv, send] = w
    np.testing.assert_allclose(dense, expect, rtol=1e-6)


def test_block_diag_offsets():
    g1 = (np.array([0, 1]), np.array([1, 0]), None, 2)
    g2 = (np.array([0, 1, 2]), np.array([1, 2, 0]), None, 3)
    batch = block_diag([g1, g2])
    g = batch.graph
    assert int(g.n_node) == 5
    assert int(g.n_edge) == 5
    send = np.asarray(g.senders)[np.asarray(g.edge_mask)]
    recv = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    # second graph's edges shifted by 2
    pairs = set(zip(send.tolist(), recv.tolist()))
    assert pairs == {(0, 1), (1, 0), (2, 3), (3, 4), (4, 2)}
    gid = np.asarray(batch.graph_ids)
    assert gid[:2].tolist() == [0, 0]
    assert gid[2:5].tolist() == [1, 1, 1]
    assert (gid[5:] == -1).all()


def test_edge_endpoint_validation():
    with pytest.raises(ValueError):
        build_graph(np.array([0, 5]), np.array([1, 1]), None, 3)
