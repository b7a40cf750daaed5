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
