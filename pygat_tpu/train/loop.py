"""Jitted transductive training loop with the reference's early-stop and
checkpoint-rotation policy (train.py:191-236).

One compiled XLA program per train step (forward + backward + Adam update),
one for eval — the reference's eager per-op dispatch becomes two fused TPU
programs; no recompiles across epochs thanks to static graph shapes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pygat_tpu.data.citation import CitationDataset
from pygat_tpu.graph import Graph
from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
from pygat_tpu.ops.banded import maybe_plan_large
from pygat_tpu.train import checkpoint as ckpt
from pygat_tpu.train.logging import TrainLogger
from pygat_tpu.train.metrics import (
    accuracy,
    bce_with_logits,
    f1_counts,
    log_logits,
    micro_f1,
    nll_loss,
)
from pygat_tpu.train.state import TrainState, init_state, make_optimizer


def make_transductive_steps(
    cfg: GATConfig, tx: optax.GradientTransformation,
    segment_impl: str | None = None, apply_fn=None, plans=None,
):
    """Build (train_step, eval_step) jitted closures. ``segment_impl`` pins the
    segment lowering for these steps only (scoped, not process-global) —
    the GSPMD multi-device path passes 'scatter' because a Pallas custom
    call cannot be partition-propagated. ``apply_fn(params, x, graph, key,
    train)`` substitutes the forward (the ring halo-exchange path plugs in
    here). ``plans`` (ops.banded.BandPlan or ops.large.CscCsrPlans, see
    maybe_plan_large) swaps
    the fused layers' sender-window gather for the gather-free corner
    build on million-node graphs."""
    from pygat_tpu.ops import segment as _seg

    if apply_fn is None:
        def apply_fn(params, x, graph, key, train):
            return apply_gat(params, cfg, x, graph, key, train=train,
                             plans=plans)

    def _loss(params, x, graph, labels, idx, key, train):
        with _seg.use_impl(segment_impl):
            out = apply_fn(params, x, graph, key, train)
        lp = log_logits(out)
        loss = nll_loss(lp[idx], labels[idx])
        acc = accuracy(lp[idx], labels[idx])
        return loss, (acc, out)

    @jax.jit
    def train_step(state: TrainState, x, graph: Graph, labels, idx):
        rng, key = jax.random.split(state.rng)
        (loss, (acc, out)), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, x, graph, labels, idx, key, True
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state, rng)
        return new_state, loss, acc, out

    @jax.jit
    def eval_step(params, x, graph: Graph, labels, idx):
        key = jax.random.PRNGKey(0)  # unused, train=False
        loss, (acc, out) = _loss(params, x, graph, labels, idx, key, False)
        return loss, acc, out

    return train_step, eval_step


def _enter_mesh(data, state, mesh):
    """Place a CitationDataset + TrainState on a mesh for SPMD training.

    Side-effect-free: the segment-impl choice for multi-device GSPMD steps
    (XLA scatter — GSPMD cannot partition a Pallas custom call over sharded
    edge arrays) is scoped to those steps via ``_mesh_segment_impl`` +
    ``ops.segment.use_impl``, so single-device runs in the same process
    keep the stream kernel.
    """
    from pygat_tpu.parallel.distributed import sharded_fit_inputs

    return sharded_fit_inputs(data, state, mesh)


def _mesh_segment_impl(mesh) -> str | None:
    """'scatter' on a real multi-device mesh, else None (= global default)."""
    return "scatter" if mesh is not None and mesh.devices.size > 1 else None


def _ring_setup(cfg: GATConfig, data, mesh):
    """(data, apply_fn) for the ring halo-exchange training path.

    Repads the graph so each data-shard's node range is 128-row-tile
    aligned (``N_pad % (128 * D) == 0`` — the per-shard stream-kernel
    contract), relabels nodes with the balance interleave (cyclic deal of
    real nodes across shards, ``interleave_citation`` — contiguous ranges
    concentrate id-local edges in the diagonal partition blocks and every
    block pads to the max, measured 2.6x the mean at 8 shards), builds the
    edge partition, and returns the ring forward. Unlike GSPMD, the ring
    path keeps the Pallas stream kernel under distribution (it runs per
    device inside shard_map), so the segment impl is NOT pinned to scatter.
    """
    from pygat_tpu.data.citation import interleave_citation
    from pygat_tpu.parallel.mesh import DATA_AXIS
    from pygat_tpu.parallel.partition import partition_edges
    from pygat_tpu.parallel.ring_model import ring_apply_gat

    if not cfg.is_sparse:
        raise ValueError("partition='ring' implements the sparse layer types")
    d = mesh.shape[DATA_AXIS]
    unit = 128 * d
    n_pad = data.graph.num_nodes_padded
    want = -(-max(n_pad, int(data.graph.n_node) + 1) // unit) * unit
    data = interleave_citation(data, d, n_pad=want)
    part = partition_edges(data.graph, d)

    def apply_fn(params, x, graph, key, train):
        return ring_apply_gat(params, cfg, x, part, mesh, key, train=train)

    return data, apply_fn


@dataclass
class FitResult:
    best_epoch: int
    best_val_loss: float
    test_loss: float
    test_acc: float
    epochs_run: int
    state: Any
    history: list = field(default_factory=list)


def fit_transductive(
    cfg: GATConfig,
    data: CitationDataset,
    *,
    lr: float,
    weight_decay: float,
    epochs: int,
    patience: int,
    seed: int = 72,
    fastmode: bool = False,
    checkpoint_dir: str | None = None,
    dataset_tag: str = "cora",
    logger: TrainLogger | None = None,
    log_every: int = 1,
    init_params: Any = None,
    resume: bool = False,
    mesh=None,
    partition: str = "gspmd",
) -> FitResult:
    """Reference policy: track best val loss, patience counter, save every
    epoch, rotate non-best, restore best, test (train.py:191-236).

    ``resume=True``: restore the newest checkpoint under ``checkpoint_dir``
    (full TrainState incl. optimizer moments and RNG key — exact
    continuation, the reference only saved model weights) and continue the
    epoch count / best-val / patience bookkeeping from its header.

    ``mesh``: a ('data', 'model') jax mesh turns the loop SPMD — node/edge
    arrays shard on 'data' (graph partitioning), head-stacked parameters on
    'model'. ``partition`` picks the mechanism: 'gspmd' annotates and lets
    XLA insert the ICI collectives (segment ops pinned to scatter — GSPMD
    cannot partition a Pallas call); 'ring' runs the hand-scheduled
    ppermute halo exchange with per-shard stream kernels
    (parallel.ring_model) — the multi-chip fast path. Same math either way.
    """
    logger = logger or TrainLogger()
    tx = make_optimizer(lr, weight_decay)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else init_gat(init_key, cfg)
    state = init_state(params, tx, key)

    start_epoch = 0
    resumed_best = None
    if resume and checkpoint_dir:
        found = ckpt.latest(checkpoint_dir, dataset_tag)
        if found is not None:
            _, path = found
            state, header = ckpt.restore(path, like=state)
            start_epoch = header["epoch"] + 1
            resumed_best = header
            logger.log("resume", epoch=header["epoch"],
                       best=header.get("best"), path=path,
                       # flag when the newest surviving file is the BEST
                       # checkpoint of a finished run (post-best epochs will
                       # be re-trained from it)
                       from_best=(header["epoch"] == header.get("best_epoch")))
    apply_fn = None
    if mesh is not None:
        if partition == "ring":
            data, apply_fn = _ring_setup(cfg, data, mesh)
        data, state = _enter_mesh(data, state, mesh)
    plans = maybe_plan_large(data.graph) if mesh is None else None
    train_step, eval_step = make_transductive_steps(
        cfg, tx, apply_fn=apply_fn, plans=plans,
        # the ring path keeps the stream kernel under distribution
        segment_impl=None if apply_fn else _mesh_segment_impl(mesh),
    )

    x, g, labels = data.features, data.graph, data.labels

    best = float("inf")
    best_epoch = 0
    bad_counter = 0
    if resumed_best is not None and resumed_best.get("best") is not None:
        best = float(resumed_best["best"])
        best_epoch = int(resumed_best.get("best_epoch", start_epoch - 1))
        bad_counter = int(resumed_best.get("bad", 0))
    history = []
    epoch = start_epoch - 1

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        state, loss_tr, acc_tr, out_tr = train_step(state, x, g, labels, data.idx_train)
        if fastmode:
            # reference fastmode: reuse the training-forward output for val
            lp = log_logits(out_tr)
            loss_val = nll_loss(lp[data.idx_val], labels[data.idx_val])
            acc_val = accuracy(lp[data.idx_val], labels[data.idx_val])
        else:
            loss_val, acc_val, _ = eval_step(state.params, x, g, labels, data.idx_val)

        loss_val = float(loss_val)
        if epoch % log_every == 0 or epoch == epochs - 1:
            logger.log(
                "epoch",
                epoch=epoch,
                loss_train=float(loss_tr),
                acc_train=float(acc_tr),
                loss_val=loss_val,
                acc_val=float(acc_val),
                time=time.time() - t0,
            )
        history.append(loss_val)

        if loss_val < best:
            best = loss_val
            best_epoch = epoch
            bad_counter = 0
        else:
            bad_counter += 1
        if checkpoint_dir:
            # full-state checkpoint every epoch with resume bookkeeping
            ckpt.save(checkpoint_dir, epoch, dataset_tag, state,
                      extra={"best": best, "best_epoch": best_epoch,
                             "bad": bad_counter})
        # >= (not ==): a resumed patience-stopped run restores bad_counter
        # already at the limit and must stop again, not train past it
        if bad_counter >= patience:
            break
        if checkpoint_dir:
            ckpt.rotate_below_best(checkpoint_dir, dataset_tag, best_epoch)

    if checkpoint_dir:
        # keep the final-epoch checkpoint too: resume=True then continues
        # from where the run stopped instead of replaying post-best epochs
        ckpt.rotate_above_best(checkpoint_dir, dataset_tag, best_epoch,
                               keep_epoch=epoch)
        state, _ = ckpt.restore(
            ckpt.best_path(checkpoint_dir, dataset_tag, best_epoch), like=state
        )

    test_loss, test_acc, _ = eval_step(state.params, x, g, labels, data.idx_test)
    logger.log("test", loss=float(test_loss), accuracy=float(test_acc))
    return FitResult(
        best_epoch=best_epoch,
        best_val_loss=best,
        test_loss=float(test_loss),
        test_acc=float(test_acc),
        epochs_run=epoch + 1,
        state=state,
        history=history,
    )


# ---------------------------------------------------------------------------
# Inductive (PPI) loop — reference train_ppi.py:112-216, with its broken
# checkpoint rotation replaced by the intended policy (SURVEY §2.10).
# ---------------------------------------------------------------------------


def make_inductive_steps(cfg: GATConfig, tx: optax.GradientTransformation):
    def _loss(params, x, graph, y, key, train):
        out = apply_gat(params, cfg, x, graph, key, train=train)
        mask = graph.node_mask
        loss = bce_with_logits(out, y, mask=mask)
        f1 = micro_f1(out, y, mask=mask)
        return loss, (f1, out)

    @jax.jit
    def train_step(state: TrainState, x, graph: Graph, y):
        rng, key = jax.random.split(state.rng)
        (loss, (f1, _)), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, x, graph, y, key, True
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, rng), loss, f1

    @jax.jit
    def eval_step(params, x, graph: Graph, y):
        key = jax.random.PRNGKey(0)
        loss, (f1, out) = _loss(params, x, graph, y, key, False)
        tp, fp, fn = f1_counts(out, y, mask=graph.node_mask)
        return loss, f1, tp, fp, fn

    return train_step, eval_step


def fit_inductive(
    cfg: GATConfig,
    data,  # pygat_tpu.data.ppi.PPIData
    *,
    batch_size: int,
    lr: float,
    weight_decay: float,
    epochs: int,
    patience: int,
    seed: int = 72,
    checkpoint_dir: str | None = None,
    dataset_tag: str = "ppi",
    logger: TrainLogger | None = None,
    log_batches: bool = True,
    init_params: Any = None,
) -> FitResult:
    from pygat_tpu.data.ppi import batch_bounds, make_batches

    logger = logger or TrainLogger()
    tx = make_optimizer(lr, weight_decay)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else init_gat(init_key, cfg)
    state = init_state(params, tx, key)
    train_step, eval_step = make_inductive_steps(cfg, tx)

    # ONE static batch shape across all splits/epochs => one compile.
    bounds = [batch_bounds(g, batch_size) for g in (data.train, data.valid, data.test)]
    n_pad = max(b[0] for b in bounds)
    e_pad = max(b[1] for b in bounds)

    best = float("inf")
    best_epoch = 0
    bad_counter = 0
    history = []
    epoch = -1

    for epoch in range(epochs):
        t0 = time.time()
        for bi, pb in enumerate(
            make_batches(data.train, batch_size, n_pad=n_pad, e_pad=e_pad,
                         shuffle=True, seed=seed + epoch)
        ):
            state, loss_tr, f1_tr = train_step(state, pb.features, pb.batch.graph, pb.labels)
            if log_batches:
                logger.log("ppi_batch", split="train", epoch=epoch, batch=bi,
                           loss=float(loss_tr), f1=float(f1_tr), time=time.time() - t0)
            t0 = time.time()

        val_losses = []
        for bi, pb in enumerate(
            make_batches(data.valid, batch_size, n_pad=n_pad, e_pad=e_pad)
        ):
            loss_v, f1_v, *_ = eval_step(state.params, pb.features, pb.batch.graph, pb.labels)
            if log_batches:
                logger.log("ppi_batch", split="valid", epoch=epoch, batch=bi,
                           loss=float(loss_v), f1=float(f1_v), time=time.time() - t0)
            t0 = time.time()
            val_losses.append(float(loss_v))
        loss_val = sum(val_losses) / len(val_losses)
        history.append(loss_val)

        if checkpoint_dir:
            ckpt.save(checkpoint_dir, epoch, dataset_tag, state)
        if loss_val < best:
            best = loss_val
            best_epoch = epoch
            bad_counter = 0
        else:
            bad_counter += 1
        if bad_counter >= patience:
            break
        if checkpoint_dir:
            ckpt.rotate_below_best(checkpoint_dir, dataset_tag, best_epoch)

    if checkpoint_dir:
        # keep the final-epoch checkpoint too: resume=True then continues
        # from where the run stopped instead of replaying post-best epochs
        ckpt.rotate_above_best(checkpoint_dir, dataset_tag, best_epoch,
                               keep_epoch=epoch)
        state, _ = ckpt.restore(
            ckpt.best_path(checkpoint_dir, dataset_tag, best_epoch), like=state
        )

    # test: mean batch loss + micro-F1 over the concatenation of all batches
    # (summed counts == concatenated micro-F1), train_ppi.py:155-174.
    losses, TP, FP, FN = [], 0.0, 0.0, 0.0
    for pb in make_batches(data.test, batch_size, n_pad=n_pad, e_pad=e_pad):
        loss_t, _, tp, fp, fn = eval_step(state.params, pb.features, pb.batch.graph, pb.labels)
        losses.append(float(loss_t))
        TP += float(tp); FP += float(fp); FN += float(fn)
    test_loss = sum(losses) / len(losses)
    test_f1 = 2 * TP / max(2 * TP + FP + FN, 1.0)
    logger.log("test", loss=test_loss, accuracy=test_f1)
    return FitResult(
        best_epoch=best_epoch,
        best_val_loss=best,
        test_loss=test_loss,
        test_acc=test_f1,
        epochs_run=epoch + 1,
        state=state,
        history=history,
    )


def make_scanned_batches(cfg: GATConfig, tx: optax.GradientTransformation):
    """One jitted dispatch per epoch for the inductive loop: lax.scan over a
    pytree of STACKED batches ([B, ...] leaves; PPI batches share one static
    padded shape, fit_inductive's ``batch_bounds`` contract). On a
    remote-attached TPU this replaces ~3 * B host round trips per epoch with
    two (train scan + eval scan)."""
    train_step, eval_step = make_inductive_steps(cfg, tx)

    @jax.jit
    def train_epoch(state: TrainState, stacked):
        def body(st, batch):
            x, graph, y = batch
            st, loss, f1 = train_step(st, x, graph, y)
            return st, (loss, f1)

        return jax.lax.scan(body, state, stacked)

    @jax.jit
    def eval_epoch(params, stacked):
        def body(_, batch):
            x, graph, y = batch
            loss, f1, tp, fp, fn = eval_step(params, x, graph, y)
            return None, (loss, f1, tp, fp, fn)

        return jax.lax.scan(body, None, stacked)[1]

    return train_epoch, eval_epoch


def stack_batches(batches):
    """Stack a list of PaddedBatch into ([B,...] x, Graph, y) leaf-stacked."""
    xs = jnp.stack([pb.features for pb in batches])
    ys = jnp.stack([pb.labels for pb in batches])
    graphs = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *[pb.batch.graph for pb in batches]
    )
    return xs, graphs, ys


# ---------------------------------------------------------------------------
# Inductive data parallelism (SURVEY §2.11 item 1; VERDICT r1 item 3):
# PPI graph-batches sharded across the mesh 'data' axis with gradient
# all-reduce over ICI. Reference batching: load_data_ppi.py:71-88; loop:
# train_ppi.py:112-152.
# ---------------------------------------------------------------------------


def superbatch(stacked, n_data: int):
    """Group [B, ...] stacked batches into [S, D, ...] super-steps plus a
    [S, D] weight matrix (0 on padding slots). Each super-step is ONE
    optimizer update from the weighted mean loss of its D batches — the
    standard data-parallel batching semantics (global batch = D
    graph-batches)."""
    b = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    s = -(-b // n_data)
    pad = s * n_data - b
    # padding slots repeat existing batches (weight 0 — they never reach
    # the loss); index modulo handles pad > b (e.g. a 1-batch split)
    idx = jnp.arange(s * n_data) % b

    def grow(leaf):
        if pad:
            leaf = leaf[idx]
        return leaf.reshape((s, n_data) + leaf.shape[1:])

    w = jnp.concatenate(
        [jnp.ones((b,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    ).reshape(s, n_data)
    return jax.tree_util.tree_map(grow, stacked), w


def place_superbatches(stacked, weights, mesh):
    """Shard the D axis of [S, D, ...] super-stacked leaves on 'data'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pygat_tpu.parallel.mesh import DATA_AXIS

    def put(leaf):
        spec = P(None, DATA_AXIS, *([None] * (leaf.ndim - 2)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return (
        jax.tree_util.tree_map(put, stacked),
        jax.device_put(
            weights, NamedSharding(mesh, P(None, DATA_AXIS))
        ),
    )


def make_sharded_inductive_epochs(cfg: GATConfig,
                                  tx: optax.GradientTransformation, mesh):
    """(train_epoch, eval_epoch) over [S, D, ...] super-stacked batches.

    Each mesh 'data' slice computes one graph-batch's loss; GSPMD inserts
    the gradient all-reduce (weighted mean over the D slots). Inside the
    vmapped per-batch loss the segment ops are pinned to the XLA lowering:
    a Pallas custom call cannot be partition-propagated by GSPMD across the
    vmapped data axis.
    """
    from pygat_tpu.ops import segment as _seg

    def _batch_loss(params, x, graph, y, key, train):
        with _seg.use_impl("scatter"):
            out = apply_gat(params, cfg, x, graph, key, train=train)
        mask = graph.node_mask
        loss = bce_with_logits(out, y, mask=mask)
        return loss, (micro_f1(out, y, mask=mask), out)

    def _super_loss(params, xs, graphs, ys, w, key):
        keys = jax.random.split(key, w.shape[0])
        losses, (f1s, _) = jax.vmap(
            lambda x, g, y, k: _batch_loss(params, x, g, y, k, True)
        )(xs, graphs, ys, keys)
        wsum = jnp.maximum(w.sum(), 1.0)
        return (losses * w).sum() / wsum, (losses, f1s)

    @jax.jit
    def train_epoch(state: TrainState, stacked, weights):
        def body(st, sb):
            batch, w = sb
            xs, graphs, ys = batch
            rng, key = jax.random.split(st.rng)
            (_, (losses, f1s)), grads = jax.value_and_grad(
                _super_loss, has_aux=True
            )(st.params, xs, graphs, ys, w, key)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(st.step + 1, params, opt_state, rng), (losses, f1s)

        return jax.lax.scan(body, state, (stacked, weights))

    @jax.jit
    def eval_epoch(params, stacked, weights):
        def body(_, sb):
            batch, w = sb
            xs, graphs, ys = batch
            keys = jnp.broadcast_to(jax.random.PRNGKey(0), (w.shape[0], 2))

            def one(x, g, y, k):
                loss, (f1, out) = _batch_loss(params, x, g, y, k, False)
                tp, fp, fn = f1_counts(out, y, mask=g.node_mask)
                return loss, f1, tp, fp, fn

            return None, jax.vmap(one)(xs, graphs, ys, keys)

        return jax.lax.scan(body, None, (stacked, weights))[1]

    return train_epoch, eval_epoch


def fit_inductive_fast(
    cfg: GATConfig,
    data,  # pygat_tpu.data.ppi.PPIData
    *,
    batch_size: int,
    lr: float,
    weight_decay: float,
    epochs: int,
    patience: int,
    seed: int = 72,
    checkpoint_dir: str | None = None,
    dataset_tag: str = "ppi",
    logger: TrainLogger | None = None,
    init_params: Any = None,
    mesh=None,
) -> FitResult:
    """fit_inductive with one device dispatch per train/eval epoch (scan over
    stacked batches). Same policy and math; per-batch logs are summarized to
    per-epoch means.

    ``mesh``: a ('data', 'model') jax mesh enables inductive data
    parallelism — graph-batches are grouped D = mesh['data'] at a time into
    one optimizer step each (weighted-mean loss, gradient all-reduce over
    ICI; standard DP semantics: the effective batch becomes D graph-batches)
    with head-stacked parameters sharded on 'model'.
    """
    from pygat_tpu.data.ppi import batch_bounds, make_batches

    logger = logger or TrainLogger()
    tx = make_optimizer(lr, weight_decay)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else init_gat(init_key, cfg)
    state = init_state(params, tx, key)
    if mesh is not None:
        from pygat_tpu.parallel.distributed import shard_train_state
        from pygat_tpu.parallel.mesh import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
        state = shard_train_state(state, mesh)
        train_epoch, eval_epoch = make_sharded_inductive_epochs(cfg, tx, mesh)
    else:
        train_epoch, eval_epoch = make_scanned_batches(cfg, tx)

    bounds = [batch_bounds(g, batch_size) for g in (data.train, data.valid, data.test)]
    n_pad = max(b[0] for b in bounds)
    e_pad = max(b[1] for b in bounds)

    val_stacked = stack_batches(
        list(make_batches(data.valid, batch_size, n_pad=n_pad, e_pad=e_pad))
    )
    if mesh is not None:
        val_stacked, val_w = place_superbatches(
            *superbatch(val_stacked, n_data), mesh
        )

    best = float("inf")
    best_epoch = 0
    bad_counter = 0
    history = []
    epoch = -1

    for epoch in range(epochs):
        t0 = time.time()
        stacked = stack_batches(
            list(make_batches(data.train, batch_size, n_pad=n_pad, e_pad=e_pad,
                              shuffle=True, seed=seed + epoch))
        )
        if mesh is not None:
            stacked, w_tr = place_superbatches(*superbatch(stacked, n_data), mesh)
            state, (losses_tr, f1s_tr) = train_epoch(state, stacked, w_tr)
            losses_v, f1s_v, *_ = eval_epoch(state.params, val_stacked, val_w)
            # weighted means: padding slots carry weight 0
            losses_tr = (losses_tr * w_tr).sum() / w_tr.sum()
            f1s_tr = (f1s_tr * w_tr).sum() / w_tr.sum()
            losses_v = (losses_v * val_w).sum() / val_w.sum()
            f1s_v = (f1s_v * val_w).sum() / val_w.sum()
        else:
            state, (losses_tr, f1s_tr) = train_epoch(state, stacked)
            losses_v, f1s_v, *_ = eval_epoch(state.params, val_stacked)
        loss_val = float(jnp.mean(losses_v))
        logger.log(
            "ppi_epoch", epoch=epoch,
            loss_train=float(jnp.mean(losses_tr)), f1_train=float(jnp.mean(f1s_tr)),
            loss_val=loss_val, f1_val=float(jnp.mean(f1s_v)),
            time=time.time() - t0,
        )
        history.append(loss_val)

        if checkpoint_dir:
            ckpt.save(checkpoint_dir, epoch, dataset_tag, state)
        if loss_val < best:
            best = loss_val
            best_epoch = epoch
            bad_counter = 0
        else:
            bad_counter += 1
        if bad_counter >= patience:
            break
        if checkpoint_dir:
            ckpt.rotate_below_best(checkpoint_dir, dataset_tag, best_epoch)

    if checkpoint_dir:
        # keep the final-epoch checkpoint too: resume=True then continues
        # from where the run stopped instead of replaying post-best epochs
        ckpt.rotate_above_best(checkpoint_dir, dataset_tag, best_epoch,
                               keep_epoch=epoch)
        state, _ = ckpt.restore(
            ckpt.best_path(checkpoint_dir, dataset_tag, best_epoch), like=state
        )

    test_stacked = stack_batches(
        list(make_batches(data.test, batch_size, n_pad=n_pad, e_pad=e_pad))
    )
    if mesh is not None:
        test_stacked, test_w = place_superbatches(
            *superbatch(test_stacked, n_data), mesh
        )
        losses_t, _, tps, fps, fns = eval_epoch(state.params, test_stacked,
                                                test_w)
        test_loss = float((losses_t * test_w).sum() / test_w.sum())
        tp = float((tps * test_w).sum())
        fp = float((fps * test_w).sum())
        fn = float((fns * test_w).sum())
    else:
        losses_t, _, tps, fps, fns = eval_epoch(state.params, test_stacked)
        test_loss = float(jnp.mean(losses_t))
        tp, fp, fn = float(jnp.sum(tps)), float(jnp.sum(fps)), float(jnp.sum(fns))
    test_f1 = 2 * tp / max(2 * tp + fp + fn, 1.0)
    logger.log("test", loss=test_loss, accuracy=test_f1)
    return FitResult(
        best_epoch=best_epoch,
        best_val_loss=best,
        test_loss=test_loss,
        test_acc=test_f1,
        epochs_run=epoch + 1,
        state=state,
        history=history,
    )


# ---------------------------------------------------------------------------
# Banked inductive loop (round 3): zero host work per epoch. The fast loop
# above still rebuilds + restages every epoch's block-diagonal batches on
# the host (~1.5 s/epoch on a remote-attached chip); here the per-graph
# padded leaves live on device once (data.ppi.GraphBank) and shuffling,
# collation AND K epochs of train+val all run inside ONE dispatch.
# Replaces the reference's per-epoch DataLoader collate
# (train_ppi.py:112-120) wholesale.
# ---------------------------------------------------------------------------


def _banked_eval_fn(cfg: GATConfig, batch_size: int, n_graphs: int):
    """Jitted full-split eval over a GraphBank: per-batch (loss, f1, tp,
    fp, fn) with the fixed in-order batching the host path uses for
    val/test splits."""
    from pygat_tpu.data.ppi import assemble_banked_batch

    b = batch_size
    nb = -(-n_graphs // b)
    idxs = (jnp.arange(nb * b, dtype=jnp.int32) % n_graphs).reshape(nb, b)
    lives = (jnp.arange(nb * b) < n_graphs).reshape(nb, b)

    def _loss(params, x, graph, y, key, train):
        out = apply_gat(params, cfg, x, graph, key, train=train)
        mask = graph.node_mask
        loss = bce_with_logits(out, y, mask=mask)
        return loss, (micro_f1(out, y, mask=mask), out)

    @jax.jit
    def eval_bank(params, bank):
        def body(_, sl):
            idx, lv = sl
            x, g, y = assemble_banked_batch(bank, idx, lv)
            loss, (f1, out) = _loss(params, x, g, y, jax.random.PRNGKey(0),
                                    False)
            tp, fp, fn = f1_counts(out, y, mask=g.node_mask)
            return None, (loss, f1, tp, fp, fn)

        return jax.lax.scan(body, None, (idxs, lives))[1]

    return eval_bank, _loss


def make_banked_epochs(
    cfg: GATConfig,
    tx: optax.GradientTransformation,
    batch_size: int,
    n_train_graphs: int,
    n_val_graphs: int,
    n_chunk: int,
    patience: int | None = None,
    mesh=None,
    dp: int | None = None,
):
    """K inductive epochs per device dispatch, with on-device shuffling
    (``jax.random.permutation`` of the graph ids per epoch — the
    reference's DataLoader(shuffle=True) semantics, train_ppi.py:118) and
    on-device best-params tracking (same policy as
    make_scanned_epochs_with_best, incl. the patience gate: overshoot
    epochs past the host's early stop never update the best model).

    ``mesh``: a ('data', 'model') mesh data-parallelizes the epoch — each
    optimizer step takes D consecutive shuffled batches, computes each
    batch's loss on one 'data' slice (weighted mean over live slots, the
    make_sharded_inductive_epochs semantics: global batch = D
    graph-batches), and GSPMD inserts the gradient all-reduce. Segment ops
    pin to the XLA scatter lowering under DP (a Pallas call cannot be
    partition-propagated across the vmapped axis).

    Carry: (state, epoch_i, best_val, best_params, best_epoch).
    Returns per-epoch (loss_train, f1_train, loss_val, f1_val) means."""
    from pygat_tpu.data.ppi import assemble_banked_batch

    b = batch_size
    nb_t = -(-n_train_graphs // b)
    pad_t = nb_t * b - n_train_graphs
    lives_t = (jnp.arange(nb_t * b) < n_train_graphs).reshape(nb_t, b)
    eval_bank, _loss = _banked_eval_fn(cfg, b, n_val_graphs)

    n_data = 1
    if mesh is not None:
        from pygat_tpu.parallel.mesh import DATA_AXIS

        n_data = int(mesh.shape[DATA_AXIS])
    if dp is not None:
        # explicit slot count — with mesh=None this runs the EXACT same
        # DP math unsharded (sharding constraints never change results),
        # which is how tests pin the distributed path against a
        # single-device reference
        n_data = int(dp)
    if n_data > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pygat_tpu.ops import segment as _seg
        from pygat_tpu.parallel.mesh import DATA_AXIS

        s_t = -(-nb_t // n_data)
        batch_of = jnp.arange(s_t * n_data) % nb_t  # repeated pads
        step_w = ((jnp.arange(s_t * n_data) < nb_t)
                  .astype(jnp.float32).reshape(s_t, n_data))

        def _shard_d(tree):
            if mesh is None:
                return tree

            def put(leaf):
                spec = P(DATA_AXIS, *([None] * (leaf.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    leaf, NamedSharding(mesh, spec))
            return jax.tree_util.tree_map(put, tree)

        def _loss_dp(params, x, graph, y, key, train):
            with _seg.use_impl("scatter"):
                return _loss(params, x, graph, y, key, train)

    @jax.jit
    def run(carry, bank_train, bank_val, max_epochs):
        def epoch(carry, _):
            state, epoch_i, best_val, best_params, best_epoch = carry
            rng, kperm = jax.random.split(state.rng)
            state = state._replace(rng=rng)
            perm = jax.random.permutation(kperm, n_train_graphs).astype(jnp.int32)
            if pad_t:
                perm = jnp.concatenate([perm, perm[:pad_t]])
            idxs = perm.reshape(nb_t, b)

            def tb(st, sl):
                idx, lv = sl
                rng2, key = jax.random.split(st.rng)
                x, g, y = assemble_banked_batch(bank_train, idx, lv)
                (loss, (f1, _)), grads = jax.value_and_grad(
                    _loss, has_aux=True
                )(st.params, x, g, y, key, True)
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return (
                    TrainState(st.step + 1, params, opt_state, rng2),
                    (loss, f1),
                )

            def tb_dp(st, sl):
                # D batches -> one weighted-mean update (DP semantics)
                idx, lv, w = sl  # [D, b], [D, b], [D]
                rng2, key = jax.random.split(st.rng)
                keys = jax.random.split(key, n_data)

                def super_loss(params):
                    xs, gs, ys = _shard_d(jax.vmap(
                        lambda i, l: assemble_banked_batch(bank_train, i, l)
                    )(idx, lv))
                    losses, (f1s, _) = jax.vmap(
                        lambda x, g, y, k: _loss_dp(params, x, g, y, k, True)
                    )(xs, gs, ys, keys)
                    wsum = jnp.maximum(w.sum(), 1.0)
                    return (losses * w).sum() / wsum, (losses, f1s)

                (_, (losses, f1s)), grads = jax.value_and_grad(
                    super_loss, has_aux=True)(st.params)
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                wsum = jnp.maximum(w.sum(), 1.0)
                return (
                    TrainState(st.step + 1, params, opt_state, rng2),
                    ((losses * w).sum() / wsum, (f1s * w).sum() / wsum),
                )

            if n_data > 1:
                idxs3 = idxs[batch_of].reshape(s_t, n_data, b)
                lives3 = lives_t[batch_of].reshape(s_t, n_data, b)
                state, (ltr, ftr) = jax.lax.scan(
                    tb_dp, state, (idxs3, lives3, step_w))
            else:
                state, (ltr, ftr) = jax.lax.scan(tb, state, (idxs, lives_t))
            lv_, fv_, *_ = eval_bank(state.params, bank_val)
            loss_val = lv_.mean()
            improved = (loss_val < best_val) & (epoch_i < max_epochs)
            if patience is not None:
                # see make_scanned_epochs_with_best: gate on the last
                # completed epoch (epoch_i - 1), monotone across chunks
                improved &= (epoch_i - 1 - best_epoch) < patience
            best_val = jnp.where(improved, loss_val, best_val)
            best_epoch = jnp.where(improved, epoch_i, best_epoch)
            best_params = jax.tree_util.tree_map(
                lambda nw, od: jnp.where(improved, nw, od),
                state.params, best_params,
            )
            return (state, epoch_i + 1, best_val, best_params, best_epoch), (
                ltr.mean(), ftr.mean(), loss_val, fv_.mean(),
            )

        return jax.lax.scan(epoch, carry, None, length=n_chunk)

    return run


def fit_inductive_banked(
    cfg: GATConfig,
    data,  # pygat_tpu.data.ppi.PPIData
    *,
    batch_size: int,
    lr: float,
    weight_decay: float,
    epochs: int,
    patience: int,
    seed: int = 72,
    epoch_chunk: int = 10,
    checkpoint_dir: str | None = None,
    dataset_tag: str = "ppi",
    logger: TrainLogger | None = None,
    log_every: int = 10,
    init_params: Any = None,
    resume: bool = False,
    mesh=None,
) -> FitResult:
    """fit_inductive with zero per-epoch host work: the host syncs once per
    ``epoch_chunk`` epochs (early stopping can overshoot by up to
    epoch_chunk-1 epochs of extra compute, never changing the selected
    model — same contract as fit_transductive_fast). Checkpoints at chunk
    boundaries carry the val-loss history + best bookkeeping for exact
    resume. ``mesh`` data-parallelizes the banked epochs (see
    make_banked_epochs): the fastest inductive loop AND distributed, in
    one path."""
    from pygat_tpu.data.ppi import bank_bounds, build_bank

    logger = logger or TrainLogger()
    tx = make_optimizer(lr, weight_decay)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else init_gat(init_key, cfg)
    state = init_state(params, tx, key)

    n_pg, e_pg = bank_bounds([data.train, data.valid, data.test])
    bank_tr = build_bank(data.train, n_pg, e_pg)
    bank_va = build_bank(data.valid, n_pg, e_pg)
    bank_te = build_bank(data.test, n_pg, e_pg)

    run = make_banked_epochs(cfg, tx, batch_size, len(data.train),
                             len(data.valid), epoch_chunk, patience=patience,
                             mesh=mesh)
    eval_test, _ = _banked_eval_fn(cfg, batch_size, len(data.test))

    carry = (state, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf),
             state.params, jnp.asarray(-1, jnp.int32))
    history: list[float] = []
    if resume and checkpoint_dir:
        found = ckpt.latest(checkpoint_dir, dataset_tag)
        if found is not None:
            _, path = found
            state, header = ckpt.restore(path, like=state)
            history = [float(v) for v in header.get("history", [])]
            best_val = float(header.get("best", np.inf))
            best_epoch = int(header.get("best_epoch", -1))
            best_params = state.params
            bfound = ckpt.latest(checkpoint_dir, dataset_tag + "-best")
            if bfound is not None and best_epoch >= 0:
                bstate, _ = ckpt.restore(bfound[1], like=state)
                best_params = bstate.params
            carry = (state, jnp.asarray(len(history), jnp.int32),
                     jnp.asarray(best_val), best_params,
                     jnp.asarray(best_epoch, jnp.int32))
            logger.log("resume", epoch=len(history) - 1, best=best_val,
                       path=path)

    t0 = time.time()
    stopped = False
    while len(history) < epochs and not stopped:
        carry, metrics = run(carry, bank_tr, bank_va,
                             jnp.asarray(epochs, jnp.int32))
        metrics_h = jax.device_get(metrics)
        chunk_tr, chunk_ftr, chunk_vals, chunk_fv = (
            [float(v) for v in m] for m in metrics_h
        )
        for j, lv in enumerate(chunk_vals):
            epoch_idx = len(history)
            history.append(lv)
            if epoch_idx % log_every == 0:
                logger.log("ppi_epoch", epoch=epoch_idx,
                           loss_train=chunk_tr[j], f1_train=chunk_ftr[j],
                           loss_val=lv, f1_val=chunk_fv[j],
                           time=time.time() - t0)
                t0 = time.time()
            since_best = epoch_idx - int(np.argmin(history[: epoch_idx + 1]))
            if since_best >= patience:
                stopped = True
                break
            if epoch_idx + 1 >= epochs:
                break
        if checkpoint_dir:
            be = int(carry[4])
            ckpt.save(checkpoint_dir, len(history) - 1, dataset_tag, carry[0],
                      extra={"best": float(carry[2]), "best_epoch": be,
                             "history": history})
            ckpt.rotate_below_best(checkpoint_dir, dataset_tag,
                                   len(history) - 1)
            if be >= 0:
                ckpt.save(checkpoint_dir, be, dataset_tag + "-best",
                          carry[0]._replace(params=carry[3]))
                for e_old, p_old in ckpt.list_checkpoints(
                    checkpoint_dir, dataset_tag + "-best"
                ):
                    if e_old != be:
                        import os as _os

                        _os.remove(p_old)

    state, _, best_val, best_params, best_epoch = carry
    final_state = state._replace(params=best_params)
    if checkpoint_dir:
        ckpt.save(checkpoint_dir, int(best_epoch), dataset_tag + "-best",
                  final_state)

    losses_t, _, tps, fps, fns = eval_test(best_params, bank_te)
    test_loss = float(jnp.mean(losses_t))
    tp, fp, fn = float(jnp.sum(tps)), float(jnp.sum(fps)), float(jnp.sum(fns))
    test_f1 = 2 * tp / max(2 * tp + fp + fn, 1.0)
    logger.log("test", loss=test_loss, accuracy=test_f1)
    return FitResult(
        best_epoch=int(best_epoch),
        best_val_loss=float(best_val),
        test_loss=test_loss,
        test_acc=test_f1,
        epochs_run=len(history),
        state=final_state,
        history=history,
    )


def make_scanned_epochs(
    cfg: GATConfig, tx: optax.GradientTransformation, n_epochs: int,
    fastmode: bool = False, segment_impl: str | None = None,
):
    """One jitted program that runs ``n_epochs`` full train(+eval) epochs via
    lax.scan — a single host dispatch per chunk of epochs.

    This is both the honest device-throughput benchmark (host/tunnel dispatch
    latency excluded) and the fast-training path on remote-attached TPUs:
    the host only syncs once per chunk to apply early-stop/checkpoint policy.
    Returns (state, (loss_train, acc_train, loss_val, acc_val)) with [n_epochs]
    metric vectors.
    """

    from pygat_tpu.ops import segment as _seg

    def _loss(params, x, graph, labels, idx, key, train):
        with _seg.use_impl(segment_impl):
            out = apply_gat(params, cfg, x, graph, key, train=train)
        lp = log_logits(out)
        return nll_loss(lp[idx], labels[idx]), (accuracy(lp[idx], labels[idx]), lp)

    @jax.jit
    def run(state: TrainState, x, graph: Graph, labels, idx_train, idx_val):
        def epoch(state, _):
            rng, key = jax.random.split(state.rng)
            (loss_tr, (acc_tr, lp_tr)), grads = jax.value_and_grad(
                _loss, has_aux=True
            )(state.params, x, graph, labels, idx_train, key, True)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(state.step + 1, params, opt_state, rng)
            if fastmode:
                loss_val = nll_loss(lp_tr[idx_val], labels[idx_val])
                acc_val = accuracy(lp_tr[idx_val], labels[idx_val])
            else:
                loss_val, (acc_val, _) = _loss(
                    params, x, graph, labels, idx_val, key, False
                )
            return state, (loss_tr, acc_tr, loss_val, acc_val)

        return jax.lax.scan(epoch, state, None, length=n_epochs)

    return run


def make_scanned_epochs_with_best(
    cfg: GATConfig, tx: optax.GradientTransformation, n_epochs: int,
    fastmode: bool = False, segment_impl: str | None = None, apply_fn=None,
    plans=None, patience: int | None = None,
):
    """Chunked fast path: K epochs per dispatch AND on-device tracking of the
    best-validation-loss parameters (the reference's save-every-epoch +
    restore-best policy, train.py:201-233, without a host round trip per
    epoch). Carry: (state, best_val, best_params, best_epoch).

    ``patience`` mirrors the host's early-stop policy on device: epochs that
    run AFTER the patience stop would have fired (the final chunk's
    overshoot) never update the best model — without this gate a late val
    improvement inside the overshoot could select an epoch the reference
    policy (train.py:220-223) never reaches."""
    from pygat_tpu.ops import segment as _seg

    if apply_fn is None:
        def apply_fn(params, x, graph, key, train):
            return apply_gat(params, cfg, x, graph, key, train=train,
                             plans=plans)

    def _loss(params, x, graph, labels, idx, key, train):
        with _seg.use_impl(segment_impl):
            out = apply_fn(params, x, graph, key, train)
        lp = log_logits(out)
        return nll_loss(lp[idx], labels[idx]), (accuracy(lp[idx], labels[idx]), lp)

    @jax.jit
    def run(carry, x, graph: Graph, labels, idx_train, idx_val, max_epochs):
        def epoch(carry, _):
            state, best_val, best_params, best_epoch = carry
            rng, key = jax.random.split(state.rng)
            (loss_tr, (acc_tr, lp_tr)), grads = jax.value_and_grad(
                _loss, has_aux=True
            )(state.params, x, graph, labels, idx_train, key, True)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(state.step + 1, params, opt_state, rng)
            if fastmode:
                loss_val = nll_loss(lp_tr[idx_val], labels[idx_val])
                acc_val = accuracy(lp_tr[idx_val], labels[idx_val])
            else:
                loss_val, (acc_val, _) = _loss(
                    params, x, graph, labels, idx_val, key, False
                )
            # epochs past the configured budget never update the best model
            improved = (loss_val < best_val) & (state.step - 1 < max_epochs)
            if patience is not None:
                # host policy stops after epoch e once e - best_epoch >=
                # patience; this epoch's index is state.step - 1, so gate on
                # the previous epoch (the one the host checked). best_epoch
                # freezes once gated, so the gate is monotone across chunks.
                improved &= (state.step - 2 - best_epoch) < patience
            best_val = jnp.where(improved, loss_val, best_val)
            best_epoch = jnp.where(improved, state.step - 1, best_epoch)
            best_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(improved, new, old), params, best_params
            )
            return (state, best_val, best_params, best_epoch), (
                loss_tr, acc_tr, loss_val, acc_val,
            )

        return jax.lax.scan(epoch, carry, None, length=n_epochs)

    return run


def fit_transductive_fast(
    cfg: GATConfig,
    data: CitationDataset,
    *,
    lr: float,
    weight_decay: float,
    epochs: int,
    patience: int,
    seed: int = 72,
    fastmode: bool = False,
    epoch_chunk: int = 50,
    checkpoint_dir: str | None = None,
    dataset_tag: str = "cora",
    logger: TrainLogger | None = None,
    log_every: int = 50,
    init_params: Any = None,
    mesh=None,
    resume: bool = False,
    partition: str = "gspmd",
) -> FitResult:
    """Same policy/result as fit_transductive (best-val params are restored
    exactly, tracked on device), but the host syncs once per ``epoch_chunk``
    epochs: early stopping can overshoot by up to epoch_chunk-1 epochs of
    extra compute, never changing the selected model. Checkpoints are
    written at chunk boundaries (full state) rather than every epoch.
    ``mesh``: SPMD over a ('data', 'model') mesh; ``partition``:
    'gspmd' or 'ring' (see fit_transductive).

    ``resume=True`` continues exactly from the newest chunk checkpoint:
    the header carries the val-loss history (for the patience policy) and
    the best-val bookkeeping; the best parameters reload from the
    ``{tag}-best`` checkpoint refreshed at every chunk boundary."""
    logger = logger or TrainLogger()
    tx = make_optimizer(lr, weight_decay)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else init_gat(init_key, cfg)
    state = init_state(params, tx, key)
    apply_fn = None
    if mesh is not None:
        if partition == "ring":
            data, apply_fn = _ring_setup(cfg, data, mesh)
        data, state = _enter_mesh(data, state, mesh)
        params = state.params
    plans = maybe_plan_large(data.graph) if mesh is None else None

    # the ring path keeps the stream kernel under distribution
    seg_impl = None if apply_fn else _mesh_segment_impl(mesh)
    run = make_scanned_epochs_with_best(cfg, tx, epoch_chunk,
                                        fastmode=fastmode,
                                        segment_impl=seg_impl,
                                        apply_fn=apply_fn, plans=plans,
                                        patience=patience)
    _, eval_step = make_transductive_steps(
        cfg, tx, segment_impl=seg_impl, apply_fn=apply_fn,
        plans=plans,
    )

    x, g, labels = data.features, data.graph, data.labels
    carry = (state, jnp.asarray(jnp.inf), params, jnp.asarray(-1, jnp.int32))

    history: list[float] = []
    if resume and checkpoint_dir:
        found = ckpt.latest(checkpoint_dir, dataset_tag)
        if found is not None:
            _, path = found
            state, header = ckpt.restore(path, like=state)
            history = [float(v) for v in header.get("history", [])]
            best_val = float(header.get("best", np.inf))
            best_epoch = int(header.get("best_epoch", -1))
            best_params = state.params
            bfound = ckpt.latest(checkpoint_dir, dataset_tag + "-best")
            if bfound is not None and best_epoch >= 0:
                bstate, _ = ckpt.restore(bfound[1], like=state)
                best_params = bstate.params
            if mesh is not None:
                from pygat_tpu.parallel.distributed import shard_train_state

                state = shard_train_state(state, mesh)
            carry = (state, jnp.asarray(best_val), best_params,
                     jnp.asarray(best_epoch, jnp.int32))
            logger.log("resume", epoch=len(history) - 1, best=best_val,
                       path=path)
    t0 = time.time()
    stopped = False
    while len(history) < epochs and not stopped:
        carry, metrics = run(carry, x, g, labels, data.idx_train, data.idx_val,
                             jnp.asarray(epochs, jnp.int32))
        # single bulk transfer per chunk (scalar reads are a round trip each
        # on remote-attached devices)
        metrics_h = jax.device_get(metrics)
        chunk_tr, chunk_acc_tr, chunk_vals, chunk_acc_val = (
            [float(v) for v in m] for m in metrics_h
        )
        for j, lv in enumerate(chunk_vals):
            epoch_idx = len(history)
            history.append(lv)
            if epoch_idx % log_every == 0:
                logger.log("epoch", epoch=epoch_idx, loss_train=chunk_tr[j],
                           acc_train=chunk_acc_tr[j], loss_val=lv,
                           acc_val=chunk_acc_val[j], time=time.time() - t0)
                t0 = time.time()
            # reference patience policy over the full history
            best_so_far = min(history[: epoch_idx + 1])
            since_best = epoch_idx - int(np.argmin(history[: epoch_idx + 1]))
            if since_best >= patience:
                stopped = True
                break
            if epoch_idx + 1 >= epochs:
                break
        if checkpoint_dir:
            # chunk-boundary checkpoint with full resume bookkeeping:
            # header carries the history (patience state) + best-val; the
            # best params refresh in the {tag}-best file
            be = int(carry[3])
            ckpt.save(checkpoint_dir, len(history) - 1, dataset_tag, carry[0],
                      extra={"best": float(carry[1]), "best_epoch": be,
                             "history": history})
            ckpt.rotate_below_best(checkpoint_dir, dataset_tag, len(history) - 1)
            if be >= 0:
                ckpt.save(checkpoint_dir, be, dataset_tag + "-best",
                          carry[0]._replace(params=carry[2]))
                for e_old, p_old in ckpt.list_checkpoints(
                    checkpoint_dir, dataset_tag + "-best"
                ):
                    if e_old != be:
                        import os as _os

                        _os.remove(p_old)

    state, best_val, best_params, best_epoch = carry
    final_state = state._replace(params=best_params)
    if checkpoint_dir:
        ckpt.save(checkpoint_dir, int(best_epoch), dataset_tag + "-best", final_state)

    test_loss, test_acc, _ = eval_step(best_params, x, g, labels, data.idx_test)
    logger.log("test", loss=float(test_loss), accuracy=float(test_acc))
    return FitResult(
        best_epoch=int(best_epoch),
        best_val_loss=float(best_val),
        test_loss=float(test_loss),
        test_acc=float(test_acc),
        epochs_run=len(history),
        state=final_state,
        history=history,
    )
