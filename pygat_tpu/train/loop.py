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
import optax

from pygat_tpu.data.citation import CitationDataset
from pygat_tpu.graph import Graph
from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
from pygat_tpu.train import checkpoint as ckpt
from pygat_tpu.train.logging import TrainLogger
from pygat_tpu.train.metrics import accuracy, log_logits, nll_loss
from pygat_tpu.train.state import TrainState, init_state, make_optimizer


def make_transductive_steps(cfg: GATConfig, tx: optax.GradientTransformation):
    """Build (train_step, eval_step) jitted closures."""

    def _loss(params, x, graph, labels, idx, key, train):
        out = apply_gat(params, cfg, x, graph, key, train=train)
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
) -> FitResult:
    """Reference policy: track best val loss, patience counter, save every
    epoch, rotate non-best, restore best, test (train.py:191-236)."""
    logger = logger or TrainLogger()
    tx = make_optimizer(lr, weight_decay)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else init_gat(init_key, cfg)
    state = init_state(params, tx, key)
    train_step, eval_step = make_transductive_steps(cfg, tx)

    x, g, labels = data.features, data.graph, data.labels

    best = float("inf")
    best_epoch = 0
    bad_counter = 0
    history = []
    epoch = -1

    for epoch in range(epochs):
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

        if checkpoint_dir:
            ckpt.save(checkpoint_dir, epoch, dataset_tag, state)

        if loss_val < best:
            best = loss_val
            best_epoch = epoch
            bad_counter = 0
        else:
            bad_counter += 1
        if bad_counter == patience:
            break
        if checkpoint_dir:
            ckpt.rotate_below_best(checkpoint_dir, dataset_tag, best_epoch)

    if checkpoint_dir:
        ckpt.rotate_above_best(checkpoint_dir, dataset_tag, best_epoch)
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
