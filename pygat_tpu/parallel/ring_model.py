"""Ring-attention GAT model + train step (the halo-exchange training path).

Completes VERDICT r1 item 5 / SURVEY §7 hard part #1: the
``ring_gat_attention`` kernels (pygat_tpu.parallel.partition) wired into a
full ``make_transductive_steps``-compatible training path — projections and
elementwise stages run GSPMD-sharded over the 'data' axis; only the
attention-aggregation runs inside the hand-scheduled shard_map ring.
Gradients flow through ``ppermute``/``psum`` transposes automatically, so
``jax.grad`` + Adam of the ring forward IS the distributed backward.

Supports v1 AND v2 logits and the reference's full dropout placement
(input, post-projection, attention numerator with pre-dropout denominator).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from pygat_tpu.models.gat import GATConfig
from pygat_tpu.parallel.partition import (
    EdgePartition,
    ring_gat_attention,
    ring_gat_attention_v2,
)
from pygat_tpu.train.metrics import accuracy, log_logits, nll_loss
from pygat_tpu.train.state import TrainState


def _drop(x, key, rate):
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _drop_heads(x, key, rate, n_heads):
    """Per-head input dropout as ONE batched bernoulli ([H, *x.shape]).

    Never vmap _drop over split per-head keys: with the hardware (rbg)
    generator each key forces a serialized rng-bit-generator (~1000x slower
    than one batched draw); one [H, ...] draw keeps heads independent at
    full speed (same rule as models.layers.DropoutMasks)."""
    keep = jax.random.bernoulli(key, 1.0 - rate, (n_heads,) + x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _att_keep(key, rate, n_heads, part: EdgePartition):
    keep = jax.random.bernoulli(
        key, 1.0 - rate, (n_heads,) + tuple(part.edge_mask.shape)
    )
    return keep.astype(jnp.float32) / (1.0 - rate)


def ring_apply_gat(
    params: list[Any],
    cfg: GATConfig,
    x: jax.Array,  # [N_pad, F0]
    part: EdgePartition,
    mesh: Mesh,
    rng: jax.Array,
    *,
    train: bool,
) -> jax.Array:
    """Forward pass of the stacked model through the ring attention kernels.

    Same math as ``apply_gat`` on the sparse layer types (one deliberate
    divergence: the exact online segment-max stabilization instead of the
    single-chip bound — both are exact softmax shifts).
    """
    if not cfg.is_sparse:
        raise ValueError("ring path implements the sparse layer types")
    use_drop = train and cfg.dropout > 0.0
    p_drop = cfg.dropout
    h = x
    n = x.shape[0]
    for i, layer_params in enumerate(params):
        concat = i < cfg.nlayers - 1
        n_heads = layer_params.W.shape[0]
        f_out = layer_params.W.shape[-1]
        rng, k_in, k_p1, k_p2, k_att = jax.random.split(rng, 5)

        if cfg.is_v2:
            f_in = h.shape[1]
            if use_drop:
                x_h = _drop_heads(h, k_in, p_drop, n_heads)  # [H, N, F_in]
            else:
                x_h = jnp.broadcast_to(h, (n_heads,) + h.shape)
            whi = jnp.einsum("hnf,hfo->hno", x_h, layer_params.W[:, :f_in])
            whj = jnp.einsum("hnf,hfo->hno", x_h, layer_params.W[:, f_in:])
            if use_drop:
                whi = _drop(whi, k_p1, p_drop)
                whj = _drop(whj, k_p2, p_drop)
            keep = (_att_keep(k_att, p_drop, n_heads, part)
                    if use_drop else None)
            out = ring_gat_attention_v2(
                whi, whj, layer_params.a, part, mesh, alpha=cfg.alpha,
                att_keep=keep,
            )
        else:
            if use_drop:
                x_h = _drop_heads(h, k_in, p_drop, n_heads)
            else:
                x_h = jnp.broadcast_to(h, (n_heads,) + h.shape)
            wh = jnp.einsum("hnf,hfo->hno", x_h, layer_params.W)
            if use_drop:
                wh = _drop(wh, k_p1, p_drop)
            f_dst = jnp.einsum("hno,ho->hn", wh, layer_params.a[:, :f_out])
            f_src = jnp.einsum("hno,ho->hn", wh, layer_params.a[:, f_out:])
            keep = (_att_keep(k_att, p_drop, n_heads, part)
                    if use_drop else None)
            out = ring_gat_attention(
                f_dst, f_src, wh, part, mesh, alpha=cfg.alpha, att_keep=keep,
            )

        if layer_params.skip is not None:
            out = out + jnp.einsum("hnf,hfo->hno", x_h, layer_params.skip)
        if concat:
            out = jax.nn.elu(out)
            h = jnp.moveaxis(out, 0, 1).reshape(n, n_heads * f_out)
        else:
            h = out.mean(axis=0)
    return h


def make_ring_transductive_steps(
    cfg: GATConfig, tx: optax.GradientTransformation,
    part: EdgePartition, mesh: Mesh,
):
    """(train_step, eval_step) mirroring ``make_transductive_steps`` but
    with the ring-attention forward; grad + Adam go through the shard_map.
    Inputs should be placed with the transductive shardings
    (``sharded_fit_inputs``) so the surrounding stages are SPMD too."""

    def _loss(params, x, labels, idx, key, train):
        out = ring_apply_gat(params, cfg, x, part, mesh, key, train=train)
        lp = log_logits(out)
        return nll_loss(lp[idx], labels[idx]), (accuracy(lp[idx], labels[idx]), out)

    @jax.jit
    def train_step(state: TrainState, x, labels, idx):
        rng, key = jax.random.split(state.rng)
        (loss, (acc, out)), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, x, labels, idx, key, True
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, rng), loss, acc, out

    @jax.jit
    def eval_step(params, x, labels, idx):
        key = jax.random.PRNGKey(0)
        loss, (acc, out) = _loss(params, x, labels, idx, key, False)
        return loss, acc, out

    return train_step, eval_step
