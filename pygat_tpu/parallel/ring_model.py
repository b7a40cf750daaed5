"""Ring-attention GAT model + train step (the halo-exchange training path).

Completes VERDICT r1 item 5 / SURVEY §7 hard part #1: the
``ring_gat_attention`` kernels (pygat_tpu.parallel.partition) wired into a
full ``make_transductive_steps``-compatible training path — projections and
elementwise stages run GSPMD-sharded over the 'data' axis; only the
attention-aggregation runs inside the hand-scheduled shard_map ring.
Gradients flow through ``ppermute``/``psum`` transposes automatically, so
``jax.grad`` + Adam of the ring forward IS the distributed backward.

Layouts mirror the single-chip fast path (models/layers.py): heads fold
into the minor axis ([N, H*F] projections, [N, H] logit components), so the
ring bodies never relayout [H, E] tensors, and when the partition is
stream-aligned every per-hop reduction (forward AND backward) runs the
Pallas stream-scatter kernel on the device-local edge block.

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
    """Per-head input dropout as ONE batched bernoulli ([N, H, F]).

    Never vmap _drop over split per-head keys: with the hardware (rbg)
    generator each key forces a serialized rng-bit-generator (~1000x slower
    than one batched draw); one batched draw keeps heads independent at
    full speed (same rule as models.layers.DropoutMasks)."""
    keep = jax.random.bernoulli(
        key, 1.0 - rate, (x.shape[0], n_heads, x.shape[1])
    )
    return jnp.where(keep, x[:, None, :] / (1.0 - rate), 0.0)  # [N, H, F]


def _att_keep(key, rate, n_heads, part: EdgePartition):
    """[D, D, E_blk, H] inverted-dropout keep factors in partition layout."""
    keep = jax.random.bernoulli(
        key, 1.0 - rate, tuple(part.edge_mask.shape) + (n_heads,)
    )
    return keep.astype(jnp.float32) / (1.0 - rate)


def _block_diag(w: jax.Array) -> jax.Array:
    """[H, F_in, F_out] -> block-diagonal [H*F_in, H*F_out] (one MXU matmul
    applies all heads to per-head-masked inputs; see layers.py rationale)."""
    n_heads = w.shape[0]
    eye = jnp.eye(n_heads, dtype=w.dtype)
    return jnp.einsum("hfo,hk->hfko", w, eye).reshape(
        n_heads * w.shape[1], n_heads * w.shape[2]
    )


def ring_apply_gat(
    params: list[Any],
    cfg: GATConfig,
    x: jax.Array,  # [N_pad, F0]
    part: EdgePartition,
    mesh: Mesh,
    rng: jax.Array,
    *,
    train: bool,
    halo: bool | None = None,  # direct halo exchange (None = env default)
) -> jax.Array:
    """Forward pass of the stacked model through the ring attention kernels.

    Same math as ``apply_gat`` on the sparse layer types (the same exact
    bound-shifted softmax as the single-chip head-batched layers).

    ``halo=True`` swaps the full-shard rotation for the direct halo
    exchange (ppermute only the sender rows each (dst, src) pair
    references — parallel/partition.py halo fields); ``None`` reads
    ``PYGAT_RING_HALO=1``.
    """
    if halo is None:
        import os

        halo = os.environ.get("PYGAT_RING_HALO") == "1"
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
        hf = n_heads * f_out
        rng, k_in, k_p1, k_p2, k_att = jax.random.split(rng, 5)

        if cfg.is_v2:
            f_in = h.shape[1]
            if use_drop:
                x_h = _drop_heads(h, k_in, p_drop, n_heads)  # [N, H, F_in]
                x2 = x_h.reshape(n, n_heads * f_in)
                whi = x2 @ _block_diag(layer_params.W[:, :f_in])  # [N, HF]
                whj = x2 @ _block_diag(layer_params.W[:, f_in:])
                whi = _drop(whi, k_p1, p_drop)
                whj = _drop(whj, k_p2, p_drop)
            else:
                x_h = None
                whi = h @ jnp.moveaxis(layer_params.W[:, :f_in], 0, 1).reshape(
                    f_in, hf)
                whj = h @ jnp.moveaxis(layer_params.W[:, f_in:], 0, 1).reshape(
                    f_in, hf)
            keep = (_att_keep(k_att, p_drop, n_heads, part)
                    if use_drop else None)
            out = ring_gat_attention_v2(
                whi, whj, layer_params.a, part, mesh, alpha=cfg.alpha,
                att_keep=keep, halo=halo,
            )  # [N, HF]
        else:
            f_in = h.shape[1]
            if use_drop:
                x_h = _drop_heads(h, k_in, p_drop, n_heads)
                whf = x_h.reshape(n, n_heads * f_in) @ _block_diag(
                    layer_params.W)
                whf = _drop(whf, k_p1, p_drop)
            else:
                x_h = None
                whf = h @ jnp.moveaxis(layer_params.W, 0, 1).reshape(f_in, hf)
            f_dst = jnp.einsum("nho,ho->nh", whf.reshape(n, n_heads, f_out),
                               layer_params.a[:, :f_out])  # [N, H]
            a_src = layer_params.a[:, f_out:]  # [H, F_out]
            keep = (_att_keep(k_att, p_drop, n_heads, part)
                    if use_drop else None)
            out = ring_gat_attention(
                f_dst, whf, a_src, part, mesh, alpha=cfg.alpha, att_keep=keep,
                halo=halo,
            )  # [N, HF]

        out3 = out.reshape(n, n_heads, f_out)
        if layer_params.skip is not None:
            if x_h is not None:
                out3 = out3 + jnp.einsum("nhf,hfo->nho", x_h,
                                         layer_params.skip)
            else:
                out3 = out3 + jnp.einsum("nf,hfo->nho", h, layer_params.skip)
        if concat:
            h = jax.nn.elu(out3).reshape(n, hf)
        else:
            h = out3.mean(axis=1)
    return h


def make_ring_transductive_steps(
    cfg: GATConfig, tx: optax.GradientTransformation,
    part: EdgePartition, mesh: Mesh, halo: bool | None = None,
):
    """(train_step, eval_step) mirroring ``make_transductive_steps`` but
    with the ring-attention forward; grad + Adam go through the shard_map.
    Inputs should be placed with the transductive shardings
    (``sharded_fit_inputs``) so the surrounding stages are SPMD too.
    ``halo`` forwards to :func:`ring_apply_gat` (None = env default)."""

    def _loss(params, x, labels, idx, key, train):
        out = ring_apply_gat(params, cfg, x, part, mesh, key, train=train,
                             halo=halo)
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
