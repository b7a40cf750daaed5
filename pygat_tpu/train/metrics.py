"""Pure-JAX metrics and loss heads.

* transductive head: ``log_softmax(elu(output))`` + NLL — including the
  reference's idiosyncratic extra ELU on final logits (train.py:151-152),
  preserved for parity;
* accuracy: argmax match rate (utils.py:92-96);
* inductive: mean BCE-with-logits (train_ppi.py:114) and micro-F1 at
  threshold logit > 0 (train_ppi.py:106-110) — computed on device, unlike
  the reference's per-batch sklearn round-trip to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_logits(output: jax.Array) -> jax.Array:
    """Reference compute_log_logits (train.py:151-152)."""
    return jax.nn.log_softmax(jax.nn.elu(output), axis=1)


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """F.nll_loss: mean negative log-probability of the true class."""
    picked = jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32), axis=1)
    return -jnp.mean(picked)


def accuracy(output: jax.Array, labels: jax.Array) -> jax.Array:
    preds = jnp.argmax(output, axis=1)
    return jnp.mean((preds == labels).astype(jnp.float32))


def bce_with_logits(logits: jax.Array, targets: jax.Array, mask=None) -> jax.Array:
    """nn.BCEWithLogitsLoss(reduction='mean'), numerically stable form.

    ``mask`` (optional, [N] or broadcastable) restricts the mean to real
    (non-padding) rows — the reference has no padding so its mean is over
    everything.
    """
    # log(1 + exp(-|x|)) + max(x, 0) - x*y
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if mask is None:
        return jnp.mean(per)
    mask = mask.astype(per.dtype)
    if mask.ndim == 1:
        mask = mask[:, None]
    weights = mask * jnp.ones_like(per)  # broadcast to element count
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(weights), 1.0)


def f1_counts(logits: jax.Array, targets: jax.Array, mask=None):
    """(tp, fp, fn) at threshold logit > 0; micro-F1 over a concatenation of
    batches equals micro-F1 from the summed counts (used by the PPI test
    path instead of the reference's host-side torch.cat + sklearn,
    train_ppi.py:155-174)."""
    preds = (logits > 0).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        if m.ndim == 1:
            m = m[:, None]
        preds = preds * m
        t = t * m
    tp = jnp.sum(preds * t)
    fp = jnp.sum(preds * (1 - t))
    fn = jnp.sum((1 - preds) * t)
    return tp, fp, fn


def micro_f1(logits: jax.Array, targets: jax.Array, mask=None) -> jax.Array:
    """Micro-averaged F1 at threshold logit > 0 (train_ppi.py:107)."""
    preds = (logits > 0).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        if m.ndim == 1:
            m = m[:, None]
        preds = preds * m
        t = t * m
    tp = jnp.sum(preds * t)
    fp = jnp.sum(preds * (1 - t))
    fn = jnp.sum((1 - preds) * t)
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1.0)
