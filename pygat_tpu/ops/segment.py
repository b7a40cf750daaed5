"""XLA segment primitives (sorted-segment fast path).

These are the baseline lowering of the sparse attention math; the Pallas
kernels in :mod:`pygat_tpu.ops.spmm` / :mod:`pygat_tpu.ops.sddmm` are the
tuned path and are verified against these in tests.

Semantics match the reference's edge-list pipeline (layers.py:144-160):
segment ids are edge *receivers* (destination nodes); softmax is stabilized
by a per-segment max exactly like the reference's ``scatter_max`` trick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, *, sorted_ids: bool = True):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_max(data, segment_ids, num_segments: int, *, sorted_ids: bool = True):
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_softmax_stable(
    logits,  # [E] per-edge attention logits
    segment_ids,  # [E] receiver node of each edge (sorted)
    num_segments: int,
    edge_mask=None,  # [E] bool, False on padding edges
    *,
    sorted_ids: bool = True,
):
    """Numerically-stable segment softmax, returning (numerator, denominator).

    Matches the reference decomposition (layers.py:145-150): the caller gets
    ``exp(e - max_seg)`` per edge and the per-segment sum separately, because
    the reference applies attention dropout to the numerator AFTER the
    denominator is computed (layers.py:150-160) — the division happens at
    the aggregation site, not here.

    Padding edges contribute 0 to the numerator and denominator; empty
    segments get denominator 0 (caller clamps before dividing).
    """
    if edge_mask is not None:
        neg = jnp.asarray(-9e15, dtype=logits.dtype)
        logits = jnp.where(edge_mask, logits, neg)
    seg_max = segment_max(logits, segment_ids, num_segments, sorted_ids=sorted_ids)
    # Empty / all-padding segments have max == -inf (or -9e15); zero them so
    # exp() below stays finite.
    seg_max = jnp.where(jnp.isfinite(seg_max) & (seg_max > -8.9e15), seg_max, 0.0)
    num = jnp.exp(logits - seg_max[segment_ids])
    if edge_mask is not None:
        num = jnp.where(edge_mask, num, 0.0)
    denom = segment_sum(num, segment_ids, num_segments, sorted_ids=sorted_ids)
    return num, denom
