"""SDDMM: per-edge dot products of two dense row sets.

edge_out[e] = <a[receivers[e]], b[senders[e]]> — the sampled-dense-dense
matmul that produces per-edge attention logits without materializing the
reference's [2F', E] concat (reference layers.py:141-144) or any [N, N]
product. Differentiable in both dense operands (O(E F) backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygat_tpu.graph import Graph
from pygat_tpu.ops.segment import segment_sum


@jax.custom_vjp
def sddmm(a: jax.Array, b: jax.Array, senders: jax.Array,
          receivers: jax.Array, edge_mask: jax.Array) -> jax.Array:
    out = jnp.sum(a[receivers] * b[senders], axis=-1)
    return jnp.where(edge_mask, out, 0.0)


def _sddmm_fwd(a, b, senders, receivers, edge_mask):
    return sddmm(a, b, senders, receivers, edge_mask), (a, b, senders, receivers, edge_mask)


def _sddmm_bwd(res, g):
    a, b, senders, receivers, edge_mask = res
    g = jnp.where(edge_mask, g, 0.0)
    da = segment_sum(g[:, None] * b[senders], receivers, a.shape[0])
    db = segment_sum(g[:, None] * a[receivers], senders, b.shape[0],
                     sorted_ids=False)
    return da, db, None, None, None


sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm_graph(a: jax.Array, b: jax.Array, graph: Graph) -> jax.Array:
    """Graph-aware SDDMM through the fastest available reductions.

    The forward is pure gather + fused elementwise (XLA's strength); the
    VJPs of both dense operands are segment sums that dispatch to the
    Pallas stream kernel on TPU (ops.segment / ops.stream).
    """
    from pygat_tpu.ops.segment import gather_receivers, gather_senders

    out = jnp.sum(
        gather_receivers(a, graph) * gather_senders(b, graph), axis=-1
    )
    return jnp.where(graph.edge_mask, out, 0.0)
