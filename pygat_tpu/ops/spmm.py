"""SpMM: sparse(adjacency-with-edge-values) @ dense.

The framework equivalent of the reference's SpecialSpmmFunction / SpecialSpmm
(reference layers.py:70-95): gradients flow to the edge values and the dense
operand only. Two key upgrades over the reference:

* backward for edge values is an O(E) SDDMM — gather two rows, dot — not
  the reference's dense [N, N] materialization (layers.py:85-87);
* static padded shapes: edge count and node count never change across
  steps, so the op stays inside one compiled program.

Edge convention matches the Graph container: values[e] weights the edge
``senders[e] -> receivers[e]``; out[i] = sum_e values[e] * dense[senders[e]].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygat_tpu.graph import Graph
from pygat_tpu.ops.segment import segment_sum


@jax.custom_vjp
def spmm(values: jax.Array, dense: jax.Array, senders: jax.Array,
         receivers: jax.Array, edge_mask: jax.Array) -> jax.Array:
    """[N_pad, F] = scatter-add over receivers of values * dense[senders]."""
    n_pad = dense.shape[0]
    v = jnp.where(edge_mask, values, 0.0)
    return segment_sum(v[:, None] * dense[senders], receivers, n_pad)


def _spmm_fwd(values, dense, senders, receivers, edge_mask):
    return spmm(values, dense, senders, receivers, edge_mask), (
        values, dense, senders, receivers, edge_mask,
    )


def _spmm_bwd(res, g):
    values, dense, senders, receivers, edge_mask = res
    # d values: SDDMM — per-edge <g[recv], dense[send]> (vs. the reference's
    # dense grad_output @ b.T gather, layers.py:85-87)
    dvalues = jnp.sum(g[receivers] * dense[senders], axis=-1)
    dvalues = jnp.where(edge_mask, dvalues, 0.0)
    # d dense: A^T @ g — scatter over senders
    v = jnp.where(edge_mask, values, 0.0)
    ddense = segment_sum(v[:, None] * g[receivers], senders, dense.shape[0],
                         sorted_ids=False)
    return dvalues, ddense, None, None, None


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_graph(values: jax.Array, dense: jax.Array, graph: Graph) -> jax.Array:
    """Graph-aware SpMM through the fastest available reductions.

    Composed from the differentiable dispatch primitives (ops.segment): on
    TPU the forward scatter runs the Pallas stream kernel (ops.stream) and
    the whole backward stays scatter-free — d(values) is the fused SDDMM
    ``<g[recv], dense[send]>`` and d(dense) is a sender-side stream
    reduction — replacing the reference's dense [N, N] backward
    materialization (reference layers.py:85-87).
    """
    from pygat_tpu.ops.segment import gather_senders, segment_sum_receivers

    v = jnp.where(graph.edge_mask, values, 0.0)
    msgs = v[:, None] * gather_senders(dense, graph)
    return segment_sum_receivers(msgs, graph)
