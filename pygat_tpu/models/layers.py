"""Functional GAT attention layers (single-head pure functions).

Four variants mirroring the reference's capability surface:

* ``gat_v1_dense``  — masked [N, N] attention      (reference layers.py:8-67)
* ``gat_v1_sparse`` — edge-list segment attention  (reference layers.py:98-176)
* ``gat_v2_dense``  — GATv2, incl. the reference's [N, 1] broadcast quirk
                      (reference layers.py:179-232; see SURVEY §2.4)
* ``gat_v2_sparse`` — edge-list GATv2, the semantically-correct GATv2
                      (reference layers.py:234-316)

Each is a pure function of (params, inputs, rng); heads are vmapped in
:mod:`pygat_tpu.models.gat`. Dropout placement copies the reference exactly:
on the inputs, after the projection(s), and on the attention coefficients —
with the softmax denominator computed from PRE-dropout numerators
(reference layers.py:150-160).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pygat_tpu.graph import Graph
from pygat_tpu.ops.segment import segment_softmax_stable, segment_sum

NEG_INF = -9e15  # reference's masking constant (layers.py:40)


class V1Params(NamedTuple):
    W: jax.Array  # [F_in, F_out]
    a: jax.Array  # [2 * F_out]  (a[:F_out] pairs the receiver i, a[F_out:] the sender j)
    skip: jax.Array | None  # [F_in, F_out] or None


class V2Params(NamedTuple):
    W: jax.Array  # [2 * F_in, F_out]; rows [:F_in] = left/i-projection, [F_in:] = right/j
    a: jax.Array  # [F_out]
    skip: jax.Array | None


def dropout(x, rate: float, rng, train: bool):
    """torch-style inverted dropout (F.dropout semantics)."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape=x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def leaky_relu(x, alpha: float):
    return jnp.where(x >= 0, x, alpha * x)


def _finish(h_prime, h_dropped, skip, concat: bool):
    """Shared tail: optional skip projection (from the dropped input, as the
    reference does at layers.py:166) then ELU iff non-final layer."""
    if skip is not None:
        h_prime = h_prime + h_dropped @ skip
    if concat:
        h_prime = jax.nn.elu(h_prime)
    return h_prime


# ---------------------------------------------------------------------------
# Dense variants: full [N, N] masked attention
# ---------------------------------------------------------------------------


def gat_v1_dense(
    params: V1Params,
    h: jax.Array,  # [N, F_in]
    adj_mask: jax.Array,  # [N, N] bool; adj_mask[i, j] == edge j -> i
    rng,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    k1, k2, k3 = jax.random.split(rng, 3)
    h = dropout(h, drop, k1, train)
    Wh = h @ params.W
    Wh = dropout(Wh, drop, k2, train)  # official-TF-repo placement (layers.py:37)

    f_out = params.W.shape[1]
    e_i = Wh @ params.a[:f_out]  # [N] receiver term  (reference Wh1)
    e_j = Wh @ params.a[f_out:]  # [N] sender term    (reference Wh2)
    e = leaky_relu(e_i[:, None] + e_j[None, :], alpha)  # e[i, j]

    att = jnp.where(adj_mask, e, NEG_INF)
    att = jax.nn.softmax(att, axis=1)
    att = dropout(att, drop, k3, train)
    h_prime = att @ Wh
    return _finish(h_prime, h, params.skip, concat)


def gat_v2_dense(
    params: V2Params,
    h: jax.Array,
    adj_mask: jax.Array,
    rng,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    """Reference-faithful dense GATv2, INCLUDING its [N, 1] logit quirk:
    ``e = leaky_relu(Wh1 + Wh2) @ a`` is per-node, so after the adjacency
    mask the row softmax is uniform over neighbors (SURVEY §2.4). The
    semantically-correct GATv2 lives in :func:`gat_v2_sparse`."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    f_in = h.shape[1]
    h = dropout(h, drop, k1, train)
    Wh1 = h @ params.W[:f_in]  # left half
    Wh2 = h @ params.W[f_in:]  # right half
    Wh1 = dropout(Wh1, drop, k2, train)
    Wh2 = dropout(Wh2, drop, k3, train)

    e = leaky_relu(Wh1 + Wh2, alpha) @ params.a  # [N]  (reference layers.py:212-214)
    att = jnp.where(adj_mask, e[:, None], NEG_INF)  # broadcast [N,1] vs [N,N]
    att = jax.nn.softmax(att, axis=1)
    att = dropout(att, drop, k4, train)
    h_prime = att @ Wh2  # aggregates the RIGHT projection (layers.py:220)
    return _finish(h_prime, h, params.skip, concat)


# ---------------------------------------------------------------------------
# Sparse variants: edge-list segment attention (static padded COO)
# ---------------------------------------------------------------------------


def _sparse_attention_aggregate(
    edge_logits,  # [E] pre-softmax logits
    values,  # [N, F] per-node messages, gathered at senders
    graph: Graph,
    rng,
    *,
    drop: float,
    train: bool,
):
    """Segment softmax over incoming edges + SpMM aggregation.

    Replaces the reference's scatter_max + exp + two SpecialSpmm calls
    (layers.py:145-160). The denominator uses PRE-dropout numerators and the
    numerator is dropped afterwards — exact reference order.
    """
    n_pad = graph.num_nodes_padded
    num, denom = segment_softmax_stable(
        edge_logits, graph.receivers, n_pad, edge_mask=graph.edge_mask
    )
    num = dropout(num, drop, rng, train)
    msgs = num[:, None] * values[graph.senders]  # [E, F]
    h_prime = segment_sum(msgs, graph.receivers, n_pad)
    # Reference divides with no guard (self-loops ensure denom > 0 on real
    # rows; layers.py:160); padding rows have denom == 0, clamp those.
    denom = jnp.where(denom > 0, denom, 1.0)
    return h_prime / denom[:, None]


def gat_v1_sparse(
    params: V1Params,
    h: jax.Array,
    graph: Graph,
    rng,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    k1, k2, k3 = jax.random.split(rng, 3)
    h = dropout(h, drop, k1, train)
    Wh = h @ params.W
    Wh = dropout(Wh, drop, k2, train)

    f_out = params.W.shape[1]
    # SDDMM-style decomposition: a^T [Wh_i || Wh_j] = <a_dst, Wh_i> + <a_src, Wh_j>
    # — never materializes the reference's [2F', E] concat (layers.py:141).
    f_dst = Wh @ params.a[:f_out]  # pairs Wh[edge dst] (reference edge[0])
    f_src = Wh @ params.a[f_out:]  # pairs Wh[edge src] (reference edge[1])
    edge_logits = leaky_relu(f_dst[graph.receivers] + f_src[graph.senders], alpha)

    h_prime = _sparse_attention_aggregate(
        edge_logits, Wh, graph, k3, drop=drop, train=train
    )
    return _finish(h_prime, h, params.skip, concat)


def gat_v2_sparse(
    params: V2Params,
    h: jax.Array,
    graph: Graph,
    rng,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    f_in = h.shape[1]
    h = dropout(h, drop, k1, train)
    Whi = h @ params.W[:f_in]  # left: gathered at the receiver i
    Whj = h @ params.W[f_in:]  # right: gathered at the sender j
    Whi = dropout(Whi, drop, k2, train)
    Whj = dropout(Whj, drop, k3, train)

    # GATv2: LeakyReLU BEFORE the a-projection (reference layers.py:280-283).
    pre = Whi[graph.receivers] + Whj[graph.senders]  # [E, F_out]
    edge_logits = leaky_relu(pre, alpha) @ params.a

    # Aggregates the LEFT projection Whi of the sender (reference layers.py:296).
    h_prime = _sparse_attention_aggregate(
        edge_logits, Whi, graph, k4, drop=drop, train=train
    )
    return _finish(h_prime, h, params.skip, concat)


def gat_v1_sparse_all_heads(
    params: V1Params,  # stacked [H, ...] leaves
    h: jax.Array,  # [N, F_in]
    graph: Graph,
    tiles,  # pygat_tpu.ops.tiles.TiledGraph
    rng,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
    interpret: bool = False,
) -> jax.Array:
    """Head-batched sparse GATv1 through the fused Pallas kernel.

    Semantics match ``gat_v1_sparse`` incl. dropout placement (per-head
    input and post-projection masks; attention dropout applied to the
    numerator with a pre-dropout denominator). One deliberate divergence:
    the attention-dropout mask is shared across heads on this path (the
    vmapped XLA path draws per-head masks). Returns [H, N, F_out].
    """
    from pygat_tpu.ops.sparse_attention import gat_attention_v1

    n_heads = params.W.shape[0]
    f_out = params.W.shape[-1]
    k_in, k_proj, k_att = jax.random.split(rng, 3)
    use_drop = train and drop > 0.0
    if use_drop:
        in_keys = jax.random.split(k_in, n_heads)
        x_h = jax.vmap(lambda k: dropout(h, drop, k, True))(in_keys)  # [H, N, F_in]
        wh = jnp.einsum("hnf,hfo->hno", x_h, params.W)
        proj_keys = jax.random.split(k_proj, n_heads)
        wh = jax.vmap(lambda w, k: dropout(w, drop, k, True))(wh, proj_keys)
    else:
        x_h = None
        wh = jnp.einsum("nf,hfo->hno", h, params.W)

    f_dst = jnp.einsum("hno,ho->hn", wh, params.a[:, :f_out])
    f_src = jnp.einsum("hno,ho->hn", wh, params.a[:, f_out:])
    out = gat_attention_v1(
        f_dst, f_src, wh, graph, tiles, alpha=alpha, backend="pallas",
        interpret=interpret, dropout_rate=drop, dropout_rng=k_att, train=train,
    )
    if params.skip is not None:
        if x_h is not None:
            out = out + jnp.einsum("hnf,hfo->hno", x_h, params.skip)
        else:
            out = out + jnp.einsum("nf,hfo->hno", h, params.skip)
    if concat:
        out = jax.nn.elu(out)
    return out
