"""Differentiable fused sparse attention op (v1 logits), dropout included.

Forward: the Pallas fused kernel (pygat_tpu.ops.fused_attention) — SDDMM +
online segment-softmax + SpMM in one pass, MXU-only.

Attention dropout follows the reference exactly (layers.py:150-160): the
softmax DENOMINATOR uses pre-dropout numerators; dropout multiplies the
numerator used for aggregation. The keep mask is drawn with jax PRNG on the
flat edge array and gathered into chunk layout via ``TiledGraph.edge_perm``,
so the analytic backward reuses the identical mask.

Backward: closed-form VJP in XLA segment ops on the flat COO arrays —
replacing the reference's O(N^2)-dense SpecialSpmmFunction.backward
(reference layers.py:80-90). With q = keep/(1-p), att = softmax weights,
attq = att*q:

    dattq[e] = <g[recv_e], wh[send_e]>                      (SDDMM)
    S[i]     = seg_sum(attq * dattq)
    dl[e]    = attq[e]*dattq[e] - att[e]*S[recv_e]
    dpre     = dl * leaky'(pre)
    df_dst   = seg_sum_by_recv(dpre);  df_src = seg_sum_by_send(dpre)
    dwh[s]  += attq[e] * g[recv_e]                          (SpMM^T)

All integer topology arrays get None cotangents.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pygat_tpu.graph import Graph
from tests.legacy_bcsr.fused_attention import fused_gat_attention_fwd
from pygat_tpu.ops.segment import (
    segment_softmax_stable,
    segment_sum,
    sender_segment_sum,
    sorted_segment_sum,
)
from tests.legacy_bcsr.tiles import TILE, TiledGraph


def _attention_weights(f_dst, f_src, senders, receivers, edge_mask, alpha, n_pad,
                       row_ptr=None):
    """[E] attention (post-softmax, pre-dropout) + the pre-activation."""
    pre = f_dst[receivers] + f_src[senders]
    logit = jnp.where(pre >= 0, pre, alpha * pre)
    num, den = segment_softmax_stable(logit, receivers, n_pad, edge_mask=edge_mask,
                                      row_ptr=row_ptr)
    att = num / jnp.where(den > 0, den, 1.0)[receivers]
    return att, pre


def _xla_forward(f_dst, f_src, wh, senders, receivers, edge_mask, alpha,
                 keep_scaled=None, row_ptr=None):
    """Head-batched XLA segment-op path (keep_scaled: [E] dropout multiplier
    applied to the numerator only — None means no dropout)."""
    n_pad = f_dst.shape[-1]

    def head(fd, fs, w):
        att, _ = _attention_weights(fd, fs, senders, receivers, edge_mask, alpha,
                                    n_pad, row_ptr=row_ptr)
        attq = att if keep_scaled is None else att * keep_scaled
        msgs = attq[:, None] * w[senders]
        if row_ptr is not None:
            return sorted_segment_sum(msgs, receivers, row_ptr)
        return segment_sum(msgs, receivers, n_pad)

    return jax.vmap(head)(f_dst, f_src, wh)


def _chunked(arr2d):
    c = arr2d.shape[0]
    return arr2d.reshape(c // 8, 8, arr2d.shape[1])


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_attention(alpha, interpret, precision, f_dst, f_src, wh,
                     chunk_row, chunk_col, recv8, send8, valid8, drop8,
                     keep_scaled, senders, receivers, edge_mask,
                     row_ptr, col_perm, col_ptr):
    tiles = _tiles_view(chunk_row, chunk_col, recv8, send8, valid8,
                        f_dst.shape[-1])
    return fused_gat_attention_fwd(
        f_dst, f_src, wh, tiles, drop8=drop8, alpha=alpha, interpret=interpret,
        precision=precision,
    )


def _tiles_view(chunk_row, chunk_col, recv8, send8, valid8, n_pad) -> TiledGraph:
    c = recv8.shape[0] * recv8.shape[1]
    ec = recv8.shape[2]
    return TiledGraph(
        chunk_row=chunk_row,
        chunk_col=chunk_col,
        chunk_last=chunk_row,  # unused by the kernel
        recv_local=recv8.reshape(c, ec),
        send_local=send8.reshape(c, ec),
        valid=valid8.reshape(c, ec),
        edge_perm=recv8.reshape(c, ec),  # unused by the kernel
        n_tiles=n_pad // TILE,
    )


def _fused_fwd(alpha, interpret, precision, f_dst, f_src, wh,
               chunk_row, chunk_col, recv8, send8, valid8, drop8,
               keep_scaled, senders, receivers, edge_mask,
               row_ptr, col_perm, col_ptr):
    out = _fused_attention(alpha, interpret, precision, f_dst, f_src, wh,
                           chunk_row, chunk_col, recv8, send8, valid8, drop8,
                           keep_scaled, senders, receivers, edge_mask,
                           row_ptr, col_perm, col_ptr)
    return out, (f_dst, f_src, wh, keep_scaled, senders, receivers, edge_mask,
                 row_ptr, col_perm, col_ptr)


def _fused_bwd(alpha, interpret, precision, res, g):
    (f_dst, f_src, wh, keep_scaled, senders, receivers, edge_mask,
     row_ptr, col_perm, col_ptr) = res
    n_pad = f_dst.shape[-1]

    def head(fd, fs, w, gh):
        att, pre = _attention_weights(fd, fs, senders, receivers, edge_mask,
                                      alpha, n_pad, row_ptr=row_ptr)
        attq = att * keep_scaled
        dattq = jnp.sum(gh[receivers] * w[senders], axis=-1)  # [E]
        s = sorted_segment_sum(attq * dattq, receivers, row_ptr)
        dl = attq * dattq - att * s[receivers]
        dpre = jnp.where(pre >= 0, dl, alpha * dl)
        dpre = jnp.where(edge_mask, dpre, 0.0)
        dfd = sorted_segment_sum(dpre, receivers, row_ptr)
        dfs = sender_segment_sum(dpre, senders, col_perm, col_ptr)
        dw = sender_segment_sum(attq[:, None] * gh[receivers], senders,
                                col_perm, col_ptr)
        return dfd, dfs, dw

    dfd, dfs, dwh = jax.vmap(head)(f_dst, f_src, wh, g)
    none = (None,) * 13
    return (dfd, dfs, dwh) + none


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def gat_attention_v1(
    f_dst: jax.Array,  # [H, N_pad]
    f_src: jax.Array,  # [H, N_pad]
    wh: jax.Array,  # [H, N_pad, F]
    graph: Graph,
    tiles: TiledGraph | None,
    *,
    alpha: float,
    backend: str = "xla",
    interpret: bool = False,
    precision: str = "default",
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    train: bool = False,
) -> jax.Array:
    """Head-batched sparse GATv1 attention-aggregation, backend-dispatched.

    One dropout mask is shared across heads here; the reference draws an
    independent mask per head module — per-head masks are obtained by
    calling this per head or by folding head into the edge dimension.
    """
    use_drop = train and dropout_rate > 0.0
    keep_scaled = None
    if use_drop:
        if dropout_rng is None:
            raise ValueError("dropout requires dropout_rng")
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, shape=graph.senders.shape
        )
        keep_scaled = keep.astype(jnp.float32) / (1.0 - dropout_rate)

    if backend == "pallas":
        if tiles is None:
            raise ValueError("pallas backend requires a TiledGraph")
        if graph.col_perm is None or graph.col_ptr is None:
            # the analytic backward reduces over senders via the CSC view;
            # hand-built Graphs without one must use the XLA backend
            raise ValueError(
                "pallas backend requires a Graph with a CSC view "
                "(col_perm/col_ptr); build it via pygat_tpu.graph.build_graph"
            )
        if keep_scaled is None:
            drop_flat = tiles.valid  # 1.0 on real slots, 0 on padding
        else:
            perm = jnp.maximum(tiles.edge_perm, 0)
            drop_flat = jnp.take(keep_scaled, perm) * tiles.valid
        ks = keep_scaled if keep_scaled is not None else edge_ones(graph)
        return _fused_attention(
            alpha, interpret, precision, f_dst, f_src, wh,
            tiles.chunk_row, tiles.chunk_col,
            _chunked(tiles.recv_local), _chunked(tiles.send_local),
            _chunked(tiles.valid), _chunked(drop_flat),
            ks, graph.senders, graph.receivers, graph.edge_mask,
            graph.row_ptr, graph.col_perm, graph.col_ptr,
        )
    return _xla_forward(
        f_dst, f_src, wh, graph.senders, graph.receivers, graph.edge_mask,
        alpha, keep_scaled=keep_scaled, row_ptr=graph.row_ptr,
    )


def edge_ones(graph: Graph) -> jax.Array:
    return jnp.ones_like(graph.edge_weight)
