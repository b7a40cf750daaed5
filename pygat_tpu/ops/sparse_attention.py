"""Differentiable fused sparse attention op (v1 logits).

Forward: the Pallas fused kernel (pygat_tpu.ops.fused_attention) — SDDMM +
online segment-softmax + SpMM in one pass, MXU-only.

Backward: closed-form VJP in XLA segment ops on the flat COO arrays —
replacing the reference's O(N^2)-dense SpecialSpmmFunction.backward
(reference layers.py:80-90: it materializes grad_output @ b.T as a dense
[N, N] and gathers; here every term stays O(E) or O(N F)):

    datt[e] = <g[recv_e], wh[send_e]>                      (SDDMM)
    dl[e]   = att[e] * (datt[e] - S[recv_e]),  S = seg_sum(att * datt)
    dpre    = dl * leaky'(pre)
    df_dst  = seg_sum_by_recv(dpre);  df_src = seg_sum_by_send(dpre)
    dwh[s] += att[e] * g[recv_e]                           (SpMM^T)

All integer topology arrays get None cotangents.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pygat_tpu.graph import Graph
from pygat_tpu.ops.fused_attention import fused_gat_attention_fwd
from pygat_tpu.ops.segment import segment_softmax_stable, segment_sum
from pygat_tpu.ops.tiles import TILE, TiledGraph


def _attention_weights(f_dst, f_src, senders, receivers, edge_mask, alpha, n_pad):
    """[E] attention (post-softmax) + residual terms, XLA segment ops."""
    pre = f_dst[receivers] + f_src[senders]
    logit = jnp.where(pre >= 0, pre, alpha * pre)
    num, den = segment_softmax_stable(logit, receivers, n_pad, edge_mask=edge_mask)
    att = num / jnp.where(den > 0, den, 1.0)[receivers]
    return att, pre


def _xla_forward(f_dst, f_src, wh, senders, receivers, edge_mask, alpha):
    n_pad = f_dst.shape[-1]

    def head(fd, fs, w):
        att, _ = _attention_weights(fd, fs, senders, receivers, edge_mask, alpha, n_pad)
        return segment_sum(att[:, None] * w[senders], receivers, n_pad)

    return jax.vmap(head)(f_dst, f_src, wh)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_attention(alpha, interpret, f_dst, f_src, wh,
                     chunk_row, chunk_col, recv8, send8, valid8,
                     senders, receivers, edge_mask):
    tiles = _tiles_view(chunk_row, chunk_col, recv8, send8, valid8, f_dst.shape[-1])
    return fused_gat_attention_fwd(
        f_dst, f_src, wh, tiles, alpha=alpha, interpret=interpret
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
        n_tiles=n_pad // TILE,
    )


def _fused_fwd(alpha, interpret, f_dst, f_src, wh,
               chunk_row, chunk_col, recv8, send8, valid8,
               senders, receivers, edge_mask):
    out = _fused_attention(alpha, interpret, f_dst, f_src, wh,
                           chunk_row, chunk_col, recv8, send8, valid8,
                           senders, receivers, edge_mask)
    return out, (f_dst, f_src, wh, senders, receivers, edge_mask)


def _fused_bwd(alpha, interpret, res, g):
    f_dst, f_src, wh, senders, receivers, edge_mask = res
    n_pad = f_dst.shape[-1]

    def head(fd, fs, w, gh):
        att, pre = _attention_weights(fd, fs, senders, receivers, edge_mask,
                                      alpha, n_pad)
        datt = jnp.sum(gh[receivers] * w[senders], axis=-1)  # [E]
        s = segment_sum(att * datt, receivers, n_pad)
        dl = att * (datt - s[receivers])
        dpre = jnp.where(pre >= 0, dl, alpha * dl)
        dpre = jnp.where(edge_mask, dpre, 0.0)
        dfd = segment_sum(dpre, receivers, n_pad)
        dfs = segment_sum(dpre, senders, n_pad, sorted_ids=False)
        dw = segment_sum(att[:, None] * gh[receivers], senders, n_pad,
                         sorted_ids=False)
        return dfd, dfs, dw

    dfd, dfs, dwh = jax.vmap(head)(f_dst, f_src, wh, g)
    return (dfd, dfs, dwh, None, None, None, None, None, None, None, None)


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
) -> jax.Array:
    """Head-batched sparse GATv1 attention-aggregation, backend-dispatched."""
    if backend == "pallas":
        if tiles is None:
            raise ValueError("pallas backend requires a TiledGraph")
        f = wh.shape[-1]
        f_pad = -(-f // 128) * 128
        wh_p = wh if f == f_pad else jnp.pad(wh, ((0, 0), (0, 0), (0, f_pad - f)))
        c = tiles.num_chunks
        ec = tiles.recv_local.shape[1]
        out = _fused_attention(
            alpha, interpret, f_dst, f_src, wh_p,
            tiles.chunk_row, tiles.chunk_col,
            tiles.recv_local.reshape(c // 8, 8, ec),
            tiles.send_local.reshape(c // 8, 8, ec),
            tiles.valid.reshape(c // 8, 8, ec),
            graph.senders, graph.receivers, graph.edge_mask,
        )
        return out[..., :f]
    return _xla_forward(
        f_dst, f_src, wh, graph.senders, graph.receivers, graph.edge_mask, alpha
    )
