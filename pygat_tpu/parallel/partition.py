"""Edge-partitioned distributed attention with ring halo exchange.

The hand-scheduled counterpart of the GSPMD path (SURVEY §2.11 item 2 and
§5 'long-context'): nodes are block-partitioned over the 'data' mesh axis;
each device owns a node shard (all incoming edges of its rows). Remote
sender features arrive by rotating (f_src, Wh) shards around the ICI ring
with ``ppermute`` — one hop per step, overlapped by XLA with the local
compute — while a running (max, denom, out) accumulator performs the
ONLINE segment softmax across steps:

    for k in 0..D-1:                      # D = data-axis size
        process edges whose senders live on shard (me - k) % D
        m_new = max(m, chunk_max); rescale denom/out by exp(m - m_new)
        rotate (f_src, Wh) one hop

This is exactly the ring/flash-attention recipe applied to segment softmax
(the reference's scatter_max stabilization, layers.py:145-146, generalized
across chips). Differentiable end-to-end: ppermute/psum have transposes, so
``jax.grad`` through the shard_mapped forward yields the distributed
backward automatically.

Host-side prep (``partition_edges``) buckets each destination shard's edges
by source shard into a static [D, D, E_blk] layout.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pygat_tpu.graph import Graph
from pygat_tpu.parallel.mesh import DATA_AXIS
from pygat_tpu.utils.padding import round_up


class EdgePartition(NamedTuple):
    """Static ring-partitioned edge layout.

    For destination shard d and source shard s, edges land in block
    [d, s, :]: ``recv_local`` is the receiver relative to shard d's node
    range, ``send_local`` the sender relative to shard s's range.
    """

    recv_local: jax.Array  # [D, D, E_blk] int32
    send_local: jax.Array  # [D, D, E_blk] int32
    edge_mask: jax.Array  # [D, D, E_blk] bool
    n_shards: int
    n_local: int  # nodes per shard (N_pad / D)

    @property
    def block_edges(self) -> int:
        return self.recv_local.shape[-1]


def partition_edges(graph: Graph, n_shards: int) -> EdgePartition:
    n_pad = graph.num_nodes_padded
    if n_pad % n_shards:
        raise ValueError(f"N_pad={n_pad} not divisible by {n_shards} shards")
    n_local = n_pad // n_shards

    mask = np.asarray(graph.edge_mask)
    send = np.asarray(graph.senders)[mask].astype(np.int64)
    recv = np.asarray(graph.receivers)[mask].astype(np.int64)
    dsh = recv // n_local
    ssh = send // n_local

    counts = np.zeros((n_shards, n_shards), np.int64)
    np.add.at(counts, (dsh, ssh), 1)
    e_blk = round_up(max(int(counts.max()), 1), 8)

    recv_l = np.zeros((n_shards, n_shards, e_blk), np.int32)
    send_l = np.zeros((n_shards, n_shards, e_blk), np.int32)
    msk = np.zeros((n_shards, n_shards, e_blk), bool)

    order = np.lexsort((recv, ssh, dsh))
    send, recv, dsh, ssh = send[order], recv[order], dsh[order], ssh[order]
    key = dsh * n_shards + ssh
    starts = np.searchsorted(key, np.arange(n_shards * n_shards))
    pos = np.arange(len(send)) - starts[key]
    recv_l[dsh, ssh, pos] = (recv - dsh * n_local).astype(np.int32)
    send_l[dsh, ssh, pos] = (send - ssh * n_local).astype(np.int32)
    msk[dsh, ssh, pos] = True

    return EdgePartition(
        recv_local=jnp.asarray(recv_l),
        send_local=jnp.asarray(send_l),
        edge_mask=jnp.asarray(msk),
        n_shards=n_shards,
        n_local=n_local,
    )


def ring_gat_attention(
    f_dst: jax.Array,  # [H, N_pad]
    f_src: jax.Array,  # [H, N_pad]
    wh: jax.Array,  # [H, N_pad, F]
    part: EdgePartition,
    mesh: Mesh,
    *,
    alpha: float,
    att_keep: jax.Array | None = None,  # [H, D, D, E_blk] keep/(1-p), or None
) -> jax.Array:
    """[H, N_pad, F] — identical math to the single-chip sparse v1 attention
    but executed SPMD over the 'data' axis with a ppermute ring.

    ``att_keep`` applies reference-style attention dropout to the
    aggregation numerator only (pre-dropout denominator,
    reference layers.py:150-160), indexed in partition layout."""
    d = part.n_shards
    if mesh.shape[DATA_AXIS] != d:
        raise ValueError(
            f"partition built for {d} shards, mesh data axis is "
            f"{mesh.shape[DATA_AXIS]}"
        )
    neg = jnp.asarray(-1e30, jnp.float32)
    if att_keep is None:
        att_keep = jnp.ones(
            (f_dst.shape[0],) + tuple(part.edge_mask.shape), jnp.float32
        )

    def body(fd, fs, w, rl, sl, em, keep):
        # shapes inside shard_map (per device):
        # fd/fs [H, n_local]; w [H, n_local, F]; rl/sl/em [1, D, E_blk]
        me = lax.axis_index(DATA_AXIS)
        h, n_local = fd.shape
        f = w.shape[-1]
        rl, sl, em = rl[0], sl[0], em[0]  # [D, E_blk]
        keep = keep[:, 0]  # [H, D, E_blk]

        m = jnp.full((h, n_local), neg)
        den = jnp.zeros((h, n_local))
        out = jnp.zeros((h, n_local, f))
        fs_buf, w_buf = fs, w

        for k in range(d):  # static ring schedule
            src_shard = (me - k) % d
            rl_k = jnp.take(rl, src_shard, axis=0)  # [E_blk]
            sl_k = jnp.take(sl, src_shard, axis=0)
            em_k = jnp.take(em, src_shard, axis=0)
            keep_k = jnp.take(keep, src_shard, axis=1)  # [H, E_blk]

            def upd(m_h, den_h, out_h, fd_h, fs_h, w_h, keep_h):
                pre = fd_h[rl_k] + fs_h[sl_k]
                logit = jnp.where(pre >= 0, pre, alpha * pre)
                logit = jnp.where(em_k, logit, neg)
                cm = jax.ops.segment_max(logit, rl_k, num_segments=n_local)
                cm = jnp.where(cm > neg / 2, cm, neg)
                m_new = jnp.maximum(m_h, cm)
                scale = jnp.exp(jnp.where(m_h > neg / 2, m_h - m_new, 0.0))
                num = jnp.exp(logit - jnp.where(m_new > neg / 2, m_new, 0.0)[rl_k])
                num = jnp.where(em_k, num, 0.0)
                den_new = den_h * scale + jax.ops.segment_sum(
                    num, rl_k, num_segments=n_local
                )
                msgs = (num * keep_h)[:, None] * w_h[sl_k]
                out_new = out_h * scale[:, None] + jax.ops.segment_sum(
                    msgs, rl_k, num_segments=n_local
                )
                return m_new, den_new, out_new

            m, den, out = jax.vmap(upd)(m, den, out, fd, fs_buf, w_buf, keep_k)

            if k + 1 < d:
                perm = [(i, (i + 1) % d) for i in range(d)]
                fs_buf = lax.ppermute(fs_buf, DATA_AXIS, perm)
                w_buf = lax.ppermute(w_buf, DATA_AXIS, perm)

        return out / jnp.where(den > 0, den, 1.0)[:, :, None]

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, DATA_AXIS),  # f_dst by node shard
            P(None, DATA_AXIS),  # f_src by node shard
            P(None, DATA_AXIS, None),  # wh by node shard
            P(DATA_AXIS, None, None),  # recv_local by dest shard
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(None, DATA_AXIS, None, None),  # att_keep by dest shard
        ),
        out_specs=P(None, DATA_AXIS, None),
        check_vma=False,
    )(f_dst, f_src, wh, part.recv_local, part.send_local, part.edge_mask,
      att_keep)


def ring_gat_attention_v2(
    whi: jax.Array,  # [H, N_pad, F] left projection (receiver logits + messages)
    whj: jax.Array,  # [H, N_pad, F] right projection (sender logits)
    a: jax.Array,  # [H, F] attention vectors
    part: EdgePartition,
    mesh: Mesh,
    *,
    alpha: float,
    att_keep: jax.Array | None = None,  # [H, D, D, E_blk] keep/(1-p), or None
) -> jax.Array:
    """GATv2 ring attention: per-edge ``a . leaky(whi[recv] + whj[send])``
    logits (reference layers.py:280-283) with aggregation of ``whi`` rows
    gathered at SENDERS (layers.py:296) — both the sender-logit operand
    (whj) and the message operand (whi) rotate around the ring. Online
    (max, denom, out) accumulators combine hops exactly like the v1 ring.

    ``att_keep`` applies reference-style attention dropout to the
    aggregation numerator only (the denominator stays pre-dropout,
    layers.py:150-160 order), indexed in partition layout.
    """
    d = part.n_shards
    if mesh.shape[DATA_AXIS] != d:
        raise ValueError(
            f"partition built for {d} shards, mesh data axis is "
            f"{mesh.shape[DATA_AXIS]}"
        )
    neg = jnp.asarray(-1e30, jnp.float32)
    if att_keep is None:
        att_keep = jnp.ones(
            (whi.shape[0],) + tuple(part.edge_mask.shape), jnp.float32
        )

    def body(wi, wj, av, rl, sl, em, keep):
        # per device: wi/wj [H, n_local, F]; av [H, F]; rl/sl/em [1, D, E_blk]
        me = lax.axis_index(DATA_AXIS)
        h, n_local, f = wi.shape
        rl, sl, em = rl[0], sl[0], em[0]
        keep = keep[:, 0]  # [H, D, E_blk]

        m = jnp.full((h, n_local), neg)
        den = jnp.zeros((h, n_local))
        out = jnp.zeros((h, n_local, f))
        wi_buf, wj_buf = wi, wj

        for k in range(d):  # static ring schedule
            src_shard = (me - k) % d
            rl_k = jnp.take(rl, src_shard, axis=0)
            sl_k = jnp.take(sl, src_shard, axis=0)
            em_k = jnp.take(em, src_shard, axis=0)
            keep_k = jnp.take(keep, src_shard, axis=1)  # [H, E_blk]

            def upd(m_h, den_h, out_h, wi_h, wib_h, wjb_h, a_h, keep_h):
                pre = wi_h[rl_k] + wjb_h[sl_k]  # [E_blk, F]
                logit = jnp.where(pre >= 0, pre, alpha * pre) @ a_h
                logit = jnp.where(em_k, logit, neg)
                cm = jax.ops.segment_max(logit, rl_k, num_segments=n_local)
                cm = jnp.where(cm > neg / 2, cm, neg)
                m_new = jnp.maximum(m_h, cm)
                scale = jnp.exp(jnp.where(m_h > neg / 2, m_h - m_new, 0.0))
                num = jnp.exp(
                    logit - jnp.where(m_new > neg / 2, m_new, 0.0)[rl_k]
                )
                num = jnp.where(em_k, num, 0.0)
                den_new = den_h * scale + jax.ops.segment_sum(
                    num, rl_k, num_segments=n_local
                )
                msgs = (num * keep_h)[:, None] * wib_h[sl_k]
                out_new = out_h * scale[:, None] + jax.ops.segment_sum(
                    msgs, rl_k, num_segments=n_local
                )
                return m_new, den_new, out_new

            m, den, out = jax.vmap(upd)(
                m, den, out, wi, wi_buf, wj_buf, av, keep_k
            )

            if k + 1 < d:
                perm = [(i, (i + 1) % d) for i in range(d)]
                wi_buf = lax.ppermute(wi_buf, DATA_AXIS, perm)
                wj_buf = lax.ppermute(wj_buf, DATA_AXIS, perm)

        return out / jnp.where(den > 0, den, 1.0)[:, :, None]

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, DATA_AXIS, None),
            P(None, DATA_AXIS, None),
            P(),  # attention vectors replicated
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(None, DATA_AXIS, None, None),  # att_keep by dest shard
        ),
        out_specs=P(None, DATA_AXIS, None),
        check_vma=False,
    )(whi, whj, a, part.recv_local, part.send_local, part.edge_mask, att_keep)
