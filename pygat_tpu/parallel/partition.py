"""Edge-partitioned distributed attention with ring halo exchange.

The hand-scheduled counterpart of the GSPMD path (SURVEY §2.11 item 2 and
§5 'long-context'): nodes are block-partitioned over the 'data' mesh axis;
each device owns a node shard (all incoming edges of its rows). Remote
sender features arrive by rotating the projected-feature shard around the
ICI ring with ``ppermute`` — one hop per step, overlapped by XLA with the
local compute — while per-shard segment reductions accumulate the softmax
numerator/denominator across hops:

    bound[i] = leaky(f_dst[i] + max_j f_src[j])      # one pmax, pre-ring
    for k in 0..D-1:                                  # D = data-axis size
        process edges whose senders live on shard (me - k) % D
        acc += segment_sum(exp(logit - bound[recv]) * msg)
        rotate the feature shard one hop

The per-receiver shift uses the same monotone upper bound as the
single-chip layers (models/layers.py) instead of a per-hop running max:
softmax is shift-invariant, the bound needs ONE cross-shard ``pmax``
before the ring, and every hop becomes a pure segment-sum — no
re-scaling, no scatter-max. That makes each device's inner reduction the
SAME stream-scatter Pallas kernel as the single-chip fast path
(pygat_tpu.ops.stream), run on the device-local edge block: EdgePartition
carries per-(dst-shard, src-shard) stream layouts (chunk-aligned slots,
chunk->tile maps, and a sender-sorted view for the backward), so forward
AND backward reductions are one-hot MXU matmuls instead of XLA's serial
scatter. This is the multi-chip generalization of the reference's
scatter_max/SpMM pipeline (reference layers.py:145-160).

Differentiable end-to-end: ppermute/psum have transposes and the block
gathers/reduces carry custom VJPs, so ``jax.grad`` through the
shard_mapped forward yields the distributed backward automatically.

Host-side prep (``partition_edges``) buckets each destination shard's
edges by source shard into static [D, D, E_blk] layouts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pygat_tpu.graph import Graph
from pygat_tpu.models.layers import softmax_div
from pygat_tpu.parallel.mesh import DATA_AXIS
from pygat_tpu.utils.padding import round_up


class EdgePartition(NamedTuple):
    """Static ring-partitioned edge layout.

    For destination shard d and source shard s, edges land in block
    [d, s, :]: ``recv_local`` is the receiver relative to shard d's node
    range, ``send_local`` the sender relative to shard s's range; blocks
    are receiver-sorted (padding slots keep the order, so per-block
    segment ids are sorted).

    When ``n_local`` is a multiple of 128 the blocks are STREAM-ALIGNED
    (pygat_tpu.ops.stream contract): every 256-edge chunk of a block
    scatters into one 128-row tile of the local output; ``local``/``chunk``
    drive the receiver-side kernel and ``s_slot``/``s_local``/``s_chunk``
    a sender-sorted view for the backward gather-transpose. These are
    None otherwise (the ring then reduces with sorted XLA segment ops).
    """

    recv_local: jax.Array  # [D, D, E_blk] int32
    send_local: jax.Array  # [D, D, E_blk] int32
    edge_mask: jax.Array  # [D, D, E_blk] bool
    node_mask: jax.Array  # [D, n_local] bool (real-node rows of each shard)
    n_shards: int
    n_local: int  # nodes per shard (N_pad / D)
    local: jax.Array | None = None  # [D, D, E_blk] int32 (128 = dead slot)
    chunk: jax.Array | None = None  # [D, D, E_blk / 256] int32 tile per chunk
    s_slot: jax.Array | None = None  # [D, D, E_s2] int32 block pos per slot
    s_local: jax.Array | None = None  # [D, D, E_s2] int32
    s_chunk: jax.Array | None = None  # [D, D, E_s2 / 256] int32
    # --- halo compression (SURVEY §2.11 item 2: "remote neighbor features
    # fetched as a halo exchange"). halo_idx[s, d] lists the LOCAL rows of
    # source shard s that destination shard d's edges reference (sorted
    # unique, padded with n_local-1 to the global Hmax = h_rows); h_send
    # re-expresses send_local in halo positions, and h_slot/h_local/
    # h_chunk are the per-block sender-sorted stream views over h_rows
    # rows (the backward reduction of a halo buffer). None when d == 1 or
    # the partition is not stream-aligned.
    halo_idx: jax.Array | None = None  # [D(src), D(dst), Hmax] int32
    h_send: jax.Array | None = None  # [D(dst), D(src), E_blk] int32
    h_slot: jax.Array | None = None  # [D, D, E_s2h] int32
    h_local: jax.Array | None = None  # [D, D, E_s2h] int32
    h_chunk: jax.Array | None = None  # [D, D, E_s2h / 256] int32
    h_rows: int = 0  # Hmax (128-aligned halo buffer rows)

    @property
    def block_edges(self) -> int:
        return self.recv_local.shape[-1]

    @property
    def has_stream(self) -> bool:
        return self.local is not None

    @property
    def has_halo(self) -> bool:
        return self.halo_idx is not None


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
    e_raw = round_up(max(int(counts.max()), 1), 8)

    order = np.lexsort((recv, ssh, dsh))
    send, recv, dsh, ssh = send[order], recv[order], dsh[order], ssh[order]
    key = dsh * n_shards + ssh
    starts = np.searchsorted(key, np.arange(n_shards * n_shards))
    pos = np.arange(len(send)) - starts[key]
    rl_all = (recv - dsh * n_local).astype(np.int32)
    sl_all = (send - ssh * n_local).astype(np.int32)

    node_mask = np.asarray(graph.node_mask).reshape(n_shards, n_local)

    if n_local % 128 == 0:
        # stream-aligned blocks: chunk-of-256 edges -> one 128-row tile
        from pygat_tpu.ops.stream import _ALIGN, EC, build_stream_layout

        d = n_shards
        n_tiles = n_local // 128

        # EXACT stream length per block (not stream_length's worst-case
        # degree-distribution bound, which at small blocks more than
        # doubles the padded per-hop work): each 128-row tile needs
        # ceil(count / EC) chunks, and every tile — empty included — costs
        # at least one chunk (the kernel zero-initializes an output block
        # on the first grid step that visits it).
        def _chunks_needed(local_ids: np.ndarray) -> int:
            key2 = (dsh * d + ssh) * n_tiles + local_ids // 128
            per_tile = np.bincount(key2, minlength=d * d * n_tiles)
            per_tile = per_tile.reshape(d * d, n_tiles)
            return int(np.maximum(-(-per_tile // EC), 1).sum(axis=1).max())

        e_blk = -(-_chunks_needed(rl_all) * EC // _ALIGN) * _ALIGN
        e_s2 = -(-_chunks_needed(sl_all) * EC // _ALIGN) * _ALIGN
        recv_l = np.zeros((d, d, e_blk), np.int32)
        send_l = np.zeros((d, d, e_blk), np.int32)
        msk = np.zeros((d, d, e_blk), bool)
        loc = np.full((d, d, e_blk), 128, np.int32)
        chk = np.zeros((d, d, e_blk // EC), np.int32)
        s_slot = np.zeros((d, d, e_s2), np.int32)
        s_loc = np.full((d, d, e_s2), 128, np.int32)
        s_chk = np.zeros((d, d, e_s2 // EC), np.int32)

        for di in range(d):
            for si in range(d):
                b = starts[di * d + si]
                c = int(counts[di, si])
                rl_b = rl_all[b : b + c]
                sl_b = sl_all[b : b + c]
                ptr = np.zeros(n_local + 1, np.int64)
                np.cumsum(np.bincount(rl_b, minlength=n_local), out=ptr[1:])
                lay = build_stream_layout(ptr, stream_pad=e_blk)
                live = lay.slot >= 0
                src = np.maximum(lay.slot, 0)
                # dead slots keep receivers sorted (their tile's last row)
                tile_of = lay.chunk_tile[np.arange(e_blk) // EC].astype(np.int64)
                if c:
                    recv_l[di, si] = np.where(live, rl_b[src],
                                              tile_of * 128 + 127)
                    send_l[di, si] = np.where(live, sl_b[src], 0)
                else:  # empty block: all-dead chunks (mask stays False)
                    recv_l[di, si] = tile_of * 128 + 127
                msk[di, si] = live
                loc[di, si] = lay.local
                chk[di, si] = lay.chunk_tile
                # sender-sorted view over the LIVE slots of this block (for
                # the backward gather-transpose = per-sender segment sum)
                live_idx = np.flatnonzero(live)
                sb = send_l[di, si][live_idx]
                rb = recv_l[di, si][live_idx]
                o2 = np.lexsort((rb, sb))
                ptr2 = np.zeros(n_local + 1, np.int64)
                np.cumsum(np.bincount(sb, minlength=n_local), out=ptr2[1:])
                lay2 = build_stream_layout(
                    ptr2, order=live_idx[o2], stream_pad=e_s2
                )
                s_slot[di, si] = np.maximum(lay2.slot, 0).astype(np.int32)
                s_loc[di, si] = lay2.local
                s_chk[di, si] = lay2.chunk_tile

        # --- halo compression metadata (off-diagonal pairs): the unique
        # sender rows each (dst, src) block references, padded to a global
        # 128-aligned Hmax, plus each block's sender ids and sender-sorted
        # stream view re-expressed in halo-local positions.
        halo_fields: dict = {}
        if d > 1:
            uniq: dict = {}
            hmax = 1
            for di in range(d):
                for si in range(d):
                    if di == si:
                        continue
                    b = starts[di * d + si]
                    c = int(counts[di, si])
                    u = (np.unique(sl_all[b:b + c]) if c
                         else np.zeros(0, np.int64))
                    uniq[(di, si)] = u
                    hmax = max(hmax, len(u))
            h_rows = round_up(hmax, 128)
            h_tiles = h_rows // 128
            max_chunks = h_tiles
            for (di, si), u in uniq.items():
                c = int(counts[di, si])
                if not c:
                    continue
                b = starts[di * d + si]
                hb = np.searchsorted(u, sl_all[b:b + c])
                per_tile = np.bincount(hb // 128, minlength=h_tiles)
                max_chunks = max(
                    max_chunks,
                    int(np.maximum(-(-per_tile // EC), 1).sum()))
            e_s2h = -(-max_chunks * EC // _ALIGN) * _ALIGN
            halo_idx = np.full((d, d, h_rows), n_local - 1, np.int32)
            h_send = np.zeros((d, d, e_blk), np.int32)
            h_slot = np.zeros((d, d, e_s2h), np.int32)
            h_loc = np.full((d, d, e_s2h), 128, np.int32)
            h_chk = np.zeros((d, d, e_s2h // EC), np.int32)
            dead_chk = np.minimum(np.arange(e_s2h // EC, dtype=np.int32),
                                  h_tiles - 1)
            for di in range(d):
                for si in range(d):
                    if di == si:
                        continue
                    u = uniq[(di, si)]
                    halo_idx[si, di, :len(u)] = u
                    live_idx = np.flatnonzero(msk[di, si])
                    if not len(live_idx):
                        h_chk[di, si] = dead_chk
                        continue
                    hb = np.searchsorted(u, send_l[di, si][live_idx])
                    h_send[di, si][live_idx] = hb.astype(np.int32)
                    rb = recv_l[di, si][live_idx]
                    o2 = np.lexsort((rb, hb))
                    ptr2 = np.zeros(h_rows + 1, np.int64)
                    np.cumsum(np.bincount(hb, minlength=h_rows),
                              out=ptr2[1:])
                    lay2 = build_stream_layout(ptr2, order=live_idx[o2],
                                               stream_pad=e_s2h)
                    h_slot[di, si] = np.maximum(lay2.slot, 0).astype(np.int32)
                    h_loc[di, si] = lay2.local
                    h_chk[di, si] = lay2.chunk_tile
            halo_fields = dict(
                halo_idx=jnp.asarray(halo_idx),
                h_send=jnp.asarray(h_send),
                h_slot=jnp.asarray(h_slot),
                h_local=jnp.asarray(h_loc),
                h_chunk=jnp.asarray(h_chk),
                h_rows=h_rows,
            )

        return EdgePartition(
            recv_local=jnp.asarray(recv_l),
            send_local=jnp.asarray(send_l),
            edge_mask=jnp.asarray(msk),
            node_mask=jnp.asarray(node_mask),
            n_shards=n_shards,
            n_local=n_local,
            local=jnp.asarray(loc),
            chunk=jnp.asarray(chk),
            s_slot=jnp.asarray(s_slot),
            s_local=jnp.asarray(s_loc),
            s_chunk=jnp.asarray(s_chk),
            **halo_fields,
        )

    # legacy dense-packed blocks (no stream kernels): padding slots fill
    # the tail with receiver n_local-1 so per-block ids stay sorted
    recv_l = np.full((n_shards, n_shards, e_raw), n_local - 1, np.int32)
    send_l = np.zeros((n_shards, n_shards, e_raw), np.int32)
    msk = np.zeros((n_shards, n_shards, e_raw), bool)
    recv_l[dsh, ssh, pos] = rl_all
    send_l[dsh, ssh, pos] = sl_all
    msk[dsh, ssh, pos] = True

    return EdgePartition(
        recv_local=jnp.asarray(recv_l),
        send_local=jnp.asarray(send_l),
        edge_mask=jnp.asarray(msk),
        node_mask=jnp.asarray(node_mask),
        n_shards=n_shards,
        n_local=n_local,
    )


# ---------------------------------------------------------------------------
# Per-block segment primitives (device-local, inside shard_map). All carry
# custom VJPs so neither direction emits an XLA scatter when the partition
# is stream-aligned. ``data``/cotangents at masked (dead) slots must be
# zero — the ring bodies guarantee that via the edge-mask on the softmax
# numerator.
# ---------------------------------------------------------------------------


def _stream_args():
    from pygat_tpu.ops import segment as _seg

    return _seg._STREAM_PRECISION, _seg._stream_interpret()


def _part_use_stream(part: EdgePartition) -> bool:
    from pygat_tpu.ops import segment as _seg

    return part.has_stream and _seg._stream_enabled()


def _part_use_fused(part: EdgePartition) -> bool:
    """Fused per-hop attention kernels inside the ring (the multi-chip
    twin of models/layers' fused branch): per-edge logits/exp/dropout/
    messages/scatter in ONE Pallas call per (hop) block."""
    from pygat_tpu.ops import fused_stream as _fs
    from pygat_tpu.ops import segment as _seg

    if not part.has_stream:
        return False
    mode = _fs._fused_mode()
    if mode == "off":
        return False
    return True if mode == "on" else _seg._stream_enabled()


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def block_recv_reduce(data, rl, loc, ct, n_local: int, use_stream: bool):
    """Per-receiver segment sum of block ``data`` [E, L] -> [n_local, L]."""
    if use_stream:
        from pygat_tpu.ops.stream import stream_scatter

        precision, interpret = _stream_args()
        return stream_scatter(data, loc, ct, n_local, precision=precision,
                              interpret=interpret)
    return jax.ops.segment_sum(data, rl, num_segments=n_local,
                               indices_are_sorted=True)


def _brr_fwd(data, rl, loc, ct, n_local, use_stream):
    return block_recv_reduce(data, rl, loc, ct, n_local, use_stream), rl


def _brr_bwd(n_local, use_stream, rl, g):
    return g[rl], None, None, None


block_recv_reduce.defvjp(_brr_fwd, _brr_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def block_take_receivers(x, rl, loc, ct, n_local: int, use_stream: bool):
    """``x[rl]`` whose VJP is the per-block receiver segment sum."""
    return x[rl]


def _btr_fwd(x, rl, loc, ct, n_local, use_stream):
    return x[rl], (rl, loc, ct)


def _btr_bwd(n_local, use_stream, res, g):
    rl, loc, ct = res
    return (block_recv_reduce(g, rl, loc, ct, n_local, use_stream),
            None, None, None)


block_take_receivers.defvjp(_btr_fwd, _btr_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def block_take_senders(x, sl, s_slot, s_loc, s_chunk, n_local: int,
                       use_stream: bool):
    """``x[sl]`` whose VJP is a per-SENDER segment sum (the stream kernel
    over the block's sender-sorted view when available)."""
    return x[sl]


def _bts_fwd(x, sl, s_slot, s_loc, s_chunk, n_local, use_stream):
    return x[sl], (sl, s_slot, s_loc, s_chunk)


def _bts_bwd(n_local, use_stream, res, g):
    sl, s_slot, s_loc, s_chunk = res
    if use_stream:
        from pygat_tpu.ops.stream import stream_scatter

        precision, interpret = _stream_args()
        dx = stream_scatter(g[s_slot], s_loc, s_chunk, n_local,
                            precision=precision, interpret=interpret)
    else:
        dx = jax.ops.segment_sum(g, sl, num_segments=n_local)
    return dx, None, None, None, None


block_take_senders.defvjp(_bts_fwd, _bts_bwd)


def _dummy_stream_fields(part: EdgePartition):
    """Placeholder layout arrays for the non-stream path (never read)."""
    d = part.n_shards
    z2 = jnp.zeros((d, d, 8), jnp.int32)
    z1 = jnp.zeros((d, d, 8), jnp.int32)
    return (part.local if part.local is not None else z2,
            part.chunk if part.chunk is not None else z1,
            part.s_slot if part.s_slot is not None else z2,
            part.s_local if part.s_local is not None else z2,
            part.s_chunk if part.s_chunk is not None else z1)


def _halo_fields(part: EdgePartition):
    """(halo_idx, h_send, h_slot, h_local, h_chunk) with placeholders when
    the partition carries no halo metadata (never read then)."""
    d = part.n_shards
    z = jnp.zeros((d, d, 8), jnp.int32)
    if not part.has_halo:
        return z, z, z, z, z
    return (part.halo_idx, part.h_send, part.h_slot, part.h_local,
            part.h_chunk)


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def ring_gat_attention(
    f_dst: jax.Array,  # [N_pad, H] receiver logit component
    whf: jax.Array,  # [N_pad, H*F] projected features, head-major blocks
    a_src: jax.Array,  # [H, F] sender halves of the attention vectors
    part: EdgePartition,
    mesh: Mesh,
    *,
    alpha: float,
    att_keep: jax.Array | None = None,  # [D, D, E_blk, H] keep/(1-p) or None
    halo: bool = False,  # direct halo exchange instead of full rotation
) -> jax.Array:
    """[N_pad, H*F] — identical math to the single-chip sparse v1 attention
    but executed SPMD over the 'data' axis with a ppermute ring.

    The sender logit component is derived per hop from the gathered
    feature block (``l_src = <w_g, a_src>``, the single-chip trick) so only
    ONE buffer rotates and logits + messages share a single sender
    reduction in the backward. Softmax stabilization uses the monotone
    receiver bound ``leaky(f_dst + max_j f_src)`` (cross-shard ``pmax``,
    exact shift — see models/layers.py), so hops accumulate additively.

    ``att_keep`` applies reference-style attention dropout to the
    aggregation numerator only (pre-dropout denominator, reference
    layers.py:150-160), indexed in partition layout.
    """
    d = part.n_shards
    if mesh.shape[DATA_AXIS] != d:
        raise ValueError(
            f"partition built for {d} shards, mesh data axis is "
            f"{mesh.shape[DATA_AXIS]}"
        )
    h = f_dst.shape[1]
    hf = whf.shape[1]
    f = hf // h
    use_stream = _part_use_stream(part)
    use_fused = _part_use_fused(part)
    use_halo = bool(halo) and part.has_halo and d > 1
    if att_keep is None:
        att_keep = jnp.ones(tuple(part.edge_mask.shape) + (1,), jnp.float32)
    loc_a, chk_a, ss_a, sl2_a, sc_a = _dummy_stream_fields(part)
    hidx_a, hs_a, hsl_a, hloc_a, hck_a = _halo_fields(part)

    def body(fd, w, asrc, nm, rl, sl, em, loc, ct, ss, sloc, sck,
             hidx, hs, hsl, hloc, hck, keep):
        # per device: fd [n_local, H]; w [n_local, HF]; asrc [H, F];
        # nm [1, n_local]; rl/sl/em/loc [1, D, E]; ct [1, D, C];
        # ss/sloc [1, D, E2]; sck [1, D, C2]; hidx [1, D, Hmax] (SRC-
        # sharded); hs [1, D, E]; hsl/hloc [1, D, E2h]; hck [1, D, C2h];
        # keep [1, D, E, H or 1]
        me = lax.axis_index(DATA_AXIS)
        rl, sl, em, loc, ct = rl[0], sl[0], em[0], loc[0], ct[0]
        ss, sloc, sck, keep = ss[0], sloc[0], sck[0], keep[0]
        hidx, hs, hsl, hloc, hck = hidx[0], hs[0], hsl[0], hloc[0], hck[0]
        nm = nm[0]
        n_local = fd.shape[0]

        # receiver bound from the GLOBAL sender-component max (real rows):
        # exp(logit - bound) <= 1 (leaky_relu is monotone), exact softmax
        # shift -> no per-hop max, no rescaling. Stop-gradient BEFORE the
        # pmax (no differentiation rule, and the shift's true gradient is
        # exactly zero by softmax shift-invariance).
        f_src = (lax.stop_gradient(w).reshape(n_local, h, f)
                 * lax.stop_gradient(asrc)[None]).sum(-1)  # [n_local, H]
        m_loc = jnp.max(jnp.where(nm[:, None], f_src, -jnp.inf), axis=0)
        m_src = lax.pmax(m_loc, DATA_AXIS)
        m_src = jnp.where(jnp.isfinite(m_src), m_src, 0.0)
        bound = lax.stop_gradient(_leaky(fd + m_src[None, :], alpha))
        fdb = jnp.concatenate([fd, bound], axis=1)  # [n_local, 2H]

        def hop(acc, w_buf, k, senders, sview, n_rows):
            # contribution of ring hop ``k`` (sender shard (me - k) % d):
            # ``w_buf`` is the sender feature table (full rotated shard or
            # a halo buffer), ``senders``/``sview`` index ITS rows
            src_shard = (me - k) % d
            rl_k = jnp.take(rl, src_shard, axis=0)
            sl_k = jnp.take(senders, src_shard, axis=0)
            em_k = jnp.take(em, src_shard, axis=0)
            loc_k = jnp.take(loc, src_shard, axis=0)
            ct_k = jnp.take(ct, src_shard, axis=0)
            ss_k = jnp.take(sview[0], src_shard, axis=0)
            sloc_k = jnp.take(sview[1], src_shard, axis=0)
            sck_k = jnp.take(sview[2], src_shard, axis=0)
            keep_k = jnp.take(keep, src_shard, axis=0)  # [E, H or 1]

            if use_fused:
                # per-hop fused attention: the whole per-edge pipeline in
                # ONE Pallas call on this block (ops/fused_stream.py); the
                # bound-shifted hops accumulate (agg, den) additively
                from pygat_tpu.ops.fused_stream import (
                    fused_v1_attention_parts,
                )

                precision, interpret = _stream_args()
                keepq = jnp.broadcast_to(keep_k,
                                         (keep_k.shape[0], h))
                agg, dn = fused_v1_attention_parts(
                    fd, bound, w_buf, asrc, keepq, sl_k, rl_k, loc_k,
                    ct_k, ss_k, sloc_k, sck_k, alpha, precision, interpret,
                )
                return acc + jnp.concatenate([agg, dn], axis=1)
            w_g = block_take_senders(w_buf, sl_k, ss_k, sloc_k, sck_k,
                                     n_rows, use_stream)  # [E, HF]
            l_src = (w_g.reshape(-1, h, f) * asrc[None]).sum(-1)
            fb_e = block_take_receivers(fdb, rl_k, loc_k, ct_k,
                                        n_local, use_stream)  # [E, 2H]
            logits = _leaky(fb_e[:, :h] + l_src, alpha)
            num = jnp.where(em_k[:, None],
                            jnp.exp(logits - fb_e[:, h:]), 0.0)
            qnum = num * keep_k
            msgs = jnp.concatenate(
                [(w_g.reshape(-1, h, f)
                  * qnum[:, :, None]).reshape(-1, hf),
                 num],
                axis=1,
            )  # [E, HF + H]
            return acc + block_recv_reduce(msgs, rl_k, loc_k, ct_k,
                                           n_local, use_stream)

        full_view = (ss, sloc, sck)
        acc = hop(jnp.zeros((n_local, hf + h), jnp.float32), w,
                  jnp.asarray(0, jnp.int32), sl, full_view, n_local)
        if use_halo:
            # DIRECT exchange: hop k ppermutes ONLY the halo rows shard
            # (me+k) needs from me (shift-by-k perm, so the buffer never
            # relays through intermediates). Bytes/hop = Hmax/n_local of
            # the full rotation. Unrolled (each hop's perm is static);
            # program size is O(D) — the halo path is for large graphs on
            # modest rings, where the traffic dominates program size. On a
            # physical ring ICI a shift-by-k costs k link traversals, so
            # this wins when Hmax <~ 2 * n_local / D; 2D torus ICI cuts
            # the route length further.
            h_rows = hidx.shape[1]
            halo_view = (hsl, hloc, hck)
            for k in range(1, d):
                dstv = (me + jnp.asarray(k, jnp.int32)) % d
                rows = jnp.take(hidx, dstv, axis=0)  # [Hmax] my rows for dst
                buf = jnp.take(w, rows, axis=0)  # [Hmax, HF]
                buf = lax.ppermute(buf, DATA_AXIS,
                                   [(i, (i + k) % d) for i in range(d)])
                acc = hop(acc, buf, jnp.asarray(k, jnp.int32), hs,
                          halo_view, h_rows)
        elif d > 1:
            # full-shard rotation under lax.scan: d-1 ppermutes, TWO
            # traced copies of the hop program regardless of D
            perm = [(i, (i + 1) % d) for i in range(d)]

            def ring_step(carry, k):
                acc, w_buf = carry
                w_buf = lax.ppermute(w_buf, DATA_AXIS, perm)
                return (hop(acc, w_buf, k, sl, full_view, n_local),
                        w_buf), None

            (acc, _), _ = lax.scan(ring_step, (acc, w),
                                   jnp.arange(1, d, dtype=jnp.int32))

        out = softmax_div(acc[:, :hf].reshape(n_local, h, f), acc[:, hf:])
        return out.reshape(n_local, hf)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None),  # f_dst by node shard
            P(DATA_AXIS, None),  # whf by node shard
            P(),  # a_src replicated
            P(DATA_AXIS, None),  # node_mask by shard
            P(DATA_AXIS, None, None),  # recv_local by dest shard
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),  # local
            P(DATA_AXIS, None, None),  # chunk
            P(DATA_AXIS, None, None),  # s_slot
            P(DATA_AXIS, None, None),  # s_local
            P(DATA_AXIS, None, None),  # s_chunk
            P(DATA_AXIS, None, None),  # halo_idx by SOURCE shard
            P(DATA_AXIS, None, None),  # h_send by dest shard
            P(DATA_AXIS, None, None),  # h_slot
            P(DATA_AXIS, None, None),  # h_local
            P(DATA_AXIS, None, None),  # h_chunk
            P(DATA_AXIS, None, None, None),  # att_keep by dest shard
        ),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,  # pallas_call has no vma rule yet; values are
        # replicated over 'model' by construction (all inputs unvarying
        # there and the ring only communicates over 'data')
    )(f_dst, whf, a_src, part.node_mask, part.recv_local, part.send_local,
      part.edge_mask, loc_a, chk_a, ss_a, sl2_a, sc_a,
      hidx_a, hs_a, hsl_a, hloc_a, hck_a, att_keep)


def ring_gat_attention_v2(
    whi_f: jax.Array,  # [N_pad, H*F] left projection (receiver logits + messages)
    whj_f: jax.Array,  # [N_pad, H*F] right projection (sender logits)
    a: jax.Array,  # [H, F] attention vectors
    part: EdgePartition,
    mesh: Mesh,
    *,
    alpha: float,
    att_keep: jax.Array | None = None,  # [D, D, E_blk, H] keep/(1-p) or None
    halo: bool = False,  # direct halo exchange instead of full rotation
) -> jax.Array:
    """GATv2 ring attention: per-edge ``a . leaky(whi[recv] + whj[send])``
    logits (reference layers.py:280-283) with aggregation of ``whi`` rows
    gathered at SENDERS (layers.py:296) — both the sender-logit operand
    (whj) and the message operand (whi) rotate around the ring.

    Stabilized by the v2 sign-split monotone bound (see
    models/layers.gat_v2_sparse_heads): ``ub`` needs one cross-shard
    pmax/pmin of whj per (head, feature), then hops accumulate additively
    through per-shard stream reductions — no scatter, no rescaling.
    """
    d = part.n_shards
    if mesh.shape[DATA_AXIS] != d:
        raise ValueError(
            f"partition built for {d} shards, mesh data axis is "
            f"{mesh.shape[DATA_AXIS]}"
        )
    h, f = a.shape
    hf = h * f
    use_stream = _part_use_stream(part)
    use_fused = _part_use_fused(part)
    use_halo = bool(halo) and part.has_halo and d > 1
    if att_keep is None:
        att_keep = jnp.ones(tuple(part.edge_mask.shape) + (1,), jnp.float32)
    loc_a, chk_a, ss_a, sl2_a, sc_a = _dummy_stream_fields(part)
    hidx_a, hs_a, hsl_a, hloc_a, hck_a = _halo_fields(part)

    def body(wi, wj, av, nm, rl, sl, em, loc, ct, ss, sloc, sck,
             hidx, hs, hsl, hloc, hck, keep):
        # per device: wi/wj [n_local, HF]; av [H, F]; nm [1, n_local]
        me = lax.axis_index(DATA_AXIS)
        rl, sl, em, loc, ct = rl[0], sl[0], em[0], loc[0], ct[0]
        ss, sloc, sck, keep = ss[0], sloc[0], sck[0], keep[0]
        hidx, hs, hsl, hloc, hck = hidx[0], hs[0], hsl[0], hloc[0], hck[0]
        nm = nm[0]
        n_local = wi.shape[0]

        # v2 bound (models/layers.py gat_v2_sparse_heads): per (h, f) the
        # sender term is bounded by the global max (a >= 0) / min (a < 0)
        # of whj over real nodes; leaky_relu is monotone increasing
        wj_m = lax.stop_gradient(wj)
        big = jnp.asarray(jnp.inf, wj_m.dtype)
        Mq = jnp.max(jnp.where(nm[:, None], wj_m, -big), axis=0)  # [HF]
        mq = jnp.min(jnp.where(nm[:, None], wj_m, big), axis=0)
        Mq = lax.pmax(Mq, DATA_AXIS)
        mq = lax.pmin(mq, DATA_AXIS)
        Mq = jnp.where(jnp.isfinite(Mq), Mq, 0.0).reshape(h, f)
        mq = jnp.where(jnp.isfinite(mq), mq, 0.0).reshape(h, f)
        wi3 = lax.stop_gradient(wi).reshape(n_local, h, f)
        a_pos = jnp.maximum(av, 0.0)
        a_neg = jnp.minimum(av, 0.0)
        ub = (_leaky(wi3 + Mq[None], alpha) * a_pos[None]).sum(-1)
        ub = ub + (_leaky(wi3 + mq[None], alpha) * a_neg[None]).sum(-1)
        ub = lax.stop_gradient(ub)  # [n_local, H]

        def hop(acc, wi_buf, wj_buf, k, senders, sview, n_rows):
            # contribution of ring hop ``k`` (sender shard (me - k) % d);
            # wi_buf/wj_buf are sender tables (full shards or halo buffers)
            src_shard = (me - k) % d
            rl_k = jnp.take(rl, src_shard, axis=0)
            sl_k = jnp.take(senders, src_shard, axis=0)
            em_k = jnp.take(em, src_shard, axis=0)
            loc_k = jnp.take(loc, src_shard, axis=0)
            ct_k = jnp.take(ct, src_shard, axis=0)
            ss_k = jnp.take(sview[0], src_shard, axis=0)
            sloc_k = jnp.take(sview[1], src_shard, axis=0)
            sck_k = jnp.take(sview[2], src_shard, axis=0)
            keep_k = jnp.take(keep, src_shard, axis=0)

            if use_fused:
                # per-hop fused v2 kernel (split operands: local wi/ub,
                # rotated wi/wj buffers — ops/fused_stream.py)
                from pygat_tpu.ops.fused_stream import (
                    fused_v2_attention_parts,
                )

                precision, interpret = _stream_args()
                keepq = jnp.broadcast_to(keep_k, (keep_k.shape[0], h))
                agg, dn = fused_v2_attention_parts(
                    wi, ub, wi_buf, wj_buf, av, keepq, sl_k, rl_k, loc_k,
                    ct_k, ss_k, sloc_k, sck_k, alpha, precision, interpret,
                )
                return acc + jnp.concatenate([agg, dn], axis=1)
            wj_g = block_take_senders(wj_buf, sl_k, ss_k, sloc_k, sck_k,
                                      n_rows, use_stream)  # [E, HF]
            wiub_e = block_take_receivers(
                jnp.concatenate([wi, ub], axis=1), rl_k, loc_k, ct_k,
                n_local, use_stream)  # [E, HF + H]
            pre = _leaky(wiub_e[:, :hf] + wj_g, alpha)  # [E, HF]
            logits = (pre.reshape(-1, h, f) * av[None]).sum(-1)  # [E, H]
            num = jnp.where(em_k[:, None],
                            jnp.exp(logits - wiub_e[:, hf:]), 0.0)
            qnum = num * keep_k
            wi_g = block_take_senders(wi_buf, sl_k, ss_k, sloc_k, sck_k,
                                      n_rows, use_stream)  # [E, HF]
            msgs = jnp.concatenate(
                [(wi_g.reshape(-1, h, f)
                  * qnum[:, :, None]).reshape(-1, hf),
                 num],
                axis=1,
            )
            return acc + block_recv_reduce(msgs, rl_k, loc_k, ct_k,
                                           n_local, use_stream)

        full_view = (ss, sloc, sck)
        acc = hop(jnp.zeros((n_local, hf + h), jnp.float32), wi, wj,
                  jnp.asarray(0, jnp.int32), sl, full_view, n_local)
        if use_halo:
            # direct halo exchange (see ring_gat_attention): BOTH v2
            # operands travel as one 2HF-lane halo buffer per hop
            h_rows = hidx.shape[1]
            halo_view = (hsl, hloc, hck)
            wiwj = jnp.concatenate([wi, wj], axis=1)  # [n_local, 2HF]
            for k in range(1, d):
                dstv = (me + jnp.asarray(k, jnp.int32)) % d
                rows = jnp.take(hidx, dstv, axis=0)
                buf = jnp.take(wiwj, rows, axis=0)  # [Hmax, 2HF]
                buf = lax.ppermute(buf, DATA_AXIS,
                                   [(i, (i + k) % d) for i in range(d)])
                acc = hop(acc, buf[:, :hf], buf[:, hf:],
                          jnp.asarray(k, jnp.int32), hs, halo_view, h_rows)
        elif d > 1:
            # full rotation under lax.scan — see ring_gat_attention
            perm = [(i, (i + 1) % d) for i in range(d)]

            def ring_step(carry, k):
                acc, wi_buf, wj_buf = carry
                wi_buf = lax.ppermute(wi_buf, DATA_AXIS, perm)
                wj_buf = lax.ppermute(wj_buf, DATA_AXIS, perm)
                return (hop(acc, wi_buf, wj_buf, k, sl, full_view,
                            n_local), wi_buf, wj_buf), None

            (acc, _, _), _ = lax.scan(ring_step, (acc, wi, wj),
                                      jnp.arange(1, d, dtype=jnp.int32))

        out = softmax_div(acc[:, :hf].reshape(n_local, h, f), acc[:, hf:])
        return out.reshape(n_local, hf)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None),  # whi by node shard
            P(DATA_AXIS, None),  # whj by node shard
            P(),  # attention vectors replicated
            P(DATA_AXIS, None),  # node_mask
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None, None),  # halo_idx by SOURCE shard
            P(DATA_AXIS, None, None),  # h_send by dest shard
            P(DATA_AXIS, None, None),  # h_slot
            P(DATA_AXIS, None, None),  # h_local
            P(DATA_AXIS, None, None),  # h_chunk
            P(DATA_AXIS, None, None, None),  # att_keep by dest shard
        ),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,  # see ring_gat_attention
    )(whi_f, whj_f, a, part.node_mask, part.recv_local, part.send_local,
      part.edge_mask, loc_a, chk_a, ss_a, sl2_a, sc_a,
      hidx_a, hs_a, hsl_a, hloc_a, hck_a, att_keep)
