"""Banded window gather: large-N sender windows at MXU speed.

The fused attention kernels (ops/fused_stream.py) are gather-free INSIDE
the kernel, but their [E, HF] sender windows come from ``jnp.take(wh,
senders)`` — and XLA serializes that row gather (~11.5 ns/row) once the
node table exceeds VMEM-resident reuse, collapsing the fused path from
0.21 to 0.08 of the HBM roofline past ~300k nodes (RESULTS.md large-graph
table). The corner-turn alternative (ops/fused_corner.py) measured WORSE
(one-hot selects over wide windows plus multi-pass HBM sweeps).

This module removes the serialized gather with two observations:

1. **The stream scatter does not care about edge order within a chunk.**
   The one-hot ``oh[128, EC]`` built from chunk-local receiver rows is
   order-free, so edges inside each 128-row receiver tile can be re-sorted
   BY SENDER. After that sort, each 256-edge chunk's senders form an
   ascending run — on an RCM/locality-ordered graph they span only a few
   consecutive 128-row tiles of the ``wh`` table.

2. **Pallas block index maps can follow a per-chunk scalar.** Each chunk
   carries a window base tile ``band[c]``; the kernel's ``w`` table inputs
   use ``BlockSpec((128, L), lambda i, b: (b[i] + j, 0))`` — the pipeline
   DMAs exactly the tiles the chunk needs, double-buffers them against
   compute, and skips the copy entirely when consecutive chunks share a
   tile (the common case: bands advance monotonically within each receiver
   tile's sweep).

Row selection from the [w*128, L] VMEM window is a one-hot MXU matmul —
the only select primitive Mosaic lowers on this libtpu (in-kernel
``take_along_axis`` over >8 rows does not compile: "Multiple source vregs
along gather dimension", see CLAUDE.md). Unlike the corner path's measured
39 ns/row, the window here is narrow (w*128 lanes, w<=4 by default) and
there is exactly ONE pass, so the select costs ~w*128*L*2/peak FLOPs per
edge (~0.7 ns/edge at w=4, L=128, bf16).

Chunks are built greedily: walk each receiver tile's sender-sorted edges,
cut a new chunk whenever the window would overflow OR EC edges are
reached. There are NO overflow edges by construction — poor locality only
costs extra (partially filled) chunks, reported as ``fill`` so ``auto``
heuristics can refuse pathological graphs.

Replaces the XLA gather feeding the reference's SpecialSpmm pipeline
(reference layers.py:141-160) at scales where the reference's dense
representation cannot exist at all.
"""

from __future__ import annotations

from dataclasses import dataclass as _dataclass
from functools import lru_cache as _lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygat_tpu.ops.stream import DEAD, EC, MXU_PREC, TILE


class _HostArr:
    """Identity-hashed wrapper so a host numpy array can ride in pytree
    aux_data (jit cache keys need hashable aux; plans are built once per
    graph, so identity semantics are exactly right)."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a

    def __hash__(self):
        return id(self.a)

    def __eq__(self, other):
        return isinstance(other, _HostArr) and other.a is self.a


@jax.tree_util.register_pytree_node_class
@_dataclass(frozen=True)
class BandPlan:
    """Banded edge order + per-chunk window bases (host-built, static).

    The banded order is receiver-TILE-major, sender-sorted within each
    tile; every EC-chunk writes one 128-row output tile (``r_chunk``)
    and reads sender rows only from tiles ``band[c] .. band[c]+w-1``.

    Registered as a pytree whose STATIC fields (``w``, ``fill``, ``perm``)
    are aux_data: a BandPlan can be passed straight through jit/scan
    without its window width becoming a tracer.
    """

    w: int  # window width in 128-row tiles (static)
    band: jax.Array  # [C] int32 window base tile per chunk
    s_loc: jax.Array  # [E_b] int32 sender row within window (w*128 = dead)
    r_local: jax.Array  # [E_b] int32 receiver row within tile (DEAD = dead)
    r_chunk: jax.Array  # [C] int32 output tile per chunk (non-decreasing)
    senders: jax.Array  # [E_b] int32 (dummy on dead slots)
    receivers: jax.Array  # [E_b] int32 (tile-local dummy row on dead slots)
    edge_weight: jax.Array  # [E_b] f32 (0 on dead slots)
    # CSC stream over the banded order (sender-sorted), for the backward's
    # per-sender reduction: c_slot maps CSC stream position -> banded slot.
    c_slot: jax.Array  # [E_s2] int32
    c_local: jax.Array  # [E_s2] int32
    c_chunk: jax.Array  # [E_s2 / EC] int32
    # Band-sorted chunk schedule for the GATHER-FREE sender reduction
    # (_banded_sender_sum_direct): chunks reordered so window bases are
    # non-decreasing — w per-window-tile output arrays then advance
    # monotonically and per-chunk sender partials accumulate in VMEM.
    # bs_band covers EVERY base in [0, n_tiles - w] (dead filler chunks
    # guarantee each output block is visited/zeroed at least once).
    bs_band: jax.Array  # [C2] int32, non-decreasing window base
    bs_chunk: jax.Array  # [C2] int32 source banded chunk (0 on dead)
    bs_sloc: jax.Array  # [C2/8, 8, EC] int32 s_loc in bs order (dead=w*128)
    fill: float  # real edges / (C * EC) — chunk-packing efficiency
    perm: np.ndarray  # [E_b] int64 HOST array: original edge index (-1 dead)

    _ARRAYS = ("band", "s_loc", "r_local", "r_chunk", "senders",
               "receivers", "edge_weight", "c_slot", "c_local", "c_chunk",
               "bs_band", "bs_chunk", "bs_sloc")

    def tree_flatten(self):
        return (tuple(getattr(self, f) for f in self._ARRAYS),
                (self.w, self.fill, _HostArr(self.perm)))

    @classmethod
    def tree_unflatten(cls, aux, children):
        w, fill, perm = aux
        return cls(w, *children, fill=fill, perm=perm.a)

    @property
    def num_slots(self) -> int:
        return self.s_loc.shape[0]

    @property
    def num_chunks(self) -> int:
        return self.band.shape[0]


def build_band_plan(graph, w: int = 4) -> BandPlan:
    """Host-side plan: re-sort each receiver tile's edges by sender and cut
    window-bounded EC-chunks. ``w`` is the VMEM window in 128-row tiles."""
    from pygat_tpu.graph import host_edges
    from pygat_tpu.ops.stream import build_stream_layout

    host = host_edges(graph)
    if host is None:
        # one BATCHED readback (the axon tunnel moves bulk data slowly;
        # per-array np.asarray costs a round trip each)
        host = jax.device_get((graph.senders, graph.receivers,
                               graph.edge_weight, graph.edge_mask))
    senders = np.asarray(host[0], dtype=np.int64)
    receivers = np.asarray(host[1], dtype=np.int64)
    weights = np.asarray(host[2], dtype=np.float32)
    mask = np.asarray(host[3])
    n_pad = graph.num_nodes_padded
    if n_pad % TILE:
        raise ValueError(f"n_pad={n_pad} must be 128-aligned")
    n_tiles = n_pad // TILE
    w = min(int(w), n_tiles)
    if w < 1:
        raise ValueError("window must be >= 1 tile")

    eidx = np.nonzero(mask)[0]
    s, r = senders[eidx], receivers[eidx]
    rt = r // TILE
    order = np.lexsort((r, s, rt))
    s, r, rt, eidx = s[order], r[order], rt[order], eidx[order]

    tile_lo = np.searchsorted(rt, np.arange(n_tiles))
    tile_hi = np.searchsorted(rt, np.arange(n_tiles), side="right")

    # Greedy chunk cuts per tile. The inner loop advances by >= 1 edge or
    # terminates, and each iteration is O(log) via searchsorted.
    ch_tile: list[int] = []
    ch_base: list[int] = []
    ch_lo: list[int] = []
    ch_hi: list[int] = []
    base_cap = n_tiles - w
    for t in range(n_tiles):
        i, hi = int(tile_lo[t]), int(tile_hi[t])
        if i == hi:
            # empty tile still needs one (all-dead) chunk so the kernel
            # zero-initializes its output block (stream-layout contract)
            ch_tile.append(t)
            ch_base.append(min(t, base_cap))
            ch_lo.append(i)
            ch_hi.append(i)
            continue
        st = s[i:hi]
        while i < hi:
            k = i - int(tile_lo[t])
            base = min(int(st[k]) >> 7, base_cap)
            limit = (base + w) * TILE
            j = min(i + EC, int(tile_lo[t]) + int(np.searchsorted(st, limit)))
            ch_tile.append(t)
            ch_base.append(base)
            ch_lo.append(i)
            ch_hi.append(j)
            i = j

    # pad chunk count to a multiple of 8 (the (8, EC) local packing) with
    # trailing all-dead chunks on the LAST tile (keeps r_chunk sorted and
    # the revisit-consecutive contract intact)
    c_real = len(ch_tile)
    c = -(-c_real // 8) * 8
    for _ in range(c - c_real):
        ch_tile.append(n_tiles - 1)
        ch_base.append(base_cap)
        ch_lo.append(len(eidx))
        ch_hi.append(len(eidx))

    tile_a = np.asarray(ch_tile, np.int64)
    base_a = np.asarray(ch_base, np.int64)
    lo_a = np.asarray(ch_lo, np.int64)
    hi_a = np.asarray(ch_hi, np.int64)
    lens = hi_a - lo_a
    e_b = c * EC

    # scatter the sorted real edges into their banded slots
    pos_in_chunk = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    slot_pos = np.repeat(np.arange(c, dtype=np.int64) * EC, lens) + pos_in_chunk

    dummy = n_pad - 1
    s_loc = np.full(e_b, w * TILE, np.int32)
    r_local = np.full(e_b, DEAD, np.int32)
    senders_b = np.full(e_b, dummy, np.int32)
    receivers_b = (np.repeat(tile_a, EC) * TILE + TILE - 1).astype(np.int32)
    weight_b = np.zeros(e_b, np.float32)
    perm = np.full(e_b, -1, np.int64)

    src = np.arange(len(eidx), dtype=np.int64)  # already (tile, sender)-sorted
    s_loc[slot_pos] = (s[src] - np.repeat(base_a, lens) * TILE).astype(np.int32)
    r_local[slot_pos] = (r[src] - np.repeat(tile_a, lens) * TILE).astype(np.int32)
    senders_b[slot_pos] = s[src].astype(np.int32)
    receivers_b[slot_pos] = r[src].astype(np.int32)
    weight_b[slot_pos] = weights[eidx]
    perm[slot_pos] = eidx

    assert (s_loc[slot_pos] >= 0).all() and (s_loc[slot_pos] < w * TILE).all()

    # CSC stream over the banded order (for the backward sender reduction)
    ptr = np.zeros(n_pad + 1, np.int64)
    np.cumsum(np.bincount(senders_b, minlength=n_pad), out=ptr[1:])
    c_lay = build_stream_layout(
        ptr, order=np.lexsort((receivers_b, senders_b)))

    # band-sorted chunk schedule (gather-free sender reduction): insert a
    # dead filler chunk for every uncovered base so the sorted bases cover
    # [0, base_cap] without gaps, sort stably by base, pad to %8
    covered = np.zeros(base_cap + 1, bool)
    covered[base_a] = True
    missing = np.nonzero(~covered)[0]
    ent_band = np.concatenate([base_a, missing])
    ent_chunk = np.concatenate(
        [np.arange(c, dtype=np.int64), np.zeros(len(missing), np.int64)])
    ent_dead = np.concatenate([np.zeros(c, bool), np.ones(len(missing), bool)])
    o2 = np.argsort(ent_band, kind="stable")
    ent_band, ent_chunk, ent_dead = ent_band[o2], ent_chunk[o2], ent_dead[o2]
    pad2 = (-len(ent_band)) % 8
    ent_band = np.concatenate([ent_band, np.full(pad2, base_cap, np.int64)])
    ent_chunk = np.concatenate([ent_chunk, np.zeros(pad2, np.int64)])
    ent_dead = np.concatenate([ent_dead, np.ones(pad2, bool)])
    c2 = len(ent_band)
    sloc2 = s_loc.reshape(c, EC)[ent_chunk].copy()
    sloc2[ent_dead] = w * TILE  # filler chunks select nothing

    return BandPlan(
        w=w,
        band=jnp.asarray(base_a.astype(np.int32)),
        s_loc=jnp.asarray(s_loc),
        r_local=jnp.asarray(r_local),
        r_chunk=jnp.asarray(tile_a.astype(np.int32)),
        senders=jnp.asarray(senders_b),
        receivers=jnp.asarray(receivers_b),
        edge_weight=jnp.asarray(weight_b),
        c_slot=jnp.asarray(np.maximum(c_lay.slot, 0).astype(np.int32)),
        c_local=jnp.asarray(c_lay.local),
        c_chunk=jnp.asarray(c_lay.chunk_tile),
        bs_band=jnp.asarray(ent_band.astype(np.int32)),
        bs_chunk=jnp.asarray(ent_chunk.astype(np.int32)),
        bs_sloc=jnp.asarray(sloc2.reshape(c2 // 8, 8, EC)),
        fill=float(len(eidx)) / float(e_b),
        perm=perm,
    )


# ---------------------------------------------------------------------------
# The window-gather kernel
# ---------------------------------------------------------------------------


def _window_select(sloc, tabs, prep, prec, scale=None):
    """``sum_j onehot_j(sloc) @ tabs[j]`` — the banded row select as w
    PER-TILE one-hot matmuls. Versus one [EC, w*128] one-hot against a
    concatenated [w*128, L] window, this skips both the wide iota/compare
    (w x fewer compared lanes) and the window concat copy; each row is
    selected by exactly ONE term, so the sum is still a pure select.
    ``scale`` (optional [EC]) folds per-edge weights into the one-hot.
    Dead slots (sloc == w*TILE) match no term."""
    ec = sloc.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ec, TILE), 1)
    g = None
    for j, t in enumerate(tabs):
        ohj = (sloc[:, None] == rows + j * TILE).astype(jnp.float32)
        if scale is not None:
            ohj = ohj * scale[:, None]
        term = jnp.dot(prep(ohj), t[...],
                       preferred_element_type=jnp.float32, precision=prec)
        g = term if g is None else g + term
    return g


def _make_banded_kernel(w: int, exact: bool, out_dtype):
    def kernel(*refs):
        # (band, sloc, table x w, out) — band is consumed by the index maps
        sloc_ref = refs[1]
        tabs = refs[2:2 + w]
        out_ref = refs[2 + w]
        i = pl.program_id(0)
        loc = sloc_ref[0, i % 8, :]  # [EC]; w*TILE = dead slot
        if exact:
            # f32 values: the select must run exact f32 passes — Mosaic's
            # DEFAULT on f32 operands is ONE lossy bf16 pass (CLAUDE.md)
            out_ref[0] = _window_select(
                loc, tabs, lambda x: x, jax.lax.Precision.HIGHEST)
        else:
            # Mosaic requires a 32-bit matmul accumulator; the one-hot
            # select is a single term per output so the f32->bf16 store
            # cast is exact for bf16 window values
            acc = _window_select(loc, tabs,
                                 lambda x: x.astype(jnp.bfloat16), MXU_PREC)
            out_ref[0] = acc.astype(out_dtype)

    return kernel


def _banded_take_impl(table: jax.Array, band: jax.Array, s_loc: jax.Array,
                      w: int, *, exact: bool, interpret: bool) -> jax.Array:
    """``table`` rows selected per banded slot, [E_b, L]; zeros at dead
    slots. ``exact=True`` keeps f32 values bit-exact (HIGHEST select);
    otherwise table values round to bf16 (one DEFAULT-precision pass)."""
    n_pad, l_real = table.shape
    c = band.shape[0]
    l_pad = -(-l_real // 128) * 128
    x = table
    if l_pad != l_real:
        x = jnp.pad(x, ((0, 0), (0, l_pad - l_real)))
    out_dtype = jnp.float32 if exact else jnp.bfloat16
    x = x.astype(jnp.float32 if exact else jnp.bfloat16)
    sloc8 = s_loc.reshape(c // 8, 8, EC)

    def _tab_spec(j):
        return pl.BlockSpec((TILE, l_pad), lambda i, b, _j=j: (b[i] + _j, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[pl.BlockSpec((1, 8, EC), lambda i, b: (i // 8, 0, 0))]
        + [_tab_spec(j) for j in range(w)],
        out_specs=pl.BlockSpec((1, EC, l_pad), lambda i, b: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_banded_kernel(w, exact, out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, EC, l_pad), out_dtype),
        interpret=interpret,
    )(band, sloc8, *([x] * w))
    out = out.reshape(c * EC, l_pad)
    return out[:, :l_real] if l_pad != l_real else out


def banded_take(table: jax.Array, plan: BandPlan, *,
                exact: bool, interpret: bool) -> jax.Array:
    """``table[senders]`` in banded order (see :func:`_banded_take_impl`).
    NOT differentiable — the fused ops below wrap it in custom VJPs."""
    return _banded_take_impl(table, plan.band, plan.s_loc, plan.w,
                             exact=exact, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused banded attention (v1/v2): the fused_stream kernels fed by banded
# windows instead of jnp.take — no serialized row gather in the forward.
# Structure mirrors ops/fused_corner.py (flat-array custom_vjp ops cached
# on the static config; the BandPlan's static fields never enter the jit).
# Reference math: layers.py:141-160 (v1) / 278-296 (v2).
# ---------------------------------------------------------------------------


def _banded_expand(x, r_local, r_chunk, interpret: bool):
    """Receiver-side operands in banded order: x[receivers_b] without a row
    gather (each banded chunk reads ONE output tile; selection by r_local)."""
    from pygat_tpu.ops.large import _expand_impl

    return _expand_impl(x, r_local, r_chunk, interpret)


def _banded_sender_sum(data, c_slot, c_local, c_chunk, n_pad: int,
                       precision: str, interpret: bool):
    """Per-sender segment sum of banded-order edge data via the plan's CSC
    stream. The leading ``take(data, c_slot)`` is a serialized XLA row
    gather (~11.5 ns/row) — ~100 ms alone at 524k/deg16 — kept only as
    the fallback for :func:`_banded_sender_sum_direct`."""
    from pygat_tpu.ops.stream import stream_scatter

    streamed = jnp.take(data, c_slot, axis=0)
    return stream_scatter(streamed, c_local, c_chunk, n_pad,
                          precision=precision, interpret=interpret)


def _make_sender_sum_kernel(w: int, exact: bool, interpret: bool):
    """Per-chunk sender partials, gather-free: ohT[w*128, EC] (from the
    chunk's s_loc) times the [EC, L] edge-data block scatters every edge's
    row onto its sender row within the chunk's w-tile window; the w
    128-row slices accumulate into w band-indexed output arrays. Chunks
    arrive band-SORTED (plan.bs_*), so each output's block index is
    non-decreasing and VMEM accumulation is valid."""
    from pygat_tpu.ops.fused_stream import _rounder, _split_hi

    def kernel(*refs):
        (bb_ref, bc_ref, sloc_ref, data_ref) = refs[:4]
        outs = refs[4:4 + w]
        i = pl.program_id(0)
        b = bb_ref[i]
        first = jnp.logical_or(i == 0, bb_ref[jnp.maximum(i - 1, 0)] != b)

        @pl.when(first)
        def _():
            for o in outs:
                o[:] = jnp.zeros_like(o)

        vr = _rounder(False, interpret)
        sloc = sloc_ref[0, i % 8, :]  # [EC]; w*TILE = dead (zero column)
        d = data_ref[0]  # [EC, L] f32
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, EC), 0)
        if exact:
            # two-limb pass (stream 'high' semantics): hi limb is
            # bf16-exact, the residual carries the low mantissa bits
            hi = _split_hi(d)
            lo = d - hi
        for j, o in enumerate(outs):
            # per-tile transpose one-hot: scatters the chunk's edges whose
            # sender sits in window tile j (w x fewer compared lanes than
            # one [w*128, EC] one-hot)
            ohTj = (rows + j * TILE == sloc[None, :]).astype(jnp.float32)
            if exact:
                pj = jnp.dot(vr(ohTj), vr(hi),
                             preferred_element_type=jnp.float32,
                             precision=MXU_PREC)
                pj = pj + jnp.dot(vr(ohTj), vr(lo),
                                  preferred_element_type=jnp.float32,
                                  precision=MXU_PREC)
            else:
                pj = jnp.dot(vr(ohTj), vr(d),
                             preferred_element_type=jnp.float32,
                             precision=MXU_PREC)
            o[:] += pj

    return kernel


def _banded_sender_sum_direct(data, bs_band, bs_chunk, bs_sloc, w: int,
                              n_pad: int, precision: str, interpret: bool):
    """Gather-free per-sender segment sum of banded-order edge data.

    Replaces ``take(data, c_slot)`` + stream scatter with ONE kernel pass:
    edge-data CHUNKS are block-fetched in band-sorted order via a
    scalar-prefetch index map (block-granular indirection — no row
    gather), per-chunk partials land on the chunk's w-tile window, and w
    output arrays (one per window offset) accumulate monotonically. The
    final fold sums the w arrays with the never-visited edge tiles
    zeroed. Measured r5 at 262k/deg16: fused-v1 fwd+bwd 155 -> ~55 ms
    (the c_slot gather was ~2/3 of the whole backward)."""
    e_b, l_real = data.shape
    c = e_b // EC
    c2 = bs_band.shape[0]
    n_tiles = n_pad // TILE
    base_cap = n_tiles - w
    l_pad = -(-l_real // 128) * 128
    d = data
    if l_pad != l_real:
        d = jnp.pad(d, ((0, 0), (0, l_pad - l_real)))
    d = d.astype(jnp.float32).reshape(c, EC, l_pad)
    exact = precision != "fastest"

    def _out_spec(j):
        return pl.BlockSpec((TILE, l_pad),
                            lambda i, bb, bc, _j=j: (bb[i] + _j, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c2,),
        in_specs=[
            pl.BlockSpec((1, 8, EC), lambda i, bb, bc: (i // 8, 0, 0)),
            pl.BlockSpec((1, EC, l_pad), lambda i, bb, bc: (bc[i], 0, 0)),
        ],
        out_specs=[_out_spec(j) for j in range(w)],
    )
    outs = pl.pallas_call(
        _make_sender_sum_kernel(w, exact, interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, l_pad), jnp.float32)
                   for _ in range(w)],
        interpret=interpret,
    )(bs_band, bs_chunk, bs_sloc, d)

    total = None
    for j, o in enumerate(outs):
        # output j only visits tiles j .. base_cap + j; rows outside carry
        # whatever the kernel never touched
        if j > 0:
            o = o.at[:j * TILE].set(0.0)
        hi = (base_cap + j + 1) * TILE
        if hi < n_pad:
            o = o.at[hi:].set(0.0)
        total = o if total is None else total + o
    return total[:, :l_real] if l_pad != l_real else total


@_lru_cache(maxsize=None)
def _v1_banded_op(w: int, alpha: float, precision: str, interpret: bool):
    """custom_vjp fused-v1 attention over flat band-plan arrays.
    Signature: op(wh, f_dst, bound, a_src, keepq, band, s_loc, r_local,
    r_chunk, c_slot, c_local, c_chunk) -> (out [N, HF], den [N, H])."""
    from pygat_tpu.ops.fused_stream import (
        _block_diag_a,
        _const_spec,
        _expand_bd,
        _grid_call,
        _leaky,
        _make_v1_kernel,
        _tile_spec,
        _win_dtype,
        _window_spec,
    )
    from pygat_tpu.ops.stream import stream_scatter

    exact = precision != "fastest"

    def _fwd_impl(wh, f_dst, bound, a_src, keepq, band, s_loc, r_local,
                  r_chunk):
        n_pad, hf = wh.shape
        h, f = a_src.shape
        e = s_loc.shape[0]
        c = e // EC
        wdt = _win_dtype(precision)
        fdb = jnp.concatenate([f_dst, bound], axis=1)  # [N, 2H]
        abd = _block_diag_a(a_src.astype(wdt))
        exp_bd = _expand_bd(h, f)
        return _banded_grid_call(
            _make_v1_banded_kernel(alpha, h, hf, w, exact, interpret),
            band, r_chunk,
            s_loc.reshape(c // 8, 8, EC), r_local.reshape(c // 8, 8, EC),
            keepq.reshape(c, EC, h), wh.astype(wdt), w, fdb,
            n_pad, hf, h, interpret, [abd, exp_bd],
        )

    @jax.custom_vjp
    def op(wh, f_dst, bound, a_src, keepq, band, s_loc, r_local, r_chunk,
           c_slot, c_local, c_chunk, bs_band, bs_chunk, bs_sloc):
        return _fwd_impl(wh, f_dst, bound, a_src, keepq, band, s_loc,
                         r_local, r_chunk)

    def fwd(wh, f_dst, bound, a_src, keepq, band, s_loc, r_local, r_chunk,
            c_slot, c_local, c_chunk, bs_band, bs_chunk, bs_sloc):
        out = _fwd_impl(wh, f_dst, bound, a_src, keepq, band, s_loc,
                        r_local, r_chunk)
        return out, (wh, f_dst, bound, a_src, keepq, band, s_loc, r_local,
                     r_chunk, c_slot, c_local, c_chunk, bs_band, bs_chunk,
                     bs_sloc)

    def bwd(res, cts):
        (wh, f_dst, bound, a_src, keepq, band, s_loc, r_local, r_chunk,
         c_slot, c_local, c_chunk, bs_band, bs_chunk, bs_sloc) = res
        g_out, g_den = cts
        n_pad, hf = wh.shape
        h, f = a_src.shape
        prec = "high" if exact else "fastest"

        g_w = _banded_take_impl(wh, band, s_loc, w, exact=exact,
                                interpret=interpret).astype(jnp.float32)
        abd = _block_diag_a(a_src)
        exp_bd = _expand_bd(h, f)
        l_src = g_w @ abd  # [E_b, H]
        # all four receiver-side operands in ONE tile-read expand
        eall = _banded_expand(
            jnp.concatenate([f_dst, bound, g_out, g_den], axis=1),
            r_local, r_chunk, interpret)  # [E_b, 2H + HF + H]
        fde = eall[:, :h]
        bnd = eall[:, h:2 * h]
        dmsg = eall[:, 2 * h:2 * h + hf]
        dden = eall[:, 2 * h + hf:]
        raw = fde + l_src
        live = (r_local < TILE)[:, None]
        num = jnp.where(live, jnp.exp(_leaky(raw, alpha) - bnd), 0.0)
        qnum = num * keepq

        dqnum = (dmsg * g_w) @ exp_bd.T  # [E_b, H]
        dnum = dqnum * keepq + dden
        draw = dnum * num * jnp.where(raw >= 0, 1.0, alpha)
        df_dst = stream_scatter(draw, r_local, r_chunk, n_pad,
                                precision=prec, interpret=interpret)
        dgathered = dmsg * (qnum @ exp_bd) + draw @ abd.T  # [E_b, HF]
        dwh = _banded_sender_sum_direct(dgathered, bs_band, bs_chunk,
                                        bs_sloc, w, n_pad, prec, interpret)
        da = jnp.sum(g_w * (draw @ exp_bd), axis=0).reshape(h, f)
        return (dwh, df_dst, None, da, None, None, None, None, None, None,
                None, None, None, None, None)

    op.defvjp(fwd, bwd)
    return op


@_lru_cache(maxsize=None)
def _v2_banded_op(w: int, alpha: float, precision: str, interpret: bool):
    """custom_vjp fused-v2 attention over flat band-plan arrays.
    Signature: op(whi, whj, ub, a, keepq, band, s_loc, r_local, r_chunk,
    c_slot, c_local, c_chunk) -> (out [N, HF], den [N, H])."""
    from pygat_tpu.ops.fused_stream import (
        _block_diag_a,
        _const_spec,
        _expand_bd,
        _grid_call,
        _leaky,
        _make_v2_kernel,
        _tile_spec,
        _win_dtype,
        _window_spec,
    )
    from pygat_tpu.ops.stream import stream_scatter

    exact = precision != "fastest"

    def _fwd_impl(whi, whj, ub, a, keepq, band, s_loc, r_local, r_chunk):
        n_pad, hf = whi.shape
        h, f = a.shape
        e = s_loc.shape[0]
        c = e // EC
        wdt = _win_dtype(precision)
        # ONE banded window table for both sender operands (lanes 2*HF)
        wjwi = jnp.concatenate([whj, whi], axis=1).astype(wdt)
        wiub = jnp.concatenate([whi, ub], axis=1)  # [N, HF + H]
        abd = _block_diag_a(a.astype(wdt))
        exp_bd = _expand_bd(h, f)
        return _banded_grid_call(
            _make_v2_banded_kernel(alpha, h, hf, w, exact, interpret),
            band, r_chunk,
            s_loc.reshape(c // 8, 8, EC), r_local.reshape(c // 8, 8, EC),
            keepq.reshape(c, EC, h), wjwi, w, wiub,
            n_pad, hf, h, interpret, [abd, exp_bd],
        )

    @jax.custom_vjp
    def op(whi, whj, ub, a, keepq, band, s_loc, r_local, r_chunk,
           c_slot, c_local, c_chunk, bs_band, bs_chunk, bs_sloc):
        return _fwd_impl(whi, whj, ub, a, keepq, band, s_loc, r_local,
                         r_chunk)

    def fwd(whi, whj, ub, a, keepq, band, s_loc, r_local, r_chunk,
            c_slot, c_local, c_chunk, bs_band, bs_chunk, bs_sloc):
        out = _fwd_impl(whi, whj, ub, a, keepq, band, s_loc, r_local,
                        r_chunk)
        return out, (whi, whj, ub, a, keepq, band, s_loc, r_local, r_chunk,
                     c_slot, c_local, c_chunk, bs_band, bs_chunk, bs_sloc)

    def bwd(res, cts):
        (whi, whj, ub, a, keepq, band, s_loc, r_local, r_chunk,
         c_slot, c_local, c_chunk, bs_band, bs_chunk, bs_sloc) = res
        g_out, g_den = cts
        n_pad, hf = whi.shape
        h, f = a.shape
        prec = "high" if exact else "fastest"

        gjgi = _banded_take_impl(jnp.concatenate([whj, whi], axis=1),
                                 band, s_loc, w, exact=exact,
                                 interpret=interpret).astype(jnp.float32)
        gj = gjgi[:, :hf]
        gi = gjgi[:, hf:]
        eall = _banded_expand(
            jnp.concatenate([whi, ub, g_out, g_den], axis=1),
            r_local, r_chunk, interpret)  # [E_b, HF + H + HF + H]
        wi_e = eall[:, :hf]
        ub_e = eall[:, hf:hf + h]
        dmsg = eall[:, hf + h:2 * hf + h]
        dden = eall[:, 2 * hf + h:]
        raw = wi_e + gj
        pre = jnp.where(raw >= 0, raw, alpha * raw)
        abd = _block_diag_a(a)
        exp_bd = _expand_bd(h, f)
        live = (r_local < TILE)[:, None]
        logits = pre @ abd
        num = jnp.where(live, jnp.exp(logits - ub_e), 0.0)
        qnum = num * keepq

        dqnum = (dmsg * gi) @ exp_bd.T
        dnum = dqnum * keepq + dden
        dlogits = dnum * num
        dpre = (dlogits @ abd.T) * jnp.where(raw >= 0, 1.0, alpha)

        dwhi_e = stream_scatter(dpre, r_local, r_chunk, n_pad,
                                precision=prec, interpret=interpret)
        dmsg_s = dmsg * (qnum @ exp_bd)
        both = jnp.concatenate([dpre, dmsg_s], axis=1)  # [E_b, 2HF]
        red = _banded_sender_sum_direct(both, bs_band, bs_chunk, bs_sloc,
                                        w, n_pad, prec, interpret)
        dwhj = red[:, :hf]
        dwhi = dwhi_e + red[:, hf:]
        da = jnp.sum(pre * (dlogits @ exp_bd), axis=0).reshape(h, f)
        return (dwhi, dwhj, None, da, None, None, None, None, None, None,
                None, None, None, None, None)

    op.defvjp(fwd, bwd)
    return op


def fused_v1_attention_banded(wh, f_dst, bound, a_src, keepq,
                              plan: BandPlan, *, alpha: float,
                              precision: str, interpret: bool):
    """Drop-in for fused_stream.fused_v1_attention with banded windows
    (``keepq`` must be [plan.num_slots, H], drawn over banded slots)."""
    op = _v1_banded_op(plan.w, float(alpha), precision, interpret)
    return op(wh, f_dst, bound, a_src, keepq, plan.band, plan.s_loc,
              plan.r_local, plan.r_chunk, plan.c_slot, plan.c_local,
              plan.c_chunk, plan.bs_band, plan.bs_chunk, plan.bs_sloc)


def fused_v2_attention_banded(whi, whj, ub, a, keepq, plan: BandPlan, *,
                              alpha: float, precision: str, interpret: bool):
    """Drop-in for fused_stream.fused_v2_attention with banded windows."""
    op = _v2_banded_op(plan.w, float(alpha), precision, interpret)
    return op(whi, whj, ub, a, keepq, plan.band, plan.s_loc,
              plan.r_local, plan.r_chunk, plan.c_slot, plan.c_local,
              plan.c_chunk, plan.bs_band, plan.bs_chunk, plan.bs_sloc)


# ---------------------------------------------------------------------------
# SpMM over a band plan (values are per-edge weights in banded order, e.g.
# plan.edge_weight): the stream SpMM with the XLA row gather replaced by
# banded windows. Forward path of the reference's SpecialSpmm
# (layers.py:150-156) at large N.
# ---------------------------------------------------------------------------


def _make_spmm_banded_kernel(w: int, exact: bool, interpret: bool):
    """Weighted select + scatter fused: per chunk, ONE pass builds
    msgs[e] = vals[e] * x[send[e]] as a vals-scaled one-hot MXU matmul
    against the VMEM window and scatters it with the receiver one-hot —
    the [E_b, L] message window never touches HBM (the two-pass form's
    dominant traffic term)."""
    from pygat_tpu.ops.fused_stream import _rounder, _split_hi

    hp = jax.lax.Precision.HIGHEST if exact else MXU_PREC

    def kernel(*refs):
        (band_ref, ct_ref, sloc_ref, local_ref, val_ref) = refs[:5]
        tabs = refs[5:5 + w]
        out_ref = refs[5 + w]
        i = pl.program_id(0)
        tile = ct_ref[i]
        first = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        vr = _rounder(False, interpret)
        loc = local_ref[0, i % 8, :]  # [EC]; DEAD -> zero one-hot column
        sloc = sloc_ref[0, i % 8, :]  # [EC]; w*TILE -> zero select row
        vals = val_ref[0, i % 8, :]  # [EC] f32
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, EC), 0)
        ohf = (rows == loc[None, :]).astype(jnp.float32)
        if exact:
            # f32 window values: exact select (HIGHEST), then scale and
            # two-limb scatter exactly like the stream 'high' path
            g = _window_select(sloc, tabs, lambda x: x, hp)  # [EC, L]
            msgs = vals[:, None] * g
            hi = _split_hi(msgs)
            acc = jnp.dot(vr(ohf), vr(hi),
                          preferred_element_type=jnp.float32,
                          precision=MXU_PREC)
            acc = acc + jnp.dot(vr(ohf), vr(msgs - hi),
                                preferred_element_type=jnp.float32,
                                precision=MXU_PREC)
        else:
            # bf16 window: fold the edge weight INTO the select one-hots
            # (scaled-select matmuls replace select + multiply)
            g = _window_select(sloc, tabs, vr, MXU_PREC, scale=vals)
            acc = jnp.dot(vr(ohf), vr(g),
                          preferred_element_type=jnp.float32,
                          precision=MXU_PREC)
        out_ref[:] += acc

    return kernel


def _spmm_banded_fused_impl(values_b, x, band, s_loc, r_local, r_chunk,
                            w: int, exact: bool, interpret: bool):
    n_pad, l_real = x.shape
    c = band.shape[0]
    l_pad = -(-l_real // 128) * 128
    xt = x
    if l_pad != l_real:
        xt = jnp.pad(xt, ((0, 0), (0, l_pad - l_real)))
    xt = xt.astype(jnp.float32 if exact else jnp.bfloat16)
    sloc8 = s_loc.reshape(c // 8, 8, EC)
    local8 = r_local.reshape(c // 8, 8, EC)
    # (8, EC)-packed like sloc/local: a (1, EC) block fails the TPU
    # lowering's (8, 128) block-divisibility rule (interpret mode hides it)
    vals = values_b.astype(jnp.float32).reshape(c // 8, 8, EC)

    def _tab_spec(j):
        return pl.BlockSpec((TILE, l_pad),
                            lambda i, b, ct, _j=j: (b[i] + _j, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 8, EC), lambda i, b, ct: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EC), lambda i, b, ct: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EC), lambda i, b, ct: (i // 8, 0, 0)),
        ]
        + [_tab_spec(j) for j in range(w)],
        out_specs=pl.BlockSpec((TILE, l_pad), lambda i, b, ct: (ct[i], 0)),
    )
    out = pl.pallas_call(
        _make_spmm_banded_kernel(w, exact, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, l_pad), jnp.float32),
        interpret=interpret,
    )(band, r_chunk, sloc8, local8, vals, *([xt] * w))
    return out[:, :l_real] if l_pad != l_real else out


@_lru_cache(maxsize=None)
def _spmm_banded_op(w: int, precision: str, interpret: bool):
    """custom_vjp fused banded SpMM over flat band-plan arrays.
    Signature: op(values_b, x, band, s_loc, r_local, r_chunk, c_slot,
    c_local, c_chunk) -> out [N, L]."""
    exact = precision != "fastest"
    prec = "high" if exact else "fastest"

    def _fwd_impl(values_b, x, band, s_loc, r_local, r_chunk):
        return _spmm_banded_fused_impl(values_b, x, band, s_loc, r_local,
                                       r_chunk, w, exact, interpret)

    @jax.custom_vjp
    def op(values_b, x, band, s_loc, r_local, r_chunk, c_slot, c_local,
           c_chunk, bs_band, bs_chunk, bs_sloc):
        return _fwd_impl(values_b, x, band, s_loc, r_local, r_chunk)

    def fwd(values_b, x, band, s_loc, r_local, r_chunk, c_slot, c_local,
            c_chunk, bs_band, bs_chunk, bs_sloc):
        out = _fwd_impl(values_b, x, band, s_loc, r_local, r_chunk)
        return out, (values_b, x, band, s_loc, r_local, r_chunk, c_slot,
                     c_local, c_chunk, bs_band, bs_chunk, bs_sloc)

    def bwd(res, g_out):
        (values_b, x, band, s_loc, r_local, r_chunk, c_slot, c_local,
         c_chunk, bs_band, bs_chunk, bs_sloc) = res
        n_pad = x.shape[0]
        # dvals[e] = <g_out[recv_b[e]], x[send_b[e]]>  (banded SDDMM);
        # win is zero at dead slots, so dvals vanishes there
        win = _banded_take_impl(x, band, s_loc, w, exact=exact,
                                interpret=interpret).astype(jnp.float32)
        ge = _banded_expand(g_out, r_local, r_chunk, interpret)
        dvals = jnp.sum(win * ge, axis=1)
        # dx = per-sender sum of vals * g_out[recv] (CSC stream covers
        # real edges only — dead banded slots never reach it)
        dx = _banded_sender_sum_direct(values_b[:, None] * ge, bs_band,
                                       bs_chunk, bs_sloc, w, n_pad, prec,
                                       interpret)
        return (dvals, dx, None, None, None, None, None, None, None, None,
                None, None)

    op.defvjp(fwd, bwd)
    return op


def spmm_banded(values_b: jax.Array, x: jax.Array, plan: BandPlan, *,
                precision: str = "fastest", interpret: bool = False,
                fused: bool = True):
    """``out[i] = sum_{e: recv_b[e]=i} values_b[e] * x[senders_b[e]]``.

    ``values_b`` must be in banded order (dead slots ignored — the select
    one-hot is zero there). ``fused=True`` (default) runs select+scale+
    scatter in ONE kernel pass (the [E_b, L] message window never touches
    HBM); ``fused=False`` keeps the round-5 two-pass composition
    (banded_take -> stream_scatter) for A/B measurement. Differentiable in
    values_b and x via a custom VJP (banded SDDMM + CSC sender sum).
    Forward path of the reference's SpecialSpmm (layers.py:150-156) at
    large N."""
    if fused:
        op = _spmm_banded_op(plan.w, precision, interpret)
        return op(values_b, x, plan.band, plan.s_loc, plan.r_local,
                  plan.r_chunk, plan.c_slot, plan.c_local, plan.c_chunk,
                  plan.bs_band, plan.bs_chunk, plan.bs_sloc)
    from pygat_tpu.ops.stream import stream_scatter

    win = banded_take(x, plan, exact=precision != "fastest",
                      interpret=interpret)
    msgs = values_b[:, None] * win.astype(jnp.float32)
    return stream_scatter(msgs, plan.r_local, plan.r_chunk,
                          x.shape[0], precision=precision,
                          interpret=interpret)


# ---------------------------------------------------------------------------
# auto selection
# ---------------------------------------------------------------------------

import os as _os  # noqa: E402

_BAND_MODE = _os.environ.get("PYGAT_BAND", "auto")
# Crossover vs the XLA take window build: take holds 0.21-0.22 of roofline
# while the wh table stays VMEM-reusable (~<=262k nodes x 128 lanes f32,
# RESULTS.md large-graph table) and collapses past ~300k. The banded build
# has no such cliff, so auto switches exactly there.
_BAND_N = int(_os.environ.get("PYGAT_BAND_N", str(300_000)))
_BAND_W = int(_os.environ.get("PYGAT_BAND_W", "4"))
# Greedy chunking degrades gracefully with poor locality (partially filled
# chunks, never wrong results); below this fill the chunk count has blown
# up enough that the plain take path is the better loss.
_BAND_MIN_FILL = float(_os.environ.get("PYGAT_BAND_MIN_FILL", "0.2"))


def set_band(mode: str, *, n: int | None = None, w: int | None = None) -> None:
    """'auto' (on for stream graphs past PYGAT_BAND_N nodes with adequate
    locality), 'on', 'off'."""
    global _BAND_MODE, _BAND_N, _BAND_W
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown band mode {mode!r}")
    _BAND_MODE = mode
    if n is not None:
        _BAND_N = int(n)
    if w is not None:
        _BAND_W = int(w)


def maybe_plan_band(graph) -> BandPlan | None:
    """A BandPlan when the fused layers should build sender windows with
    the banded kernel instead of ``jnp.take``; None = keep take."""
    if graph.r_local is None or _BAND_MODE == "off":
        return None
    if _BAND_MODE == "auto" and graph.num_nodes_padded < _BAND_N:
        return None
    plan = build_band_plan(graph, w=_BAND_W)
    if _BAND_MODE == "auto" and plan.fill < _BAND_MIN_FILL:
        import sys

        print(f"[pygat_tpu.banded] fill {plan.fill:.2f} < {_BAND_MIN_FILL}"
              " (poor locality — consider --reorder); keeping take windows",
              file=sys.stderr)
        return None
    return plan


def maybe_plan_large(graph):
    """The large-N window-build plan for the fused layers: banded (auto
    past PYGAT_BAND_N) > corner (opt-in, PYGAT_CORNER=on) > None (take)."""
    plan = maybe_plan_band(graph)
    if plan is not None:
        return plan
    from pygat_tpu.ops.large import maybe_plan_corner

    return maybe_plan_corner(graph)


# ---------------------------------------------------------------------------
# Fully-fused banded kernels: the window SELECT moves inside the attention
# kernel — one grid pass per layer direction, no [E, HF] window round-trip
# through HBM and half the per-step pipeline overhead of the two-pass
# (banded_take -> fused) composition. Measured r5 at N=524k/deg16: the
# two-pass form ran 54 ms vs take's 145; this form is the production path.
# ---------------------------------------------------------------------------


def _make_v1_banded_kernel(alpha: float, h: int, hf: int, w: int,
                           two_limb: bool, interpret: bool):
    from pygat_tpu.ops.fused_stream import _rounder, _split_hi

    mm = _rounder(two_limb, interpret)
    hp = jax.lax.Precision.HIGHEST if two_limb else MXU_PREC

    def kernel(*refs):
        (band_ref, ct_ref, sloc_ref, local_ref, keep_ref) = refs[:5]
        tabs = refs[5:5 + w]
        fdb_ref, abd_ref, exp_ref, out_ref, den_ref = refs[5 + w:]
        i = pl.program_id(0)
        tile = ct_ref[i]
        first = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            den_ref[:] = jnp.zeros_like(den_ref)

        vr = _rounder(False, interpret)
        loc = local_ref[0, i % 8, :]  # [EC]; 128 = dead
        sloc = sloc_ref[0, i % 8, :]  # [EC]; w*128 = dead
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, EC), 0)
        ohf = (rows == loc[None, :]).astype(jnp.float32)
        oh = vr(ohf)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (EC, TILE), 1)
        ohT = (lanes == loc[:, None]).astype(jnp.float32)

        # in-kernel banded window select (replaces the g_ref window input):
        # dead slots (sloc == w*128) select nothing -> zero rows
        g = _window_select(
            sloc, tabs,
            mm if two_limb else (lambda x: x.astype(jnp.bfloat16)),
            hp)  # [EC, HF] f32 (exact select of win vals)

        l_src = jnp.dot(mm(g), mm(abd_ref[...]),
                        preferred_element_type=jnp.float32,
                        precision=hp)  # [EC, H]
        fde = jnp.dot(ohT, fdb_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=hp)  # [EC, 2H]
        raw = fde[:, :h] + l_src
        logits = jnp.where(raw >= 0, raw, alpha * raw)
        live = loc[:, None] < TILE
        num = jnp.where(live, jnp.exp(logits - fde[:, h:]), 0.0)  # [EC, H]
        qnum = num * keep_ref[0]
        qnum_hf = jnp.dot(qnum, exp_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=hp)  # [EC, HF]
        msgs = g * qnum_hf
        if two_limb:
            hi = _split_hi(msgs)
            acc = jnp.dot(oh, vr(hi), preferred_element_type=jnp.float32,
                          precision=MXU_PREC)
            acc = acc + jnp.dot(oh, vr(msgs - hi),
                                preferred_element_type=jnp.float32,
                                precision=MXU_PREC)
        else:
            acc = jnp.dot(oh, vr(msgs), preferred_element_type=jnp.float32,
                          precision=MXU_PREC)
        out_ref[:] += acc
        den_ref[:] += jnp.dot(ohf, num, preferred_element_type=jnp.float32,
                              precision=hp)

    return kernel


def _make_v2_banded_kernel(alpha: float, h: int, hf: int, w: int,
                           two_limb: bool, interpret: bool):
    from pygat_tpu.ops.fused_stream import _rounder, _split_hi

    mm = _rounder(two_limb, interpret)
    hp = jax.lax.Precision.HIGHEST if two_limb else MXU_PREC

    def kernel(*refs):
        (band_ref, ct_ref, sloc_ref, local_ref, keep_ref) = refs[:5]
        tabs = refs[5:5 + w]  # blocks of the [N, 2HF] (whj | whi) table
        wiub_ref, abd_ref, exp_ref, out_ref, den_ref = refs[5 + w:]
        i = pl.program_id(0)
        tile = ct_ref[i]
        first = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            den_ref[:] = jnp.zeros_like(den_ref)

        vr = _rounder(False, interpret)
        loc = local_ref[0, i % 8, :]
        sloc = sloc_ref[0, i % 8, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, EC), 0)
        ohf = (rows == loc[None, :]).astype(jnp.float32)
        oh = vr(ohf)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (EC, TILE), 1)
        ohT = (lanes == loc[:, None]).astype(jnp.float32)

        g2 = _window_select(
            sloc, tabs,
            mm if two_limb else (lambda x: x.astype(jnp.bfloat16)),
            hp)  # [EC, 2HF]
        gj = g2[:, :hf]
        gi = g2[:, hf:]

        wiub_e = jnp.dot(ohT, wiub_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=hp)  # [EC, HF+H]
        pre_raw = wiub_e[:, :hf] + gj
        pre = jnp.where(pre_raw >= 0, pre_raw, alpha * pre_raw)
        logits = jnp.dot(mm(pre), mm(abd_ref[...]),
                         preferred_element_type=jnp.float32,
                         precision=hp)  # [EC, H]
        live = loc[:, None] < TILE
        num = jnp.where(live, jnp.exp(logits - wiub_e[:, hf:]), 0.0)
        qnum = num * keep_ref[0]
        qnum_hf = jnp.dot(qnum, exp_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=hp)
        msgs = gi * qnum_hf
        if two_limb:
            hi = _split_hi(msgs)
            acc = jnp.dot(oh, vr(hi), preferred_element_type=jnp.float32,
                          precision=MXU_PREC)
            acc = acc + jnp.dot(oh, vr(msgs - hi),
                                preferred_element_type=jnp.float32,
                                precision=MXU_PREC)
        else:
            acc = jnp.dot(oh, vr(msgs), preferred_element_type=jnp.float32,
                          precision=MXU_PREC)
        out_ref[:] += acc
        den_ref[:] += jnp.dot(ohf, num, preferred_element_type=jnp.float32,
                              precision=hp)

    return kernel


def _banded_grid_call(kernel, band, r_chunk, sloc8, local8, keepw, table,
                      w, tile_in, n_pad, out_lanes, h, interpret: bool,
                      consts):
    """pallas_call plumbing for the fused banded kernels: TWO prefetch
    scalars (band drives the w table-block index maps, r_chunk the
    fdb/out/den blocks), (8, EC)-packed sloc/local, per-chunk keep window,
    w scalar-indexed table blocks, one r_chunk-indexed tile input."""
    c = band.shape[0]
    l_tab = table.shape[1]

    def _tab_spec(j):
        return pl.BlockSpec((TILE, l_tab),
                            lambda i, b, ct, _j=j: (b[i] + _j, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 8, EC), lambda i, b, ct: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EC), lambda i, b, ct: (i // 8, 0, 0)),
            pl.BlockSpec((1, EC, keepw.shape[2]),
                         lambda i, b, ct: (i, 0, 0)),
        ]
        + [_tab_spec(j) for j in range(w)]
        + [pl.BlockSpec((TILE, tile_in.shape[1]),
                        lambda i, b, ct: (ct[i], 0))]
        + [pl.BlockSpec(cc.shape, lambda i, b, ct: (0, 0)) for cc in consts],
        out_specs=[
            pl.BlockSpec((TILE, out_lanes), lambda i, b, ct: (ct[i], 0)),
            pl.BlockSpec((TILE, h), lambda i, b, ct: (ct[i], 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, out_lanes), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, h), jnp.float32),
        ],
        interpret=interpret,
    )(band, r_chunk, sloc8, local8, keepw, *([table] * w), tile_in, *consts)
