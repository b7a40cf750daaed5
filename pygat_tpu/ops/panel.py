"""Panel-decomposed gather for large-graph SpMM (round 3).

At Pubmed scale the stream SpMM (ops/stream.py) runs at 0.54 of the HBM
roofline, but at N=500k it collapses to 0.025: XLA's row gather
(``dense[senders]``) serializes at ~14 ns/row once the operand table
exceeds VMEM, regardless of locality (RESULTS.md "Large-graph finding").
The only fast arbitrary-gather granularity on TPU is a 128-row tile, so
this module turns the gather into tile loads + on-chip selection:

* Edges are already receiver-sorted into EC-chunks that each scatter into
  one 128-row output tile (the stream layout baked into Graph).
* For each OUTPUT tile, the host collects the set of distinct 128-row
  SENDER tiles its edges touch (the "panels"). On a clustered /
  RCM-reordered graph this set is small (bandwidth B => ~2B/128 panels).
* The kernel's panel inputs are BlockSpec'd as ``x[panel_tiles[tile, p]]``:
  consecutive chunks of the same output tile keep the same panel blocks,
  so Pallas skips the re-fetch and the HBM cost of the panels amortizes
  over the whole tile's edges.
* In-kernel, each edge selects its sender row from the concatenated
  [P*128, L] panel block — a one-hot MXU matmul (mode='onehot') or a
  VMEM-local ``jnp.take`` (mode='take', dynamic_gather lowering) — and the
  weighted messages scatter through the same one-hot pattern the stream
  kernel uses.

Edges whose sender tile does not fit in the P panels of their output tile
(long-range edges) overflow to a small XLA scatter pass — correctness for
any graph, speed proportional to locality. On a uniform-random 500k graph
nearly everything overflows: that regime needs a corner-turn permutation
kernel (future); clustering/partitioning first is standard practice at
that scale and is what ``--reorder`` (RCM) provides.

Replaces the gather half of the reference's SpecialSpmm
(reference layers.py:70-95) for million-node graphs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygat_tpu.ops.stream import DEAD, EC, MXU_PREC, TILE

_LANE = 128


class PanelLayout(NamedTuple):
    """Host-built panel decomposition of a stream-aligned Graph's
    receiver-side edge order."""

    panel_tiles: jax.Array  # [T, P] int32 sender-tile id per panel slot
    g_idx: jax.Array  # [E_s] int32: p*128 + (sender % 128); P*128 = dead
    overflow_edges: jax.Array  # [V] int32 edge ids (padded with e_dead)
    n_panels: int  # P (static)
    n_overflow: int  # real overflow edge count (diagnostic)

    @property
    def overflow_frac(self) -> float:
        return self.n_overflow / max(self.g_idx.shape[0], 1)


def build_panel_layout(graph, p_max: int | None = None) -> PanelLayout:
    """Collect per-output-tile sender-tile panels (numpy, once per graph).

    ``p_max`` caps the panel count; edges beyond the cap (ranked by how
    many edges each sender tile carries) overflow to the XLA pass.
    """
    if graph.r_local is None:
        raise ValueError("panel layout needs a stream-aligned graph")
    senders = np.asarray(graph.senders)
    r_local = np.asarray(graph.r_local)
    chunk_tile = np.asarray(graph.r_chunk)
    e_s = senders.shape[0]
    n_tiles = int(np.asarray(graph.node_mask).shape[0]) // TILE

    slot_tile = np.repeat(chunk_tile.astype(np.int64), EC)
    live = r_local < DEAD
    gtile = (senders // TILE).astype(np.int64)

    panel_tiles = np.zeros((n_tiles, 1), dtype=np.int32)
    p_slot = np.full(e_s, -1, dtype=np.int64)  # panel index per slot
    panels_per_tile: list[np.ndarray] = []
    for t in range(n_tiles):
        m = live & (slot_tile == t)
        tiles_t, counts = np.unique(gtile[m], return_counts=True)
        tiles_t = tiles_t[np.argsort(-counts)]  # keep the busiest if capped
        if p_max is not None:
            tiles_t = tiles_t[:p_max]
        panels_per_tile.append(tiles_t)
        lut = np.full(n_tiles, -1, dtype=np.int64)
        lut[tiles_t] = np.arange(tiles_t.shape[0])
        p_slot[m] = lut[gtile[m]]

    p = max((pt.shape[0] for pt in panels_per_tile), default=1) or 1
    panel_tiles = np.zeros((n_tiles, p), dtype=np.int32)
    for t, pt in enumerate(panels_per_tile):
        panel_tiles[t, : pt.shape[0]] = pt

    fits = live & (p_slot >= 0)
    g_idx = np.where(fits, p_slot * TILE + senders % TILE, p * TILE).astype(
        np.int32
    )
    overflow = np.nonzero(live & (p_slot < 0))[0]
    n_ov = overflow.shape[0]
    # pad the overflow list with a dead slot id (weight 0 there)
    dead_slots = np.nonzero(~live)[0]
    e_dead = int(dead_slots[0]) if dead_slots.size else 0
    v = max(-(-n_ov // _LANE) * _LANE, _LANE)
    overflow_p = np.full(v, e_dead, dtype=np.int32)
    overflow_p[:n_ov] = overflow

    return PanelLayout(
        panel_tiles=jnp.asarray(panel_tiles),
        g_idx=jnp.asarray(g_idx),
        overflow_edges=jnp.asarray(overflow_p),
        n_panels=p,
        n_overflow=n_ov,
    )


def _rounder(two_limb: bool, interpret: bool):
    if two_limb:
        return lambda x: x.astype(jnp.float32)
    if interpret:  # XLA:CPU rejects bf16 x bf16 dots at some shapes
        return lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    return lambda x: x.astype(jnp.bfloat16)


def _split_hi(x):
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )


def _make_spmm_kernel(p: int, l_pad: int, two_limb: bool, interpret: bool,
                      mode: str):
    mm = _rounder(two_limb, interpret)
    vr = _rounder(False, interpret)

    def kernel(ct_ref, pt_ref, gidx_ref, local_ref, w_ref, *rest):
        panel_refs, out_ref = rest[:p], rest[p]
        i = pl.program_id(0)
        tile = ct_ref[i]
        first = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        gi = gidx_ref[0, i % 8, :]  # [EC]
        loc = local_ref[0, i % 8, :]
        w = w_ref[0, i % 8, :]

        if mode == "take":
            # Mosaic's only gather lowering is the same-shape
            # take_along_axis form (tpu.dynamic_gather), so gather in
            # [TILE, L] units: per EC//TILE index slab, per panel, with
            # clamped per-lane indices + owning-panel select. Overflow /
            # dead slots (gi >= p*TILE) stay 0 — they carry w == 0 anyway.
            parts = []
            for j in range(EC // TILE):
                gj = gi[j * TILE:(j + 1) * TILE]
                gcol = jnp.broadcast_to(gj[:, None], (TILE, l_pad))
                sub = jnp.zeros((TILE, l_pad), jnp.float32)
                for k in range(p):
                    pk = panel_refs[k][...].astype(jnp.float32)
                    lidx = jnp.clip(gcol - k * TILE, 0, TILE - 1)
                    got = jnp.take_along_axis(pk, lidx, axis=0,
                                              mode="promise_in_bounds")
                    own = (gcol >= k * TILE) & (gcol < (k + 1) * TILE)
                    sub = jnp.where(own, got, sub)
                parts.append(sub)
            gath = jnp.concatenate(parts, axis=0)  # [EC, L]
        else:
            panels = jnp.concatenate([r[...] for r in panel_refs], axis=0)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (EC, p * TILE), 1)
            oh = (lanes == gi[:, None]).astype(jnp.float32)
            if two_limb:
                # high mode: the select must keep panel values f32-exact —
                # Mosaic's DEFAULT on f32 operands is one lossy bf16 pass
                gath = jnp.dot(oh, panels.astype(jnp.float32),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            else:
                gath = jnp.dot(vr(oh), mm(panels),
                               preferred_element_type=jnp.float32,
                               precision=MXU_PREC)
        # dead + overflow slots carry w == 0 (covers mode='take' clamping)
        msgs = gath * w[:, None]

        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, EC), 0)
        ohs = vr((rows == loc[None, :]).astype(jnp.float32))
        if two_limb:
            hi = _split_hi(msgs)
            acc = jnp.dot(ohs, vr(hi), preferred_element_type=jnp.float32,
                                       precision=MXU_PREC)
            acc = acc + jnp.dot(ohs, vr(msgs - hi),
                                preferred_element_type=jnp.float32,
                                precision=MXU_PREC)
        else:
            acc = jnp.dot(ohs, vr(msgs), preferred_element_type=jnp.float32,
                                         precision=MXU_PREC)
        out_ref[:] += acc

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def panel_spmm(values, dense, panel_tiles, g_idx, overflow_edges,
               senders, receivers, edge_mask, r_local, r_chunk,
               p: int, precision: str, interpret: bool, mode: str):
    """out[N, L] = scatter-add over receivers of values * dense[senders],
    gathering through per-output-tile panels (plus an XLA pass for
    overflow edges).  ``values`` [E_s] must follow the graph's stream edge
    order; padding edges carry weight 0 via ``edge_mask``."""
    return _panel_fwd_impl(values, dense, panel_tiles, g_idx, overflow_edges,
                           senders, receivers, edge_mask, r_local, r_chunk,
                           p, precision, interpret, mode)


def _panel_fwd_impl(values, dense, panel_tiles, g_idx, overflow_edges,
                    senders, receivers, edge_mask, r_local, r_chunk,
                    p, precision, interpret, mode):
    n_pad, l = dense.shape
    e_s = values.shape[0]
    c = e_s // EC
    two_limb = precision != "fastest"
    wdt = jnp.float32 if two_limb else jnp.bfloat16

    live_fit = edge_mask & (g_idx < p * TILE)
    w = jnp.where(live_fit, values, 0.0).astype(jnp.float32)

    spec8 = pl.BlockSpec((1, 8, EC), lambda i, ct, pt: (i // 8, 0, 0))

    def _panel_spec(k):
        return pl.BlockSpec((TILE, l), lambda i, ct, pt, k=k: (pt[ct[i], k], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c,),
        in_specs=[spec8, spec8, spec8] + [_panel_spec(k) for k in range(p)],
        out_specs=pl.BlockSpec((TILE, l), lambda i, ct, pt: (ct[i], 0)),
    )
    x_w = dense.astype(wdt)
    out = pl.pallas_call(
        _make_spmm_kernel(p, l, two_limb, interpret, mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, l), jnp.float32),
        interpret=interpret,
    )(
        r_chunk, panel_tiles,
        g_idx.reshape(c // 8, 8, EC),
        r_local.reshape(c // 8, 8, EC),
        w.reshape(c // 8, 8, EC),
        *([x_w] * p),
    )

    # long-range overflow edges: plain XLA gather+scatter over the (small)
    # overflow list; padding entries point at a dead slot with weight 0
    ov = overflow_edges
    w_ov = jnp.where(edge_mask[ov], values[ov], 0.0)
    out = out.at[receivers[ov]].add(
        w_ov[:, None] * dense[senders[ov]], mode="drop",
    )
    return out


def _panel_fwd(values, dense, panel_tiles, g_idx, overflow_edges,
               senders, receivers, edge_mask, r_local, r_chunk,
               p, precision, interpret, mode):
    out = panel_spmm(values, dense, panel_tiles, g_idx, overflow_edges,
                     senders, receivers, edge_mask, r_local, r_chunk,
                     p, precision, interpret, mode)
    return out, (values, dense, senders, receivers, edge_mask)


def _panel_bwd(p, precision, interpret, mode, res, g):
    """XLA backward (SDDMM + sender scatter) — correct everywhere; at
    million-node scale it is gather-bound like the stream backward
    (RESULTS.md): the corner-turn permutation kernel that would fix the
    backward at that scale is future work."""
    values, dense, senders, receivers, edge_mask = res
    from pygat_tpu.ops.segment import segment_sum

    dvalues = jnp.sum(g[receivers] * dense[senders], axis=-1)
    dvalues = jnp.where(edge_mask, dvalues, 0.0)
    v = jnp.where(edge_mask, values, 0.0)
    ddense = segment_sum(v[:, None] * g[receivers], senders, dense.shape[0],
                         sorted_ids=False)
    return (dvalues, ddense, None, None, None, None, None, None, None, None)


panel_spmm.defvjp(_panel_fwd, _panel_bwd)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _panel_corner_op(ps_fwd: tuple, ps_inv: tuple, p: int, precision: str,
                     interpret: bool, mode: str):
    """panel_spmm with a GATHER-FREE backward: the forward is the identical
    panel kernel, but the VJP's ``dense[senders]`` gather goes through CSC
    expand + corner-turn and the sender scatter through the inverse turn +
    CSC stream scatter (ops/fused_corner.py machinery) — fixing the
    million-node gather-bound backward of `_panel_bwd`. Cached per static
    plan structure; plan arrays ride as jit arguments. Signature:
    op(values, dense, panel_tiles, g_idx, overflow_edges, senders,
    receivers, edge_mask, r_local, r_chunk, c_local, c_chunk,
    *fwd_arrays, *inv_arrays) -> out [N, L]."""
    from pygat_tpu.ops.fused_corner import _gather_corner, _scatter_corner
    from pygat_tpu.ops.large import _expand_impl

    n_f = 4 * len(ps_fwd)
    exact = precision != "fastest"
    prec = "high" if exact else "fastest"

    @jax.custom_vjp
    def op(values, dense, panel_tiles, g_idx, overflow_edges, senders,
           receivers, edge_mask, r_local, r_chunk, c_local, c_chunk, *arrs):
        return _panel_fwd_impl(values, dense, panel_tiles, g_idx,
                               overflow_edges, senders, receivers, edge_mask,
                               r_local, r_chunk, p, precision, interpret,
                               mode)

    def fwd(values, dense, panel_tiles, g_idx, overflow_edges, senders,
            receivers, edge_mask, r_local, r_chunk, c_local, c_chunk, *arrs):
        out = _panel_fwd_impl(values, dense, panel_tiles, g_idx,
                              overflow_edges, senders, receivers, edge_mask,
                              r_local, r_chunk, p, precision, interpret,
                              mode)
        return out, (values, dense, edge_mask, r_local, r_chunk, c_local,
                     c_chunk) + arrs

    def bwd(res, g):
        values, dense, edge_mask, r_local, r_chunk, c_local, c_chunk = res[:7]
        arrs = res[7:]
        e_s = values.shape[0]
        n_pad = dense.shape[0]
        g_recv = _expand_impl(g, r_local, r_chunk, interpret)  # [E_s, L]
        d_send = _gather_corner(dense, c_local, c_chunk, arrs[:n_f], ps_fwd,
                                e_s, interpret, exact)  # [E_s, L]
        dvalues = jnp.where(edge_mask, jnp.sum(g_recv * d_send, axis=-1), 0.0)
        v = jnp.where(edge_mask, values, 0.0)
        ddense = _scatter_corner(v[:, None] * g_recv, c_local, c_chunk,
                                 arrs[n_f:], ps_inv, n_pad, prec, interpret,
                                 exact)
        return (dvalues, ddense, None, None, None, None, None, None, None,
                None, None, None) + (None,) * len(arrs)

    op.defvjp(fwd, bwd)
    return op


def panel_spmm_graph(values, dense, graph, layout: PanelLayout,
                     *, plans=None, precision: str = "fastest",
                     interpret: bool | None = None, mode: str = "onehot"):
    """Graph-level wrapper: ``values`` in the graph's (stream) edge order.
    ``plans`` (ops.large.CscCsrPlans) swaps the XLA backward for the
    gather-free corner backward (same forward kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if plans is not None:
        from pygat_tpu.ops.corner import flatten_plan

        arr_f, ps_f = flatten_plan(plans.fwd)
        arr_i, ps_i = flatten_plan(plans.inv)
        op = _panel_corner_op(ps_f, ps_i, layout.n_panels, precision,
                              interpret, mode)
        return op(values, dense, layout.panel_tiles, layout.g_idx,
                  layout.overflow_edges, graph.senders, graph.receivers,
                  graph.edge_mask, graph.r_local, graph.r_chunk,
                  graph.c_local, graph.c_chunk, *arr_f, *arr_i)
    return panel_spmm(
        values, dense, layout.panel_tiles, layout.g_idx,
        layout.overflow_edges, graph.senders, graph.receivers,
        graph.edge_mask, graph.r_local, graph.r_chunk,
        layout.n_panels, precision, interpret, mode,
    )
