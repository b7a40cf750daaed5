"""Million-node SpMM for UNIFORM (non-clustered) graphs: expand +
corner-turn + stream-scatter — no serialized gather anywhere, forward OR
backward.

The panel kernel (ops/panel.py) handles clustered/RCM graphs, where each
output tile's senders live in a few tiles. On a uniform-random graph every
tile's senders are everywhere and panels degenerate. This module uses the
orthogonal structure instead: in CSC (sender-sorted) order the gather
``x[senders]`` is a per-chunk single-tile broadcast (senders ascend, so
every 256-slot chunk reads ONE 128-row tile of ``x`` — the stream
contract), and the move from CSC order to the receiver-sorted CSR order is
a STATIC permutation — a corner-turn (ops/corner.py) running at HBM speed.

    spmm_corner(v, x)  =  stream_scatter( v * turn_csc_to_csr( expand(x) ) )

Backward is gather-free by the same tricks:
* d values = <g[recv], x[send]> per edge — both factors come from the two
  expand kernels (receiver side is per-chunk single-tile too);
* d x = CSC-side stream scatter of the inverse-turned weighted cotangent.

Reference counterpart: SpecialSpmmFunction (reference layers.py:70-95) at
scales the reference's dense backward cannot represent at all.
"""

from __future__ import annotations

import os as _os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygat_tpu.ops.corner import CornerPlan, plan_corner_turn
from pygat_tpu.ops.stream import DEAD, EC, MXU_PREC, TILE, stream_scatter


# ---------------------------------------------------------------------------
# Expand kernels: windowed per-chunk single-tile gathers (P=1 by the
# stream-layout contract: each chunk's rows live in ONE 128-row tile)
# ---------------------------------------------------------------------------


def _make_expand_kernel(l: int, interpret: bool):
    def kernel(ct_ref, local_ref, x_ref, out_ref):
        i = pl.program_id(0)
        loc = local_ref[0, i % 8, :]  # [EC]; DEAD = padding slot
        lanes = jax.lax.broadcasted_iota(jnp.int32, (EC, TILE), 1)
        ohT = (lanes == loc[:, None]).astype(jnp.float32)
        # Pure data movement: the one-hot select must preserve the f32
        # values exactly. Mosaic's DEFAULT runs ONE bf16 pass on f32
        # operands — the compiled expand then rounds every gathered value
        # to bf16 (verified on-chip, round 4; interpret mode hides it).
        out_ref[0] = jnp.dot(ohT, x_ref[...],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    return kernel


def _expand_impl(x, local, chunk_tile, interpret: bool):
    """[E_s, L] rows of ``x`` in stream order: slot k gets
    x[chunk_tile[k//EC]*128 + local[k]] (zeros at dead slots)."""
    n_pad, l = x.shape
    c = chunk_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 8, EC), lambda i, ct: (i // 8, 0, 0)),
            pl.BlockSpec((TILE, l), lambda i, ct: (ct[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, EC, l), lambda i, ct: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_expand_kernel(l, interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, EC, l), jnp.float32),
        interpret=interpret,
    )(chunk_tile, local.reshape(c // 8, 8, EC), x.astype(jnp.float32))
    return out.reshape(c * EC, l)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def stream_expand(x, local, chunk_tile, n_pad: int, precision: str,
                  interpret: bool):
    """Differentiable expand over one stream side; VJP is the raw stream
    scatter on the same side (no permutation, no gather)."""
    return _expand_impl(x, local, chunk_tile, interpret)


def _se_fwd(x, local, chunk_tile, n_pad, precision, interpret):
    return _expand_impl(x, local, chunk_tile, interpret), (local, chunk_tile)


def _se_bwd(n_pad, precision, interpret, res, g):
    local, chunk_tile = res
    dx = stream_scatter(g, local, chunk_tile, n_pad, precision=precision,
                        interpret=interpret)
    return (dx, None, None)


stream_expand.defvjp(_se_fwd, _se_bwd)


# ---------------------------------------------------------------------------
# CSC -> CSR corner-turn plan
# ---------------------------------------------------------------------------


class CscCsrPlans(NamedTuple):
    fwd: CornerPlan  # CSC stream order -> CSR (physical edge) order
    inv: CornerPlan


def plan_csc_to_csr(graph, p_cap: int | None = None) -> CscCsrPlans:
    """Bijection from CSC stream slots to CSR edge positions: live slot k
    holds edge c_slot[k]; dead slots fill the CSR dead positions and the
    length difference (E_s2 >= E_s) in order. ``p_cap`` overrides the
    window-span cap (tests force multi-pass plans on small graphs)."""
    if graph.c_slot is None:
        raise ValueError("needs a stream-aligned graph")
    c_slot = np.asarray(graph.c_slot).astype(np.int64)
    c_local = np.asarray(graph.c_local)
    e_s2 = c_slot.shape[0]
    live = c_local < DEAD
    dest = np.full(e_s2, -1, dtype=np.int64)
    dest[live] = c_slot[live]
    used = np.zeros(e_s2, dtype=bool)
    used[c_slot[live]] = True
    dest[~live] = np.nonzero(~used)[0]
    # don't-care rows (unspecified finite outputs): the scattered dead-slot
    # destinations would otherwise blow the window spans. Forward: dead CSC
    # slots land on dead/extension CSR positions (edge_mask kills them).
    # Inverse: CSR rows whose destination is a dead CSC slot (c_local ==
    # DEAD kills them in the CSC-side scatter).
    from pygat_tpu.ops.corner import _P_MAX

    cap = _P_MAX if p_cap is None else p_cap
    fwd = plan_corner_turn(dest, cap, care=live)
    inv_perm = np.empty(e_s2, dtype=np.int64)
    inv_perm[dest] = np.arange(e_s2)
    return CscCsrPlans(fwd=fwd,
                       inv=plan_corner_turn(inv_perm, cap,
                                            care=live[inv_perm]))


_CORNER_MODE = _os.environ.get("PYGAT_CORNER", "auto")
# Crossover node count above which the corner window build would beat the
# XLA row gather. MEASURED round 4 on v5e (BENCH campaign, RESULTS.md
# "take -> corner crossover"): there is NO crossover on this hardware —
# Mosaic cannot lower the in-kernel multi-vreg row take, and the one-hot
# fallback's select cost (~39 ns/row best-cap at 2M rows) exceeds the XLA
# serialized gather (~11.5 ns/row) at every size that fits one chip, so
# 'auto' never selects corner (threshold = +inf). The kernels stay opt-in
# (PYGAT_CORNER=on / PYGAT_CORNER_N override) for hardware whose Mosaic
# lowers multi-vreg gathers.
_CORNER_N = int(_os.environ.get("PYGAT_CORNER_N", str(2 ** 62)))


def set_corner(mode: str) -> None:
    """'auto' (N_pad >= PYGAT_CORNER_N; measured round 4: never on v5e —
    see _CORNER_N), 'on', or 'off' — selects the gather-free corner
    window build for the fused attention layers."""
    global _CORNER_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown corner mode: {mode!r}")
    _CORNER_MODE = mode


def maybe_plan_corner(graph) -> CscCsrPlans | None:
    """CscCsrPlans when the fused layers should build sender windows via
    CSC expand + corner-turn instead of ``jnp.take`` (which XLA serializes
    at ~14 ns/row once the node table exceeds VMEM). None = keep take.
    Plans are static host-side metadata; pass the result to
    ``apply_gat(..., plans=...)`` (ignored whenever the fused kernel is
    off, e.g. under GSPMD multi-device meshes)."""
    if graph.c_slot is None:
        return None
    if _CORNER_MODE == "off":
        return None
    if _CORNER_MODE == "auto" and graph.num_nodes_padded < _CORNER_N:
        return None
    return plan_csc_to_csr(graph)


# ---------------------------------------------------------------------------
# spmm_corner: the uniform-large-graph SpMM
# ---------------------------------------------------------------------------


import functools as _functools

from pygat_tpu.ops.corner import _apply_passes, flatten_plan


@_functools.lru_cache(maxsize=None)
def _spmm_corner_op(ps_fwd: tuple, ps_inv: tuple, mode: str, precision: str,
                    interpret: bool):
    """custom_vjp SpMM over flat plan arrays (cached per static plan
    structure; plan arrays ride as jit ARGUMENTS, never constants).
    Signature: op(values, x, edge_mask, r_local, r_chunk, c_local,
    c_chunk, *fwd_arrays, *inv_arrays)."""
    n_f = 4 * len(ps_fwd)
    exact = precision != "fastest"

    def _fwd_impl(values, x, edge_mask, r_local, r_chunk, c_local, c_chunk,
                  arrs):
        e_s = r_local.shape[0]
        n_pad = x.shape[0]
        ex = _expand_impl(x, c_local, c_chunk, interpret)  # CSC order
        turned = _apply_passes(ex, arrs[:n_f], ps_fwd, mode, interpret,
                               exact)[:e_s]  # CSR order
        v = jnp.where(edge_mask, values, 0.0)
        out = stream_scatter(v[:, None] * turned, r_local, r_chunk, n_pad,
                             precision=precision, interpret=interpret)
        return out, turned

    @jax.custom_vjp
    def op(values, x, edge_mask, r_local, r_chunk, c_local, c_chunk, *arrs):
        return _fwd_impl(values, x, edge_mask, r_local, r_chunk, c_local,
                         c_chunk, arrs)[0]

    def fwd(values, x, edge_mask, r_local, r_chunk, c_local, c_chunk, *arrs):
        out, turned = _fwd_impl(values, x, edge_mask, r_local, r_chunk,
                                c_local, c_chunk, arrs)
        res = (values, edge_mask, r_local, r_chunk, c_local, c_chunk,
               turned, arrs[n_f:])
        return out, res

    def bwd(res, g):
        (values, edge_mask, r_local, r_chunk, c_local, c_chunk, turned,
         inv_arrs) = res
        e_s = r_local.shape[0]
        n_pad = g.shape[0]
        # g gathered per edge (CSR order): receiver side is per-chunk
        # single-tile — the expand kernel again, no row gather
        g_e = _expand_impl(g, r_local, r_chunk, interpret)[:e_s]
        dvalues = jnp.where(edge_mask, jnp.sum(g_e * turned, axis=-1), 0.0)
        # d x: weighted cotangent back to CSC order, CSC-side scatter
        v = jnp.where(edge_mask, values, 0.0)
        wg = v[:, None] * g_e
        e_s2 = c_local.shape[0]
        wg_p = jnp.pad(wg, ((0, e_s2 - e_s), (0, 0)))
        wg_csc = _apply_passes(wg_p, inv_arrs, ps_inv, mode, interpret,
                               exact)
        dx = stream_scatter(wg_csc, c_local, c_chunk, n_pad,
                            precision=precision, interpret=interpret)
        n_arrs = n_f + len(inv_arrs)
        return (dvalues, dx, None, None, None, None, None) + (None,) * n_arrs

    op.defvjp(fwd, bwd)
    return op


def spmm_corner_graph(values, x, graph, plans: CscCsrPlans,
                      *, mode: str | None = None, precision: str = "high",
                      interpret: bool | None = None):
    """out[N, L] = scatter-add over receivers of values * x[senders],
    entirely through expand / corner-turn / stream-scatter kernels —
    forward AND backward gather-free (``values`` in the graph's physical
    edge order)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mode is None:
        from pygat_tpu.ops.corner import default_permute_mode

        mode = default_permute_mode(interpret)
    arr_f, ps_f = flatten_plan(plans.fwd)
    arr_i, ps_i = flatten_plan(plans.inv)
    op = _spmm_corner_op(ps_f, ps_i, mode, precision, interpret)
    return op(values, x, graph.edge_mask, graph.r_local, graph.r_chunk,
              graph.c_local, graph.c_chunk, *arr_f, *arr_i)
