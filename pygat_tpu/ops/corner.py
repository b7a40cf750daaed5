"""Corner-turn: static row permutation of [E, L] arrays at HBM speed.

Million-node graphs need the CSR-order <-> CSC-order move (edge values for
the sender-side backward, gathered features for uniform-graph forwards),
and XLA lowers `x[perm]` to a serialized ~14 ns/row gather once the table
exceeds VMEM (RESULTS.md "Large-graph finding"). A *static* permutation
needs none of that: decompose it at plan time into k stable radix passes
over the destination-tile digits. Stability makes each pass's data motion
LOCAL by construction:

* pass digits have uniform density (each value owns ~1/R of the rows), so
  the 128 rows of any output tile come from a CONTIGUOUS span of ~R input
  tiles — the planner measures the exact worst-case span P;
* the kernel therefore reads P consecutive input tiles via a
  ``lo[t] + p`` BlockSpec (only the [T] ``lo`` array rides in SMEM, not a
  [T, P] panel table) and selects each output row on-chip (VMEM-local
  ``jnp.take`` or a one-hot MXU matmul);
* the final pass composes the within-tile shuffle into its selection, so
  k passes land every row at its exact destination.

Cost: k full read+write sweeps of the array (k = ceil(log_R T), R ~ 40
=> k = 3 at 8M rows) — ~16 ms at v5e roofline for an [8.5M, 64] f32
array vs ~120 ms for the serialized gather.

The backward of a permutation is the inverse permutation — another plan,
same kernel (``permute_rows`` carries both).

Replaces the implicit torch gather in the reference's SpecialSpmm backward
(reference layers.py:85-90) at scales the reference cannot reach.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
MXU_PREC = jax.lax.Precision.DEFAULT  # see ops/stream.py:MXU_PREC


def default_permute_mode(interpret: bool) -> str:
    """Row-selection mode for the permute kernels.

    'take' (VMEM dynamic_gather) does NOT lower on compiled TPU here:
    Mosaic rejects gathers spanning more than one sublane vreg ("Multiple
    source vregs along gather dimension", measured on v5e round 4 — a
    [128, L] row take from a [p*128, L] window needs 16 source vregs).
    One-hot MXU selection compiles everywhere, so it is the compiled
    default; interpret mode (CPU tests) keeps the cheap take. Override
    with PYGAT_CORNER_PERMUTE=take|onehot."""
    import os

    env = os.environ.get("PYGAT_CORNER_PERMUTE", "")
    if env in ("take", "onehot"):
        return env
    return "take" if interpret else "onehot"


# Window-span cap. The radix R is ~T^(1/k) but a tile's measured span is
# R +- ~R/sqrt(128) (order statistics of 128 uniform draws), so the cap
# needs ~4-sigma slack over R or a few tail rows per tile overflow
# (measured: cap 44 with R=42 overflowed 4.6% of rows at 500k-uniform;
# cap 56 leaves ~0). VMEM at the cap: 56*128*L*4B*2buf ~ 3.7 MB at L=64.
_P_MAX = 56


class CornerPass(NamedTuple):
    lo: jax.Array  # [T] int32 first input tile of each output tile's window
    g: jax.Array  # [T//8, 8, TILE] int32 source offset within the window
    p: int  # static window (input tiles per output tile)
    # rows whose source falls outside the capped window (radix-GROUP
    # boundary tiles on structured permutations — measured up to span 145
    # at 500k-clustered where uniform-density theory says ~R): fixed up by
    # a tiny XLA pass after the kernel. Padded with duplicates of pair 0.
    ov_src: jax.Array  # [V] int32 source position
    ov_dst: jax.Array  # [V] int32 destination position
    n_overflow: int


class CornerPlan(NamedTuple):
    passes: tuple[CornerPass, ...]
    n_rows: int

    @property
    def overflow_total(self) -> int:
        return sum(cp.n_overflow for cp in self.passes)


def _window_cover(src_tile_rows: np.ndarray, p: int) -> int:
    """Best window start (tile id) covering the most of the 128 sorted
    source tiles; rows are few, a sliding two-pointer scan suffices."""
    s = np.sort(src_tile_rows)
    best, best_lo, j = -1, int(s[0]), 0
    for i in range(s.shape[0]):
        while s[i] - s[j] >= p:
            j += 1
        if i - j + 1 > best:
            best, best_lo = i - j + 1, int(s[i]) - p + 1
    return max(best_lo, 0)


def _pack_pass(src: np.ndarray, real: np.ndarray, p_cap: int) -> CornerPass:
    """Window/overflow layout for one pass: ``src[j]`` = input position of
    output position j (``real`` False on group-alignment pad slots, whose
    output rows are garbage never consumed downstream)."""
    e_out = src.shape[0]
    t = e_out // TILE
    t_in = int(src[real].max()) // TILE + 1 if real.any() else 1
    j_tile = np.arange(e_out, dtype=np.int64) // TILE
    src_tile = src // TILE
    big = np.iinfo(np.int64).max
    lo = np.full(t, big)
    hi = np.zeros(t, dtype=np.int64)
    np.minimum.at(lo, j_tile[real], src_tile[real])
    np.maximum.at(hi, j_tile[real], src_tile[real])
    lo[lo == big] = 0  # all-pad tiles
    span = hi - lo + 1
    p = int(span.max())
    if p > p_cap:
        # re-window the rare wide tiles around their densest p_cap-tile
        # run; leftovers overflow to the XLA fix-up pass
        for tt in np.nonzero(span > p_cap)[0]:
            rows = src_tile[tt * TILE:(tt + 1) * TILE][real[tt * TILE:(tt + 1) * TILE]]
            lo[tt] = min(_window_cover(rows, p_cap), max(t_in - p_cap, 0))
        p = p_cap
    in_win = real & (src_tile >= lo[j_tile]) & (src_tile < lo[j_tile] + p)
    g = np.where(in_win, src - lo[j_tile] * TILE, 0).astype(np.int32)
    ov = np.nonzero(real & ~in_win)[0]
    n_ov = ov.shape[0]
    v = max(-(-max(n_ov, 1) // TILE) * TILE, TILE)
    # padding entries duplicate a true (src, dst) pair (idempotent set)
    pad_src, pad_dst = (src[ov[0]], ov[0]) if n_ov else (src[0], 0)
    ov_src = np.full(v, pad_src, np.int64)
    ov_dst = np.full(v, pad_dst, np.int64)
    ov_src[:n_ov] = src[ov]
    ov_dst[:n_ov] = ov
    g8 = (np.pad(g, (0, (-t % 8) * TILE)).reshape(-1, 8, TILE)
          if t % 8 else g.reshape(t // 8, 8, TILE))
    return CornerPass(
        lo=jnp.asarray(lo.astype(np.int32)),
        g=jnp.asarray(g8),
        p=p,
        ov_src=jnp.asarray(ov_src.astype(np.int32)),
        ov_dst=jnp.asarray(ov_dst.astype(np.int32)),
        n_overflow=n_ov,
    )


def plan_corner_turn(dest: np.ndarray, p_cap: int = _P_MAX,
                     care: np.ndarray | None = None) -> CornerPlan:
    """Plan the permutation ``out[dest[i]] = x[i]`` (``dest`` a bijection
    on [0, E)); E must be a multiple of 128.

    MSD prefix passes: pass pk stable-sorts rows by the high prefix
    ``dest_tile // R^(k-1-pk)``, REFINING the previous pass's groups, so
    sources stay contiguous-windowed for uniform (span ~R) AND
    nearly-sorted (span ~1) permutations; intermediate groups are
    128-row-aligned so tiles never straddle groups.

    ``care`` (bool [E], default all-True): rows with care=False get an
    UNSPECIFIED (but finite) output value and are excluded from window
    planning — stream-padding slots whose destinations are scattered
    would otherwise blow tile spans (measured: the ~4% dead slots caused
    ~1% row overflow at 500k)."""
    dest = np.asarray(dest, dtype=np.int64)
    e = dest.shape[0]
    if e % TILE:
        raise ValueError(f"rows ({e}) must be a multiple of {TILE}")
    if care is None:
        care = np.ones(e, dtype=bool)
    t = e // TILE
    k = max(1, math.ceil(math.log(max(t, 2)) / math.log(p_cap)))
    r = math.ceil(t ** (1.0 / k))

    row_pos = np.arange(e, dtype=np.int64)  # current position of each row
    passes = []
    for pk in range(k):
        if pk < k - 1:
            key = (dest // TILE) // (r ** (k - 1 - pk))  # per ROW
            order = np.lexsort((row_pos, key))  # stable within key
            counts = np.bincount(key, minlength=int(key.max()) + 1)
            nz = counts > 0
            padded = -(-counts // TILE) * TILE
            base = np.concatenate([[0], np.cumsum(padded)[:-1]])
            rank = np.empty(e, dtype=np.int64)
            rank[order] = np.arange(e) - np.repeat(
                np.concatenate([[0], np.cumsum(counts[nz])[:-1]]), counts[nz]
            )
            new_pos = base[key] + rank
            e_out = int(padded.sum())
        else:
            new_pos = dest
            e_out = e
        src = np.zeros(e_out, dtype=np.int64)
        real = np.zeros(e_out, dtype=bool)
        src[new_pos] = row_pos
        real[new_pos] = care
        passes.append(_pack_pass(src, real, p_cap))
        row_pos = new_pos
    return CornerPlan(passes=tuple(passes), n_rows=e)


def _rounder(interpret: bool):
    if interpret:
        return lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    return lambda x: x.astype(jnp.bfloat16)


def _make_permute_kernel(p: int, l: int, mode: str, interpret: bool,
                         exact: bool):
    vr = _rounder(interpret)

    def kernel(lo_ref, g_ref, *refs):
        panel_refs, out_ref = refs[:p], refs[p]
        t = pl.program_id(0)
        g = g_ref[0, t % 8, :]  # [TILE] source offsets within the span
        if mode == "take":
            # Mosaic's only gather lowering is the same-shape
            # take_along_axis form (tpu.dynamic_gather); a [p*TILE, l] ->
            # [TILE, l] row take is rejected ("Shape mismatch in input,
            # indices and output"). Gather each TILE-row panel with
            # clamped per-lane indices and select the owning panel. Only
            # rows with g >= p*TILE stay 0 here; out-of-WINDOW rows are
            # encoded g=0 by _pack_pass, so they read panel-0 row 0 (NOT
            # 0) and rely entirely on the ov fix-up / never-consumed
            # guarantee — do not build logic on those rows being zero.
            gcol = jnp.broadcast_to(g[:, None], (TILE, l))
            out = jnp.zeros((TILE, l), jnp.float32)
            for k in range(p):
                pk = panel_refs[k][...].astype(jnp.float32)
                lidx = jnp.clip(gcol - k * TILE, 0, TILE - 1)
                got = jnp.take_along_axis(pk, lidx, axis=0,
                                          mode="promise_in_bounds")
                own = (gcol >= k * TILE) & (gcol < (k + 1) * TILE)
                out = jnp.where(own, got, out)
            out_ref[:] = out
        else:
            panels = jnp.concatenate([r[...] for r in panel_refs], axis=0)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE, p * TILE), 1)
            ohf = (lanes == g[:, None]).astype(jnp.float32)
            if exact:
                # exact mode: one f32 dot at HIGHEST — a permutation must
                # return the values bit-exactly. (The old two-bf16-limb
                # split only kept ~16 mantissa bits, and Mosaic's DEFAULT
                # on f32 operands is a single lossy bf16 pass.)
                out = jnp.dot(ohf, panels.astype(jnp.float32),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            else:
                out = jnp.dot(vr(ohf), vr(panels),
                              preferred_element_type=jnp.float32,
                              precision=MXU_PREC)
            out_ref[:] = out

    return kernel


def _one_pass_arrays(x, lo, g, p: int, mode: str, interpret: bool,
                     exact: bool):
    """Permute rows of ``x`` [E_in, L] into [E_out, L] (E_out = 128 *
    lo.shape[0]; lengths differ when intermediate groups carry alignment
    padding)."""
    l = x.shape[1]
    t_in = x.shape[0] // TILE
    t = lo.shape[0]
    spec_g = pl.BlockSpec((1, 8, TILE), lambda i, lo: (i // 8, 0, 0))

    def _panel_spec(kk):
        return pl.BlockSpec(
            (TILE, l),
            lambda i, lo, kk=kk: (jnp.minimum(lo[i] + kk, t_in - 1), 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[spec_g] + [_panel_spec(kk) for kk in range(p)],
        out_specs=pl.BlockSpec((TILE, l), lambda i, lo: (i, 0)),
    )
    return pl.pallas_call(
        _make_permute_kernel(p, l, mode, interpret, exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * TILE, l), jnp.float32),
        interpret=interpret,
    )(lo, g, *([x] * p))


def _apply_passes(x, arrs, ps, mode, interpret, exact):
    out = x.astype(jnp.float32)
    for k, p in enumerate(ps):
        lo, g, ov_src, ov_dst = arrs[4 * k:4 * k + 4]
        src = out
        out = _one_pass_arrays(src, lo, g, p, mode, interpret, exact)
        # out-of-window rows (rare re-windowed tiles): tiny exact fix-up;
        # padding entries are duplicates of a true (src, dst) pair
        out = out.at[ov_dst].set(src[ov_src])
    return out


def flatten_plan(plan: CornerPlan):
    """(arrays, static pass spans) — arrays go through jit as ARGUMENTS
    (at million-edge scale the [E] g arrays must never be closure
    constants: CLAUDE.md measurement rules)."""
    return (
        tuple(a for cp in plan.passes
              for a in (cp.lo, cp.g, cp.ov_src, cp.ov_dst)),
        tuple(cp.p for cp in plan.passes),
    )


def corner_permute(x: jax.Array, plan: CornerPlan, *, mode: str | None = None,
                   interpret: bool | None = None,
                   precision: str = "high") -> jax.Array:
    """out[dest[i]] = x[i] for the permutation the plan was built from.
    ``mode='take'`` selects rows with a VMEM-local gather (interpret-only,
    see default_permute_mode); ``'onehot'`` uses MXU matmuls
    (``precision='high'`` keeps f32 via two bf16 limbs).
    Not differentiable — use permute_rows."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mode is None:
        mode = default_permute_mode(interpret)
    if x.shape[0] != plan.n_rows:
        raise ValueError(f"x rows {x.shape[0]} != plan rows {plan.n_rows}")
    arrs, ps = flatten_plan(plan)
    return _apply_passes(x, arrs, ps, mode, interpret,
                         precision != "fastest")


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _permute_op(ps_fwd: tuple, ps_inv: tuple, mode: str, exact: bool,
                interpret: bool):
    """custom_vjp op over flat plan arrays (cached per static structure).
    Signature: op(x, *fwd_arrays, *inv_arrays); backward applies the
    inverse passes to the cotangent."""
    n_f = 4 * len(ps_fwd)

    @jax.custom_vjp
    def op(x, *arrs):
        return _apply_passes(x, arrs[:n_f], ps_fwd, mode, interpret, exact)

    def fwd(x, *arrs):
        return op(x, *arrs), arrs[n_f:]

    def bwd(res, g):
        dx = _apply_passes(g, res, ps_inv, mode, interpret, exact)
        return (dx,) + (None,) * (n_f + len(res))

    op.defvjp(fwd, bwd)
    return op


def permute_rows(x, plan: CornerPlan, plan_inv: CornerPlan,
                 mode: str | None = None, *, interpret: bool | None = None,
                 precision: str = "high"):
    """Differentiable corner-turn: backward applies the inverse plan."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mode is None:
        mode = default_permute_mode(interpret)
    arr_f, ps_f = flatten_plan(plan)
    arr_i, ps_i = flatten_plan(plan_inv)
    op = _permute_op(ps_f, ps_i, mode, precision != "fastest", interpret)
    return op(x, *arr_f, *arr_i)


def plan_pair(dest: np.ndarray) -> tuple[CornerPlan, CornerPlan]:
    """(forward, inverse) plans for ``out[dest[i]] = x[i]``."""
    dest = np.asarray(dest, dtype=np.int64)
    inv = np.empty_like(dest)
    inv[dest] = np.arange(dest.shape[0])
    return plan_corner_turn(dest), plan_corner_turn(inv)
