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
_P_MAX = 44  # panel span cap: keeps P*128*L*4 (*2 buffers) well under VMEM


class CornerPass(NamedTuple):
    lo: jax.Array  # [T] int32 first input tile of each output tile's span
    g: jax.Array  # [T//8, 8, TILE] int32 source offset within the span
    p: int  # static span (input tiles per output tile)


class CornerPlan(NamedTuple):
    passes: tuple[CornerPass, ...]
    n_rows: int


def plan_corner_turn(dest: np.ndarray) -> CornerPlan:
    """Plan the permutation ``out[dest[i]] = x[i]`` (``dest`` a bijection
    on [0, E)); E must be a multiple of 128."""
    dest = np.asarray(dest, dtype=np.int64)
    e = dest.shape[0]
    if e % TILE:
        raise ValueError(f"rows ({e}) must be a multiple of {TILE}")
    t = e // TILE
    k = max(1, math.ceil(math.log(max(t, 2)) / math.log(_P_MAX)))
    r = math.ceil(t ** (1.0 / k))

    order = np.arange(e, dtype=np.int64)  # row id at each current position
    pos_of = np.arange(e, dtype=np.int64)  # current position of each row
    final_order = np.argsort(dest, kind="stable")  # row at each dest pos
    passes = []
    j_tile = np.arange(e, dtype=np.int64) // TILE
    for pk in range(k):
        if pk < k - 1:
            key = (dest[order] // TILE) // (r ** pk) % r
            new_order = order[np.argsort(key, kind="stable")]
        else:
            new_order = final_order
        src = pos_of[new_order]  # source position per new position
        src_tile = src // TILE
        lo = np.full(t, np.iinfo(np.int64).max)
        hi = np.zeros(t, dtype=np.int64)
        np.minimum.at(lo, j_tile, src_tile)
        np.maximum.at(hi, j_tile, src_tile)
        p = int((hi - lo + 1).max())
        g = (src - lo[j_tile] * TILE).astype(np.int32)
        passes.append(CornerPass(
            lo=jnp.asarray(lo.astype(np.int32)),
            g=jnp.asarray(g.reshape(t // 8, 8, TILE)) if t % 8 == 0
            else jnp.asarray(np.pad(g, (0, (8 - t % 8) * TILE)).reshape(-1, 8, TILE)),
            p=p,
        ))
        order = new_order
        pos_of = np.empty(e, dtype=np.int64)
        pos_of[order] = np.arange(e)
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
        panels = jnp.concatenate([r[...] for r in panel_refs], axis=0)
        if mode == "take":
            out_ref[:] = jnp.take(panels, g, axis=0).astype(jnp.float32)
        else:
            lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE, p * TILE), 1)
            ohf = (lanes == g[:, None]).astype(jnp.float32)
            if exact:  # permutation rows are 0/1-exact even in bf16,
                # but the VALUES need f32: split-limb the panels
                hi = _split_hi(panels)
                out = jnp.dot(vr(ohf), vr(hi),
                              preferred_element_type=jnp.float32)
                out = out + jnp.dot(vr(ohf), vr(panels - hi),
                                    preferred_element_type=jnp.float32)
            else:
                out = jnp.dot(vr(ohf), vr(panels),
                              preferred_element_type=jnp.float32)
            out_ref[:] = out

    return kernel


def _split_hi(x):
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )


def _one_pass_arrays(x, lo, g, p: int, mode: str, interpret: bool,
                     exact: bool):
    e, l = x.shape
    t = e // TILE
    spec_g = pl.BlockSpec((1, 8, TILE), lambda i, lo: (i // 8, 0, 0))

    def _panel_spec(kk):
        return pl.BlockSpec(
            (TILE, l),
            lambda i, lo, kk=kk: (jnp.minimum(lo[i] + kk, t - 1), 0),
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
        out_shape=jax.ShapeDtypeStruct((e, l), jnp.float32),
        interpret=interpret,
    )(lo, g, *([x] * p))


def _apply_passes(x, arrs, ps, mode, interpret, exact):
    out = x.astype(jnp.float32)
    for k, p in enumerate(ps):
        out = _one_pass_arrays(out, arrs[2 * k], arrs[2 * k + 1], p, mode,
                               interpret, exact)
    return out


def flatten_plan(plan: CornerPlan):
    """(arrays, static pass spans) — arrays go through jit as ARGUMENTS
    (at million-edge scale the [E] g arrays must never be closure
    constants: CLAUDE.md measurement rules)."""
    return (
        tuple(a for cp in plan.passes for a in (cp.lo, cp.g)),
        tuple(cp.p for cp in plan.passes),
    )


def corner_permute(x: jax.Array, plan: CornerPlan, *, mode: str = "take",
                   interpret: bool | None = None,
                   precision: str = "high") -> jax.Array:
    """out[dest[i]] = x[i] for the permutation the plan was built from.
    ``mode='take'`` selects rows with a VMEM-local gather; ``'onehot'``
    uses MXU matmuls (``precision='high'`` keeps f32 via two bf16 limbs).
    Not differentiable — use permute_rows."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
    n_f = 2 * len(ps_fwd)

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
                 mode: str = "take", *, interpret: bool | None = None,
                 precision: str = "high"):
    """Differentiable corner-turn: backward applies the inverse plan."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
