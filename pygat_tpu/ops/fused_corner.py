"""Gather-free fused attention for million-node graphs.

The fused stream kernels (ops/fused_stream.py) are gather-free INSIDE the
kernel, but their [E, HF] sender windows are built by ``jnp.take(wh,
senders)`` — and XLA serializes that row gather at ~14 ns/row once the
node table exceeds VMEM (RESULTS.md "Large-graph finding"), capping every
sparse layer at ~20 GB/s above a few hundred thousand nodes. This module
swaps exactly that step for the uniform-large-graph machinery:

* sender windows:  ``stream_expand`` over the CSC (sender-sorted) layout —
  each 256-slot chunk reads ONE 128-row tile of ``wh`` (the stream
  contract), no row gather — then a corner-turn (ops/corner.py) moves the
  expanded rows from CSC order to the receiver-stream order the fused
  kernel consumes, at HBM speed;
* receiver-side operands in the backward: the same expand kernel over the
  receiver stream layout (receivers ascend, so chunks are single-tile);
* sender-side reductions in the backward: inverse corner-turn back to CSC
  order + the plain stream scatter — replacing the ``take(data, c_slot)``
  inside ``stream_sender_segment_sum``.

The Pallas attention kernels themselves are shared with ops/fused_stream
(_make_v1_kernel / _make_v2_kernel); only the window construction and the
VJP data movement differ. Edge ids (senders / receivers / c_slot) never
appear in the compiled program at all — the stream layouts plus the static
corner plans carry the whole graph structure.

Use :func:`pygat_tpu.ops.large.plan_csc_to_csr` to build the plans once
per graph; the layers accept them via ``plans=`` (models/layers.py) and
route here when set. (The in-kernel-RNG twins were deleted in round 4:
measured delta vs the [E, H] mask path was noise-level, ~0.1 ms on Pubmed.)

Reference counterpart: the torch gather feeding SpecialSpmm
(reference layers.py:141-160) at scales the reference cannot reach.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp

from pygat_tpu.ops.corner import _apply_passes, default_permute_mode, flatten_plan
from pygat_tpu.ops.fused_stream import (
    _block_diag_a,
    _const_spec,
    _expand_bd,
    _grid_call,
    _leaky,
    _make_v1_kernel,
    _make_v2_kernel,
    _tile_spec,
    _win_dtype,
    _window_spec,
)
from pygat_tpu.ops.large import CscCsrPlans, _expand_impl
from pygat_tpu.ops.stream import EC, TILE, stream_scatter



def _gather_corner(x, c_local, c_chunk, arrs_f, ps_f, e_pad: int,
                   interpret: bool, exact: bool):
    """``x[senders]`` in receiver-stream order [e_pad, L] without any row
    gather: CSC expand (per-chunk single-tile) + forward corner-turn."""
    ex = _expand_impl(x, c_local, c_chunk, interpret)  # [E_s2, L] CSC order
    return _apply_passes(ex, arrs_f, ps_f, default_permute_mode(interpret),
                         interpret, exact)[:e_pad]


def _scatter_corner(g_e, c_local, c_chunk, arrs_i, ps_i, n_pad: int,
                    precision: str, interpret: bool, exact: bool):
    """Per-sender segment sum of receiver-stream-ordered ``g_e`` [e_pad, L]
    without the ``take(data, c_slot)`` inside stream_sender_segment_sum:
    inverse corner-turn to CSC order + plain stream scatter. Rows landing
    at dead CSC slots are killed by the scatter's one-hot."""
    e_s2 = c_local.shape[0]
    g_p = jnp.pad(g_e, ((0, e_s2 - g_e.shape[0]), (0, 0)))
    g_csc = _apply_passes(g_p, arrs_i, ps_i, default_permute_mode(interpret),
                          interpret, exact)
    return stream_scatter(g_csc, c_local, c_chunk, n_pad,
                          precision=precision, interpret=interpret)


# ---------------------------------------------------------------------------
# v1
# ---------------------------------------------------------------------------


def _v1_bwd_body(ps_fwd, ps_inv, alpha, precision, interpret, res, cts):
    """Shared backward of the v1 corner op (keepq rides in the residuals):
    lane-minor recompute, every edge-indexed move through expand /
    corner-turn / stream kernels."""
    n_f = 4 * len(ps_fwd)
    exact = precision != "fastest"
    prec = "high" if exact else "fastest"
    (wh, f_dst, bound, a_src, keepq, r_local, r_chunk, c_local,
     c_chunk) = res[:9]
    arrs = res[9:]
    g_out, g_den = cts
    n_pad, hf = wh.shape
    h, f = a_src.shape
    e = r_local.shape[0]

    g_w = _gather_corner(wh, c_local, c_chunk, arrs[:n_f], ps_fwd, e,
                         interpret, exact)  # [E, HF]
    abd = _block_diag_a(a_src)
    exp_bd = _expand_bd(h, f)
    l_src = g_w @ abd  # [E, H]
    # all four receiver-side operands in ONE expand (single-tile chunks)
    eall = _expand_impl(
        jnp.concatenate([f_dst, bound, g_out, g_den], axis=1),
        r_local, r_chunk, interpret)  # [E, 2H + HF + H]
    fde = eall[:, :h]
    bnd = eall[:, h:2 * h]
    dmsg = eall[:, 2 * h:2 * h + hf]
    dden = eall[:, 2 * h + hf:]
    raw = fde + l_src
    live = (r_local < TILE)[:, None]
    num = jnp.where(live, jnp.exp(_leaky(raw, alpha) - bnd), 0.0)
    qnum = num * keepq

    dqnum = (dmsg * g_w) @ exp_bd.T  # [E, H]
    dnum = dqnum * keepq + dden
    draw = dnum * num * jnp.where(raw >= 0, 1.0, alpha)
    df_dst = stream_scatter(draw, r_local, r_chunk, n_pad,
                            precision=prec, interpret=interpret)
    dgathered = dmsg * (qnum @ exp_bd) + draw @ abd.T  # [E, HF]
    dwh = _scatter_corner(dgathered, c_local, c_chunk, arrs[n_f:], ps_inv,
                          n_pad, prec, interpret, exact)
    da = jnp.sum(g_w * (draw @ exp_bd), axis=0).reshape(h, f)
    return (dwh, df_dst, None, da, None, None, None, None, None) + \
        (None,) * len(arrs)


@_functools.lru_cache(maxsize=None)
def _v1_corner_op(ps_fwd: tuple, ps_inv: tuple, alpha: float,
                  precision: str, interpret: bool):
    """custom_vjp fused-v1 attention over flat corner-plan arrays (cached
    per static plan structure; plan arrays ride as jit ARGUMENTS).
    Signature: op(wh, f_dst, bound, a_src, keepq, r_local, r_chunk,
    c_local, c_chunk, *fwd_arrays, *inv_arrays) -> (out [N, HF],
    den [N, H])."""
    n_f = 4 * len(ps_fwd)
    exact = precision != "fastest"

    def _fwd_impl(wh, f_dst, bound, a_src, keepq, r_local, r_chunk,
                  c_local, c_chunk, arrs):
        n_pad, hf = wh.shape
        h, f = a_src.shape
        e = r_local.shape[0]
        wdt = _win_dtype(precision)
        gathered = _gather_corner(wh, c_local, c_chunk, arrs[:n_f], ps_fwd,
                                  e, interpret, exact).astype(wdt)
        fdb = jnp.concatenate([f_dst, bound], axis=1)  # [N, 2H]
        abd = _block_diag_a(a_src.astype(wdt))
        exp_bd = _expand_bd(h, f)
        local8 = r_local.reshape(e // EC // 8, 8, EC)
        return _grid_call(
            _make_v1_kernel(alpha, h, hf, exact, interpret),
            r_chunk,
            [_window_spec(hf), _window_spec(h)],
            [gathered.reshape(e // EC, EC, hf), keepq.reshape(e // EC, EC, h)],
            [_tile_spec(2 * h)], [fdb],
            [_const_spec(hf, h), _const_spec(h, hf)], [abd, exp_bd],
            local8, n_pad, hf, h, interpret,
        )

    @jax.custom_vjp
    def op(wh, f_dst, bound, a_src, keepq, r_local, r_chunk, c_local,
           c_chunk, *arrs):
        return _fwd_impl(wh, f_dst, bound, a_src, keepq, r_local, r_chunk,
                         c_local, c_chunk, arrs)

    def fwd(wh, f_dst, bound, a_src, keepq, r_local, r_chunk, c_local,
            c_chunk, *arrs):
        out = _fwd_impl(wh, f_dst, bound, a_src, keepq, r_local, r_chunk,
                        c_local, c_chunk, arrs)
        return out, (wh, f_dst, bound, a_src, keepq, r_local, r_chunk,
                     c_local, c_chunk) + arrs

    def bwd(res, cts):
        return _v1_bwd_body(ps_fwd, ps_inv, alpha, precision, interpret,
                            res, cts)

    op.defvjp(fwd, bwd)
    return op




def fused_v1_attention_corner(wh, f_dst, bound, a_src, keepq, graph,
                              plans: CscCsrPlans, *, alpha: float,
                              precision: str, interpret: bool):
    """Drop-in for :func:`pygat_tpu.ops.fused_stream.fused_v1_attention`
    with NO serialized row gather anywhere (forward or backward); needs the
    graph's stream layouts plus corner plans from ``plan_csc_to_csr``."""
    arr_f, ps_f = flatten_plan(plans.fwd)
    arr_i, ps_i = flatten_plan(plans.inv)
    op = _v1_corner_op(ps_f, ps_i, float(alpha), precision, interpret)
    return op(wh, f_dst, bound, a_src, keepq, graph.r_local, graph.r_chunk,
              graph.c_local, graph.c_chunk, *arr_f, *arr_i)


# ---------------------------------------------------------------------------
# v2
# ---------------------------------------------------------------------------


def _v2_bwd_body(ps_fwd, ps_inv, alpha, precision, interpret, res, cts):
    """Shared backward of the v2 corner ops (see _v1_bwd_body)."""
    n_f = 4 * len(ps_fwd)
    exact = precision != "fastest"
    prec = "high" if exact else "fastest"
    (whi, whj, ub, a, keepq, r_local, r_chunk, c_local, c_chunk) = res[:9]
    arrs = res[9:]
    g_out, g_den = cts
    n_pad, hf = whi.shape
    h, f = a.shape
    e = r_local.shape[0]

    gjgi = _gather_corner(jnp.concatenate([whj, whi], axis=1),
                          c_local, c_chunk, arrs[:n_f], ps_fwd, e,
                          interpret, exact)
    gj = gjgi[:, :hf]
    gi = gjgi[:, hf:]
    eall = _expand_impl(
        jnp.concatenate([whi, ub, g_out, g_den], axis=1),
        r_local, r_chunk, interpret)  # [E, HF + H + HF + H]
    wi_e = eall[:, :hf]
    ub_e = eall[:, hf:hf + h]
    dmsg = eall[:, hf + h:2 * hf + h]
    dden = eall[:, 2 * hf + h:]
    raw = wi_e + gj
    pre = _leaky(raw, alpha)
    abd = _block_diag_a(a)
    exp_bd = _expand_bd(h, f)
    live = (r_local < TILE)[:, None]
    logits = pre @ abd
    num = jnp.where(live, jnp.exp(logits - ub_e), 0.0)
    qnum = num * keepq

    dqnum = (dmsg * gi) @ exp_bd.T
    dnum = dqnum * keepq + dden
    dlogits = dnum * num
    dpre = (dlogits @ abd.T) * jnp.where(raw >= 0, 1.0, alpha)  # [E, HF]

    # receiver side: d whi from the logit path
    dwhi_e = stream_scatter(dpre, r_local, r_chunk, n_pad,
                            precision=prec, interpret=interpret)
    # sender side: ONE inverse turn + scatter for both cotangents
    dmsg_s = dmsg * (qnum @ exp_bd)
    both = jnp.concatenate([dpre, dmsg_s], axis=1)  # [E, 2HF]
    red = _scatter_corner(both, c_local, c_chunk, arrs[n_f:], ps_inv,
                          n_pad, prec, interpret, exact)
    dwhj = red[:, :hf]
    dwhi = dwhi_e + red[:, hf:]
    da = jnp.sum(pre * (dlogits @ exp_bd), axis=0).reshape(h, f)
    return (dwhi, dwhj, None, da, None, None, None, None, None) + \
        (None,) * len(arrs)


@_functools.lru_cache(maxsize=None)
def _v2_corner_op(ps_fwd: tuple, ps_inv: tuple, alpha: float,
                  precision: str, interpret: bool):
    """custom_vjp fused-v2 attention over flat corner-plan arrays.
    Signature: op(whi, whj, ub, a, keepq, r_local, r_chunk, c_local,
    c_chunk, *fwd_arrays, *inv_arrays) -> (out [N, HF], den [N, H])."""
    n_f = 4 * len(ps_fwd)
    exact = precision != "fastest"

    def _fwd_impl(whi, whj, ub, a, keepq, r_local, r_chunk, c_local,
                  c_chunk, arrs):
        n_pad, hf = whi.shape
        h, f = a.shape
        e = r_local.shape[0]
        wdt = _win_dtype(precision)
        # ONE expand+turn for both sender windows (lanes 2*HF)
        gjgi = _gather_corner(jnp.concatenate([whj, whi], axis=1),
                              c_local, c_chunk, arrs[:n_f], ps_fwd, e,
                              interpret, exact)
        gj = gjgi[:, :hf].astype(wdt)
        gi = gjgi[:, hf:].astype(wdt)
        wiub = jnp.concatenate([whi, ub], axis=1)  # [N, HF + H]
        abd = _block_diag_a(a.astype(wdt))
        exp_bd = _expand_bd(h, f)
        local8 = r_local.reshape(e // EC // 8, 8, EC)
        return _grid_call(
            _make_v2_kernel(alpha, h, hf, exact, interpret),
            r_chunk,
            [_window_spec(hf), _window_spec(hf), _window_spec(h)],
            [gj.reshape(e // EC, EC, hf), gi.reshape(e // EC, EC, hf),
             keepq.reshape(e // EC, EC, h)],
            [_tile_spec(hf + h)], [wiub],
            [_const_spec(hf, h), _const_spec(h, hf)], [abd, exp_bd],
            local8, n_pad, hf, h, interpret,
        )

    @jax.custom_vjp
    def op(whi, whj, ub, a, keepq, r_local, r_chunk, c_local, c_chunk,
           *arrs):
        return _fwd_impl(whi, whj, ub, a, keepq, r_local, r_chunk, c_local,
                         c_chunk, arrs)

    def fwd(whi, whj, ub, a, keepq, r_local, r_chunk, c_local, c_chunk,
            *arrs):
        out = _fwd_impl(whi, whj, ub, a, keepq, r_local, r_chunk, c_local,
                        c_chunk, arrs)
        return out, (whi, whj, ub, a, keepq, r_local, r_chunk, c_local,
                     c_chunk) + arrs

    def bwd(res, cts):
        return _v2_bwd_body(ps_fwd, ps_inv, alpha, precision, interpret,
                            res, cts)

    op.defvjp(fwd, bwd)
    return op




def fused_v2_attention_corner(whi, whj, ub, a, keepq, graph,
                              plans: CscCsrPlans, *, alpha: float,
                              precision: str, interpret: bool):
    """Drop-in for :func:`pygat_tpu.ops.fused_stream.fused_v2_attention`
    with NO serialized row gather anywhere (forward or backward)."""
    arr_f, ps_f = flatten_plan(plans.fwd)
    arr_i, ps_i = flatten_plan(plans.inv)
    op = _v2_corner_op(ps_f, ps_i, float(alpha), precision, interpret)
    return op(whi, whj, ub, a, keepq, graph.r_local, graph.r_chunk,
              graph.c_local, graph.c_chunk, *arr_f, *arr_i)
