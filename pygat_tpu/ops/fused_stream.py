"""Fused sparse-GAT attention inside the stream-scatter kernel.

Round-2 profiling showed the stream path's remaining per-layer cost is NOT
the segment reduction (ops/stream.py already runs it on the MXU) but the
XLA ops around it: per-edge logits, exp, dropout-numerator and the [E, HF]
message build each round-trip HBM, and mixing [H, E] attention tensors
with [E, HF] feature tensors costs ~2 ms/step of pure relayout on Pubmed
(RESULTS.md). This module moves the whole per-edge pipeline — sender-logit
derivation, receiver gather, LeakyReLU, bound-shifted exp, attention
dropout, message scaling AND the scatter — into one Pallas kernel per
direction, so the only [E, *] tensors that ever touch HBM are the gathered
feature windows (whose XLA gather fuses with the projection producer) and
the [E, H] dropout keep factors.

Per 256-edge chunk (same stream layout the scatter kernel uses — chunks
are receiver-sorted and land in ONE 128-row output tile):

* ``oh``/``ohT`` one-hot matrices from the chunk-local row ids turn BOTH
  the receiver-side gather (``ohT @ tile_block``) and the scatter
  (``oh @ msgs``) into MXU matmuls — per-node operands are fetched as the
  chunk's 128-row TILE BLOCK via the ``chunk_tile`` index map, never
  through a serial row gather;
* the sender logit component is an ``[EC, HF] @ [HF, H]`` matmul against
  the block-diagonal attention vector (v1) or of the LeakyReLU'd pre-sum
  against it (v2);
* head->lane broadcast of the [EC, H] numerators onto [EC, H*F] message
  lanes is another one-hot matmul (``@ [H, HF]``);
* dead slots (stream padding) carry local == 128: both one-hots are zero
  there, so padding never reaches either output — no edge-mask tensor is
  needed in the kernel at all.

Outputs per direction: the aggregated numerator [N, HF] and the
PRE-dropout denominator [N, H] (reference order: dropout multiplies the
aggregation numerator only, reference layers.py:150-160).

The custom VJP recomputes the per-edge pipeline in XLA but entirely in
LANE-MINOR layouts ([E, H] / [E, HF] — no [H, E] tensor anywhere, which is
what made the autodiff backward relayout-bound) and feeds the stream
scatter kernel for both the per-receiver and per-sender reductions.

Replaces the reference pipeline at layers.py:141-160 (and its v2 twin at
layers.py:278-296) for stream-aligned graphs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygat_tpu.ops.stream import EC, MXU_PREC, TILE

_FUSED = None  # resolved lazily from the env (tests flip it directly)


def _fused_mode() -> str:
    global _FUSED
    if _FUSED is None:
        import os

        _FUSED = os.environ.get("PYGAT_FUSED_ATTENTION", "auto")
    return _FUSED


def set_fused_attention(mode: str) -> None:
    """'auto' (on whenever the stream kernel is the active segment impl),
    'on', or 'off'."""
    global _FUSED
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"unknown fused-attention mode {mode!r}")
    _FUSED = mode


def fused_enabled(graph) -> bool:
    """Fused attention needs the graph's stream layout and (in 'auto') the
    stream kernel to be the active segment lowering."""
    from pygat_tpu.ops import segment as _seg

    if graph.r_local is None:
        return False
    mode = _fused_mode()
    if mode == "off":
        return False
    if mode == "on":
        return True
    return _seg._stream_enabled()


def _leaky(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _split_hi(x):
    """f32 -> bf16-representable hi limb via mantissa truncation (bit mask,
    opaque to --xla_allow_excess_precision; see ops.stream._split_limbs)."""
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )


def _expand_bd(h: int, f: int, dtype=jnp.float32):
    """[H, H*F] head->lane one-hot: x[:, h] lands on lanes h*F..h*F+F-1."""
    return jnp.repeat(jnp.eye(h, dtype=dtype), f, axis=1)


def _block_diag_a(a: jax.Array) -> jax.Array:
    """[H, F] attention vectors -> block-diagonal [H*F, H] projector."""
    h, f = a.shape
    eye = jnp.eye(h, dtype=a.dtype)
    return jnp.einsum("hf,hk->hfk", a, eye).reshape(h * f, h)


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------


def _rounder(two_limb: bool, interpret: bool):
    """Matmul-operand preparation: bf16 in fastest mode on hardware; in
    interpret mode (CPU) VALUES still round to bf16 but the dot itself runs
    in f32 (XLA:CPU's DotThunk lacks bf16 x bf16 -> f32), keeping test
    numerics in the same precision class as the compiled kernel."""
    if two_limb:
        return lambda x: x.astype(jnp.float32)
    if interpret:
        return lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    return lambda x: x.astype(jnp.bfloat16)


def _make_v1_kernel(alpha: float, h: int, hf: int, two_limb: bool,
                    interpret: bool):
    mm = _rounder(two_limb, interpret)
    # High mode keeps f32 operands — the dot must then run exact f32 passes
    # or Mosaic's DEFAULT (one bf16 pass) silently rounds the values the
    # limb split was added to preserve (caught by the round-4 compiled-TPU
    # test run). Fastest mode rounds operands to bf16, where HIGHEST would
    # not even compile ("Bad lhs type").
    hp = jax.lax.Precision.HIGHEST if two_limb else MXU_PREC

    def kernel(*refs):
        (ct_ref, local_ref, g_ref, keep_ref, fdb_ref, abd_ref,
         exp_ref, out_ref, den_ref) = refs
        i = pl.program_id(0)
        tile = ct_ref[i]
        first = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            den_ref[:] = jnp.zeros_like(den_ref)

        vr = _rounder(False, interpret)  # bf16 value-rounding (scatter side)
        loc = local_ref[0, i % 8, :]  # [EC]; 128 = dead slot
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, EC), 0)
        ohf = (rows == loc[None, :]).astype(jnp.float32)  # scatter one-hot
        oh = vr(ohf)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (EC, TILE), 1)
        ohT = (lanes == loc[:, None]).astype(jnp.float32)  # tile-row gather

        g = g_ref[0]  # [EC, HF] (bf16 fastest / f32 high)
        l_src = jnp.dot(mm(g), mm(abd_ref[...]),
                        preferred_element_type=jnp.float32,
                        precision=hp)  # [EC, H]
        fde = jnp.dot(ohT, fdb_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=hp)  # [EC, 2H]
        raw = fde[:, :h] + l_src
        logits = jnp.where(raw >= 0, raw, alpha * raw)
        # Dead slots never reach either output (both one-hots are zero
        # there), but their numerator must still be KILLED here: with
        # take-built windows g = 0 at dead slots (dummy-row features) and
        # num would be a harmless 1, but corner-built windows
        # (ops/fused_corner.py) carry UNSPECIFIED row copies whose
        # unbounded logit can exp to inf — and inf * 0 in the MXU dot is
        # NaN. One [EC, H] select; measured noise-level. Broadcast the i32
        # BEFORE comparing: reshaping a 1D i1 vector to [EC, 1] is not
        # lowerable by Mosaic ("insertion of minor dim ... only supported
        # for 32-bit types").
        live = loc[:, None] < TILE
        num = jnp.where(live, jnp.exp(logits - fde[:, h:]), 0.0)  # [EC, H]
        qnum = num * keep_ref[0]
        qnum_hf = jnp.dot(qnum, exp_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=hp)  # [EC, HF]
        msgs = g.astype(jnp.float32) * qnum_hf
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


def _make_v2_kernel(alpha: float, h: int, hf: int, two_limb: bool,
                    interpret: bool, combined: bool = False):
    mm = _rounder(two_limb, interpret)
    hp = jax.lax.Precision.HIGHEST if two_limb else MXU_PREC  # see v1

    def kernel(*refs):
        if combined:
            # one [EC, 2HF] window: lanes [:hf] = whj at senders (logit
            # operand), lanes [hf:] = whi at senders (message operand) —
            # ONE gather + ONE window DMA stream instead of two (VERDICT
            # r4 item 7)
            (ct_ref, local_ref, gji_ref, keep_ref, wiub_ref,
             abd_ref, exp_ref, out_ref, den_ref) = refs
        else:
            (ct_ref, local_ref, gj_ref, gi_ref, keep_ref, wiub_ref,
             abd_ref, exp_ref, out_ref, den_ref) = refs
        i = pl.program_id(0)
        tile = ct_ref[i]
        first = jnp.logical_or(i == 0, ct_ref[jnp.maximum(i - 1, 0)] != tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            den_ref[:] = jnp.zeros_like(den_ref)

        vr = _rounder(False, interpret)
        loc = local_ref[0, i % 8, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, EC), 0)
        ohf = (rows == loc[None, :]).astype(jnp.float32)
        oh = vr(ohf)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (EC, TILE), 1)
        ohT = (lanes == loc[:, None]).astype(jnp.float32)

        wiub_e = jnp.dot(ohT, wiub_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=hp)  # [EC, HF+H]
        if combined:
            gji = gji_ref[0]  # [EC, 2HF]
            gj = gji[:, :hf]  # whj at senders
        else:
            gj = gj_ref[0]  # whj at senders
        pre_raw = wiub_e[:, :hf] + gj.astype(jnp.float32)
        pre = jnp.where(pre_raw >= 0, pre_raw, alpha * pre_raw)
        logits = jnp.dot(mm(pre), mm(abd_ref[...]),
                         preferred_element_type=jnp.float32,
                         precision=hp)  # [EC, H]
        # kill dead-slot numerators (see _make_v1_kernel: corner-built
        # windows carry unspecified rows; exp can inf and 0 * inf = NaN;
        # 2D i32 compare — a 1D i1 [:, None] reshape won't lower in Mosaic)
        live = loc[:, None] < TILE
        num = jnp.where(live, jnp.exp(logits - wiub_e[:, hf:]), 0.0)
        qnum = num * keep_ref[0]
        qnum_hf = jnp.dot(qnum, exp_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=hp)
        gi = gji[:, hf:] if combined else gi_ref[0]
        msgs = gi.astype(jnp.float32) * qnum_hf  # whi at senders
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


def _win_dtype(precision: str):
    return jnp.float32 if precision != "fastest" else jnp.bfloat16


_V2_WINDOW = None  # resolved lazily from the env (benches flip it directly)


def _v2_window_mode() -> str:
    """'combined' gathers (whj|whi)@senders as ONE [E, 2HF] window (one
    XLA gather + one DMA stream per chunk); 'split' keeps the round-4 two
    [E, HF] windows. PYGAT_V2_WINDOW overrides."""
    global _V2_WINDOW
    if _V2_WINDOW is None:
        import os

        _V2_WINDOW = os.environ.get("PYGAT_V2_WINDOW", "combined")
    return _V2_WINDOW


def set_v2_window(mode: str) -> None:
    global _V2_WINDOW
    if mode not in ("combined", "split"):
        raise ValueError(f"unknown v2 window mode {mode!r}")
    _V2_WINDOW = mode


def _grid_call(kernel, r_chunk, window_specs, windows, tile_specs, tiles,
               const_specs, consts, local8, n_pad, out_lanes, h,
               interpret: bool):
    c = r_chunk.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[pl.BlockSpec((1, 8, EC), lambda i, ct: (i // 8, 0, 0))]
        + window_specs + tile_specs + const_specs,
        out_specs=[
            pl.BlockSpec((TILE, out_lanes), lambda i, ct: (ct[i], 0)),
            pl.BlockSpec((TILE, h), lambda i, ct: (ct[i], 0)),
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
    )(r_chunk, local8, *windows, *tiles, *consts)


def _window_spec(lanes):
    return pl.BlockSpec((1, EC, lanes), lambda i, ct: (i, 0, 0))


def _tile_spec(lanes):
    return pl.BlockSpec((TILE, lanes), lambda i, ct: (ct[i], 0))


def _const_spec(rows, lanes):
    return pl.BlockSpec((rows, lanes), lambda i, ct: (0, 0))


# ---------------------------------------------------------------------------
# v1: custom-VJP op
#   out[N, HF], den[N, H] = fused attention of wh with receiver components
#   f_dst and stop-gradient bound (models/layers.gat_v1_sparse_heads math)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_v1_attention(wh, f_dst, bound, a_src, keepq,
                       senders, receivers, r_local, r_chunk,
                       c_slot, c_local, c_chunk,
                       alpha: float, precision: str, interpret: bool):
    """wh [N, HF], f_dst/bound [N, H], a_src [H, F], keepq [E, H]
    (keep/(1-p) factors, ones when not training) -> (out [N, HF],
    den [N, H]).  ``bound`` must already be gradient-stopped."""
    out, den, _ = _v1_fwd_impl(wh, f_dst, bound, a_src, keepq, senders,
                               r_local, r_chunk, alpha, precision, interpret)
    return out, den


def _v1_fwd_impl(wh, f_dst, bound, a_src, keepq, senders, r_local, r_chunk,
                 alpha, precision, interpret):
    n_pad, hf = wh.shape
    h, f = a_src.shape
    e = senders.shape[0]
    two_limb = precision != "fastest"
    wdt = _win_dtype(precision)

    gathered = jnp.take(wh, senders, axis=0).astype(wdt)  # [E, HF]
    fdb = jnp.concatenate([f_dst, bound], axis=1)  # [N, 2H]
    abd = _block_diag_a(a_src.astype(wdt))  # [HF, H]
    exp_bd = _expand_bd(h, f)  # [H, HF] f32
    local8 = r_local.reshape(e // EC // 8, 8, EC)

    out, den = _grid_call(
        _make_v1_kernel(alpha, h, hf, two_limb, interpret),
        r_chunk,
        [_window_spec(hf), _window_spec(h)],
        [gathered.reshape(e // EC, EC, hf),
         keepq.reshape(e // EC, EC, h)],
        [_tile_spec(2 * h)], [fdb],
        [_const_spec(hf, h), _const_spec(h, hf)], [abd, exp_bd],
        local8, n_pad, hf, h, interpret,
    )
    return out, den, gathered


def _v1_fwd(wh, f_dst, bound, a_src, keepq, senders, receivers, r_local,
            r_chunk, c_slot, c_local, c_chunk, alpha, precision, interpret):
    out, den = fused_v1_attention(
        wh, f_dst, bound, a_src, keepq, senders, receivers, r_local,
        r_chunk, c_slot, c_local, c_chunk, alpha, precision, interpret
    )
    res = (wh, f_dst, bound, a_src, keepq, senders, receivers, r_local,
           r_chunk, c_slot, c_local, c_chunk)
    return (out, den), res


def _v1_bwd(alpha, precision, interpret, res, cts):
    """Lane-minor XLA recompute + stream reductions (no [H, E] tensors)."""
    from pygat_tpu.ops.stream import stream_segment_sum, stream_sender_segment_sum

    (wh, f_dst, bound, a_src, keepq, senders, receivers, r_local, r_chunk,
     c_slot, c_local, c_chunk) = res
    g_out, g_den = cts
    n_pad, hf = wh.shape
    h, f = a_src.shape
    prec = "high" if precision != "fastest" else "fastest"

    # recompute the per-edge pipeline, lane-minor
    g_w = jnp.take(wh, senders, axis=0)  # [E, HF]
    abd = _block_diag_a(a_src)  # [HF, H] f32 for the backward
    exp_bd = _expand_bd(h, f)
    l_src = g_w @ abd  # [E, H]
    fde = jnp.take(f_dst, receivers, axis=0)
    raw = fde + l_src
    live = (r_local < TILE)[:, None]  # dead stream slots contribute nothing
    num = jnp.where(live, jnp.exp(_leaky(raw, alpha)
                                  - jnp.take(bound, receivers, axis=0)), 0.0)
    qnum = num * keepq

    dmsg = jnp.take(g_out, receivers, axis=0)  # [E, HF]
    dden = jnp.take(g_den, receivers, axis=0)  # [E, H]
    # dqnum[e,h] = sum_f dmsg[e,hF+f] * g_w[e,hF+f]  (block-diag ones)
    ones_bd = _expand_bd(h, f).T  # [HF, H]
    dqnum = (dmsg * g_w) @ ones_bd
    dnum = dqnum * keepq + dden
    dleaky = jnp.where(raw >= 0, 1.0, alpha)
    draw = dnum * num * dleaky  # [E, H]; zero at dead slots via num

    # df_dst: per-receiver reduction of draw (stream kernel, data already
    # in receiver-stream order)
    df_dst = stream_segment_sum(draw, receivers, r_local, r_chunk, n_pad,
                                prec, interpret)
    # dwh: ONE per-sender reduction of the combined message/logit cotangent
    dgathered = dmsg * (qnum @ exp_bd) + draw @ abd.T  # [E, HF]
    dwh = stream_sender_segment_sum(dgathered, senders, c_slot, c_local,
                                    c_chunk, None, n_pad, prec, interpret)
    # da_src: lane-column sums of g_w weighted by the expanded draw
    da_full = jnp.sum(g_w * (draw @ exp_bd), axis=0)  # [HF]
    da = da_full.reshape(h, f)
    return (dwh, df_dst, None, da, None, None, None, None, None, None,
            None, None)


fused_v1_attention.defvjp(_v1_fwd, _v1_bwd)



# ---------------------------------------------------------------------------
# v2: custom-VJP op (GATv2: LeakyReLU before the a-projection; aggregates
# the LEFT projection gathered at senders — reference layers.py:278-296)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_v2_attention(whi, whj, ub, a, keepq,
                       senders, receivers, r_local, r_chunk,
                       c_slot, c_local, c_chunk,
                       alpha: float, precision: str, interpret: bool):
    """whi/whj [N, HF], ub [N, H] (stop-gradient bound), a [H, F],
    keepq [E, H] -> (out [N, HF], den [N, H])."""
    out, den = _v2_fwd_impl(whi, whj, ub, a, keepq, senders, r_local,
                            r_chunk, alpha, precision, interpret)
    return out, den


def _v2_fwd_impl(whi, whj, ub, a, keepq, senders, r_local, r_chunk,
                 alpha, precision, interpret):
    n_pad, hf = whi.shape
    h, f = a.shape
    e = senders.shape[0]
    two_limb = precision != "fastest"
    wdt = _win_dtype(precision)

    combined = _v2_window_mode() == "combined"
    wiub = jnp.concatenate([whi, ub], axis=1)  # [N, HF+H]
    abd = _block_diag_a(a.astype(wdt))
    exp_bd = _expand_bd(h, f)
    local8 = r_local.reshape(e // EC // 8, 8, EC)

    if combined:
        # one gather from the concatenated (whj|whi) table — halves the
        # gather-op count and the per-chunk DMA-stream count vs 'split'
        gji = jnp.take(jnp.concatenate([whj, whi], axis=1),
                       senders, axis=0).astype(wdt)  # [E, 2HF]
        window_specs = [_window_spec(2 * hf), _window_spec(h)]
        windows = [gji.reshape(e // EC, EC, 2 * hf),
                   keepq.reshape(e // EC, EC, h)]
    else:
        gj = jnp.take(whj, senders, axis=0).astype(wdt)
        gi = jnp.take(whi, senders, axis=0).astype(wdt)
        window_specs = [_window_spec(hf), _window_spec(hf), _window_spec(h)]
        windows = [gj.reshape(e // EC, EC, hf), gi.reshape(e // EC, EC, hf),
                   keepq.reshape(e // EC, EC, h)]

    out, den = _grid_call(
        _make_v2_kernel(alpha, h, hf, two_limb, interpret, combined),
        r_chunk,
        window_specs,
        windows,
        [_tile_spec(hf + h)], [wiub],
        [_const_spec(hf, h), _const_spec(h, hf)], [abd, exp_bd],
        local8, n_pad, hf, h, interpret,
    )
    return out, den


def _v2_fwd(whi, whj, ub, a, keepq, senders, receivers, r_local, r_chunk,
            c_slot, c_local, c_chunk, alpha, precision, interpret):
    out, den = fused_v2_attention(
        whi, whj, ub, a, keepq, senders, receivers, r_local, r_chunk,
        c_slot, c_local, c_chunk, alpha, precision, interpret
    )
    res = (whi, whj, ub, a, keepq, senders, receivers, r_local, r_chunk,
           c_slot, c_local, c_chunk)
    return (out, den), res


def _v2_bwd(alpha, precision, interpret, res, cts):
    from pygat_tpu.ops.stream import stream_segment_sum, stream_sender_segment_sum

    (whi, whj, ub, a, keepq, senders, receivers, r_local, r_chunk,
     c_slot, c_local, c_chunk) = res
    g_out, g_den = cts
    n_pad, hf = whi.shape
    h, f = a.shape
    prec = "high" if precision != "fastest" else "fastest"

    # one gather from the concatenated table (mirrors the forward's
    # combined window; XLA fuses the lane slices into the consumers)
    gji = jnp.take(jnp.concatenate([whj, whi], axis=1), senders, axis=0)
    gj = gji[:, :hf]
    gi = gji[:, hf:]
    wi_e = jnp.take(whi, receivers, axis=0)
    raw = wi_e + gj  # [E, HF]
    pre = _leaky(raw, alpha)
    abd = _block_diag_a(a)
    exp_bd = _expand_bd(h, f)
    live = (r_local < TILE)[:, None]
    logits = pre @ abd  # [E, H]
    num = jnp.where(live, jnp.exp(logits - jnp.take(ub, receivers, axis=0)),
                    0.0)
    qnum = num * keepq

    dmsg = jnp.take(g_out, receivers, axis=0)
    dden = jnp.take(g_den, receivers, axis=0)
    ones_bd = exp_bd.T
    dqnum = (dmsg * gi) @ ones_bd
    dnum = dqnum * keepq + dden
    dlogits = dnum * num  # [E, H]
    dpre = (dlogits @ abd.T) * jnp.where(raw >= 0, 1.0, alpha)  # [E, HF]

    # receiver side: dwhi from the logit path
    dwhi_e = stream_segment_sum(dpre, receivers, r_local, r_chunk, n_pad,
                                prec, interpret)
    # sender side: ONE combined reduction for dwhj (logit path) and the
    # dwhi message path
    dmsg_s = dmsg * (qnum @ exp_bd)
    both = jnp.concatenate([dpre, dmsg_s], axis=1)  # [E, 2HF]
    red = stream_sender_segment_sum(both, senders, c_slot, c_local, c_chunk,
                                    None, n_pad, prec, interpret)
    dwhj = red[:, :hf]
    dwhi = dwhi_e + red[:, hf:]
    da_full = jnp.sum(pre * (dlogits @ exp_bd), axis=0)  # [HF]
    da = da_full.reshape(h, f)
    return (dwhi, dwhj, None, da, None, None, None, None, None, None,
            None, None)


fused_v2_attention.defvjp(_v2_fwd, _v2_bwd)



# ---------------------------------------------------------------------------
# v2, split operands (ring path): the receiver-side whi is the LOCAL node
# block while the sender-side logit (whj) and message (whi) operands come
# from the ROTATING ring buffers — three distinct arrays where the
# single-chip op has two. Kernel unchanged (_make_v2_kernel already takes
# gj / gi / wiub separately); only the wrapper + VJP split differs.
# Reference math: layers.py:278-296 generalized ring-wise.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_v2_attention_parts(wi_local, ub, wi_buf, wj_buf, a, keepq,
                             senders, receivers, r_local, r_chunk,
                             c_slot, c_local, c_chunk,
                             alpha: float, precision: str, interpret: bool):
    """(out [n_local, HF], den [n_local, H]) for one ring hop:
    ``wi_local``/``ub`` live on the receiver shard, ``wi_buf``/``wj_buf``
    are the rotated sender blocks; indices are block-local."""
    n_pad, hf = wi_local.shape
    h, f = a.shape
    e = senders.shape[0]
    two_limb = precision != "fastest"
    wdt = _win_dtype(precision)

    gj = jnp.take(wj_buf, senders, axis=0).astype(wdt)
    gi = jnp.take(wi_buf, senders, axis=0).astype(wdt)
    wiub = jnp.concatenate([wi_local, ub], axis=1)
    abd = _block_diag_a(a.astype(wdt))
    exp_bd = _expand_bd(h, f)
    local8 = r_local.reshape(e // EC // 8, 8, EC)

    out, den = _grid_call(
        _make_v2_kernel(alpha, h, hf, two_limb, interpret),
        r_chunk,
        [_window_spec(hf), _window_spec(hf), _window_spec(h)],
        [gj.reshape(e // EC, EC, hf), gi.reshape(e // EC, EC, hf),
         keepq.reshape(e // EC, EC, h)],
        [_tile_spec(hf + h)], [wiub],
        [_const_spec(hf, h), _const_spec(h, hf)], [abd, exp_bd],
        local8, n_pad, hf, h, interpret,
    )
    return out, den


def _v2p_fwd(wi_local, ub, wi_buf, wj_buf, a, keepq, senders, receivers,
             r_local, r_chunk, c_slot, c_local, c_chunk, alpha, precision,
             interpret):
    out = fused_v2_attention_parts(
        wi_local, ub, wi_buf, wj_buf, a, keepq, senders, receivers,
        r_local, r_chunk, c_slot, c_local, c_chunk, alpha, precision,
        interpret)
    res = (wi_local, ub, wi_buf, wj_buf, a, keepq, senders, receivers,
           r_local, r_chunk, c_slot, c_local, c_chunk)
    return out, res


def _v2p_bwd(alpha, precision, interpret, res, cts):
    from pygat_tpu.ops.stream import (
        stream_segment_sum,
        stream_sender_segment_sum,
    )

    (wi_local, ub, wi_buf, wj_buf, a, keepq, senders, receivers,
     r_local, r_chunk, c_slot, c_local, c_chunk) = res
    g_out, g_den = cts
    n_pad, hf = wi_local.shape
    n_buf = wi_buf.shape[0]  # halo buffers may be smaller than the shard
    h, f = a.shape
    prec = "high" if precision != "fastest" else "fastest"

    gj = jnp.take(wj_buf, senders, axis=0)
    gi = jnp.take(wi_buf, senders, axis=0)
    wi_e = jnp.take(wi_local, receivers, axis=0)
    raw = wi_e + gj
    pre = _leaky(raw, alpha)
    abd = _block_diag_a(a)
    exp_bd = _expand_bd(h, f)
    live = (r_local < TILE)[:, None]
    logits = pre @ abd
    num = jnp.where(live, jnp.exp(logits - jnp.take(ub, receivers, axis=0)),
                    0.0)
    qnum = num * keepq

    dmsg = jnp.take(g_out, receivers, axis=0)
    dden = jnp.take(g_den, receivers, axis=0)
    dqnum = (dmsg * gi) @ exp_bd.T
    dnum = dqnum * keepq + dden
    dlogits = dnum * num
    dpre = (dlogits @ abd.T) * jnp.where(raw >= 0, 1.0, alpha)

    # receiver side: d wi_local from the logit path
    dwi_local = stream_segment_sum(dpre, receivers, r_local, r_chunk,
                                   n_pad, prec, interpret)
    # sender side: ONE combined reduction, then split to the two buffers
    dmsg_s = dmsg * (qnum @ exp_bd)
    both = jnp.concatenate([dpre, dmsg_s], axis=1)
    red = stream_sender_segment_sum(both, senders, c_slot, c_local,
                                    c_chunk, None, n_buf, prec, interpret)
    dwj_buf = red[:, :hf]
    dwi_buf = red[:, hf:]
    da = jnp.sum(pre * (dlogits @ exp_bd), axis=0).reshape(h, f)
    return (dwi_local, None, dwi_buf, dwj_buf, da, None, None, None, None,
            None, None, None, None)


fused_v2_attention_parts.defvjp(_v2p_fwd, _v2p_bwd)


# ---------------------------------------------------------------------------
# v1, split operands (halo ring path): receiver-side operands (f_dst,
# bound) live on the LOCAL node shard while the sender table is a separate
# (possibly smaller) halo buffer — the output row count comes from the
# receiver side, not the table. Kernel unchanged (_make_v1_kernel).
# Reference math: layers.py:141-160 generalized to split shards.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def fused_v1_attention_parts(f_dst, bound, w_buf, a_src, keepq,
                             senders, receivers, r_local, r_chunk,
                             c_slot, c_local, c_chunk,
                             alpha: float, precision: str, interpret: bool):
    """(out [n_local, HF], den [n_local, H]) for one ring hop: ``f_dst``/
    ``bound`` live on the receiver shard [n_local, H]; ``w_buf`` is the
    (rotated) sender table [n_buf, HF] — ``senders`` index w_buf rows,
    ``receivers``/stream layouts are receiver-shard-local. The sender-side
    CSC view (c_*) must be built over n_buf rows."""
    n_local = f_dst.shape[0]
    hf = w_buf.shape[1]
    h, f = a_src.shape
    e = senders.shape[0]
    two_limb = precision != "fastest"
    wdt = _win_dtype(precision)

    gathered = jnp.take(w_buf, senders, axis=0).astype(wdt)  # [E, HF]
    fdb = jnp.concatenate([f_dst, bound], axis=1)  # [n_local, 2H]
    abd = _block_diag_a(a_src.astype(wdt))
    exp_bd = _expand_bd(h, f)
    local8 = r_local.reshape(e // EC // 8, 8, EC)

    out, den = _grid_call(
        _make_v1_kernel(alpha, h, hf, two_limb, interpret),
        r_chunk,
        [_window_spec(hf), _window_spec(h)],
        [gathered.reshape(e // EC, EC, hf), keepq.reshape(e // EC, EC, h)],
        [_tile_spec(2 * h)], [fdb],
        [_const_spec(hf, h), _const_spec(h, hf)], [abd, exp_bd],
        local8, n_local, hf, h, interpret,
    )
    return out, den


def _v1p_fwd(f_dst, bound, w_buf, a_src, keepq, senders, receivers,
             r_local, r_chunk, c_slot, c_local, c_chunk, alpha, precision,
             interpret):
    out = fused_v1_attention_parts(
        f_dst, bound, w_buf, a_src, keepq, senders, receivers, r_local,
        r_chunk, c_slot, c_local, c_chunk, alpha, precision, interpret)
    res = (f_dst, bound, w_buf, a_src, keepq, senders, receivers, r_local,
           r_chunk, c_slot, c_local, c_chunk)
    return out, res


def _v1p_bwd(alpha, precision, interpret, res, cts):
    from pygat_tpu.ops.stream import (
        stream_segment_sum,
        stream_sender_segment_sum,
    )

    (f_dst, bound, w_buf, a_src, keepq, senders, receivers, r_local,
     r_chunk, c_slot, c_local, c_chunk) = res
    g_out, g_den = cts
    n_local = f_dst.shape[0]
    n_buf, hf = w_buf.shape
    h, f = a_src.shape
    prec = "high" if precision != "fastest" else "fastest"

    g_w = jnp.take(w_buf, senders, axis=0)  # [E, HF]
    abd = _block_diag_a(a_src)
    exp_bd = _expand_bd(h, f)
    l_src = g_w @ abd  # [E, H]
    fde = jnp.take(f_dst, receivers, axis=0)
    raw = fde + l_src
    live = (r_local < TILE)[:, None]
    num = jnp.where(live, jnp.exp(_leaky(raw, alpha)
                                  - jnp.take(bound, receivers, axis=0)), 0.0)
    qnum = num * keepq

    dmsg = jnp.take(g_out, receivers, axis=0)  # [E, HF]
    dden = jnp.take(g_den, receivers, axis=0)  # [E, H]
    dqnum = (dmsg * g_w) @ _expand_bd(h, f).T
    dnum = dqnum * keepq + dden
    dleaky = jnp.where(raw >= 0, 1.0, alpha)
    draw = dnum * num * dleaky  # [E, H]

    df_dst = stream_segment_sum(draw, receivers, r_local, r_chunk, n_local,
                                prec, interpret)
    dgathered = dmsg * (qnum @ exp_bd) + draw @ abd.T  # [E, HF]
    dw_buf = stream_sender_segment_sum(dgathered, senders, c_slot, c_local,
                                       c_chunk, None, n_buf, prec, interpret)
    da = jnp.sum(g_w * (draw @ exp_bd), axis=0).reshape(h, f)
    return (df_dst, None, dw_buf, da, None, None, None, None, None, None,
            None, None)


fused_v1_attention_parts.defvjp(_v1p_fwd, _v1p_bwd)
