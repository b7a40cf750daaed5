"""Functional GAT attention layers (single-head pure functions).

Four variants mirroring the reference's capability surface:

* ``gat_v1_dense``  — masked [N, N] attention      (reference layers.py:8-67)
* ``gat_v1_sparse`` — edge-list segment attention  (reference layers.py:98-176)
* ``gat_v2_dense``  — GATv2, incl. the reference's [N, 1] broadcast quirk
                      (reference layers.py:179-232; see SURVEY §2.4)
* ``gat_v2_sparse`` — edge-list GATv2, the semantically-correct GATv2
                      (reference layers.py:234-316)

Each is a pure function of (params, inputs, rng); heads are vmapped in
:mod:`pygat_tpu.models.gat`. Dropout placement copies the reference exactly:
on the inputs, after the projection(s), and on the attention coefficients —
with the softmax denominator computed from PRE-dropout numerators
(reference layers.py:150-160).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pygat_tpu.graph import Graph
from pygat_tpu.ops.segment import (
    gather_receivers,
    gather_receivers_hn,
    gather_senders,
    segment_max,
    segment_softmax_stable,
    segment_sum,
    segment_sum_receivers,
    sorted_segment_max,
    sorted_segment_sum,
    take_receivers,
    take_senders,
)

NEG_INF = -9e15  # reference's masking constant (layers.py:40)

# Softmax-denominator clamp. 1e-18, NOT 0: with the bound-shifted softmax a
# row whose incoming logits all sit far under the bound can underflow its
# denominator toward the f32 subnormal band; the forward division still
# cancels (num/den is a ratio of same-scale f32 normals), but a naive
# BACKWARD forms den^2, which underflows to 0 below den ~1.1e-19 -> 1/den^2
# = inf, and inf*0 downstream turns every parameter gradient NaN (found by
# the fused-kernel train test; applies to all segment backends). 1e-18
# keeps den^2 normal, while zeroing only rows whose best incoming edge sits
# > 41 nats under the bound — numerically collapsed anyway. Don't raise it
# further: the ring/stream bounds are loose (global max), and healthy rows
# can carry den well under 1e-15 on adversarial inputs
# (test_ring_v2_attention_matches_layer).
#
# The clamp alone is NOT sufficient: even with den^2 normal, the div
# backward's per-element products g*agg/den^2 can overflow to +-inf just
# above the clamp (den ~1e-18, |agg/den^2| ~1e20, moderate g) and the
# mixed-sign inf terms cancel to NaN in the sum over F (observed: one NaN
# in g_den poisons every upstream parameter grad through the kernel VJP).
# ALL division-by-den sites must therefore go through softmax_div below,
# whose custom VJP computes g_den = -sum(g*out)/den — one power of den, so
# no intermediate ever exceeds the true cotangent's own magnitude.
DEN_MIN = 1e-18


@jax.custom_vjp
def _div_stable(agg, den):
    """``agg / den[..., None]`` with an overflow-safe backward (see the
    DEN_MIN note): agg [..., F] (any leading dims), den [...] > 0."""
    return agg / den[..., None]


def _div_stable_fwd(agg, den):
    out = agg / den[..., None]
    return out, (out, den)


def _div_stable_bwd(res, g):
    out, den = res
    # -g*agg/den^2 computed as -(g*out)/den: the true value reached via
    # intermediates of the same scale (out is O(1) for softmax rows)
    return g / den[..., None], -jnp.sum(g * out, axis=-1) / den


_div_stable.defvjp(_div_stable_fwd, _div_stable_bwd)


def softmax_div(agg, den):
    """Clamped, backward-stable softmax normalization: agg [..., F] divided
    by den [...], rows with den <= DEN_MIN (padding / numerically collapsed)
    pass through unscaled with zero den-gradient."""
    den = jnp.where(den > DEN_MIN, den, 1.0)
    return _div_stable(agg, den)


class V1Params(NamedTuple):
    W: jax.Array  # [F_in, F_out]
    a: jax.Array  # [2 * F_out]  (a[:F_out] pairs the receiver i, a[F_out:] the sender j)
    skip: jax.Array | None  # [F_in, F_out] or None


class V2Params(NamedTuple):
    W: jax.Array  # [2 * F_in, F_out]; rows [:F_in] = left/i-projection, [F_in:] = right/j
    a: jax.Array  # [F_out]
    skip: jax.Array | None


def dropout(x, rate: float, rng, train: bool):
    """torch-style inverted dropout (F.dropout semantics)."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape=x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class DropoutMasks(NamedTuple):
    """Pre-drawn boolean keep masks for one layer's dropout sites.

    Drawn batched over heads with ONE bernoulli call per site: on TPU,
    per-head vmapped PRNG keys force a serialized rng-bit-generator per key
    with the hardware (rbg) generator (~1000x slower than one batched draw);
    a single [H, ...] draw keeps heads independent (reference semantics:
    each head module calls F.dropout separately) at full speed.

    ``m_proj2`` is the second-projection mask of the v2 variants
    (reference layers.py:207-211 masks Wh1 AND Wh2); None for v1.
    """

    m_in: jax.Array | None  # [.., N, F_in]
    m_proj: jax.Array | None  # [.., N, F_out]
    m_proj2: jax.Array | None  # [.., N, F_out] (v2 only)
    m_att: jax.Array | None  # [.., E] sparse / [.., N, N] dense


NO_MASKS = DropoutMasks(None, None, None, None)


def apply_mask(x, keep, rate: float):
    """Inverted-dropout application of a pre-drawn boolean keep mask."""
    if keep is None:
        return x
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def draw_masks(
    key,
    layer_type: str,
    drop: float,
    *,
    n: int,
    f_in: int,
    f_out: int,
    e: int,
    heads: int | None = None,
    train: bool = True,
) -> DropoutMasks:
    """Draw a layer's keep masks, optionally head-batched (``heads=H``)."""
    if not train or drop <= 0.0:
        return NO_MASKS
    lead = () if heads is None else (heads,)
    keep = 1.0 - drop
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v2 = layer_type.startswith("GATv2")
    sparse = layer_type.endswith("_sparse")
    att_shape = lead + ((e,) if sparse else (n, n))
    return DropoutMasks(
        m_in=jax.random.bernoulli(k1, keep, lead + (n, f_in)),
        m_proj=jax.random.bernoulli(k2, keep, lead + (n, f_out)),
        m_proj2=jax.random.bernoulli(k3, keep, lead + (n, f_out)) if v2 else None,
        m_att=jax.random.bernoulli(k4, keep, att_shape),
    )


def _keep(key, keep_prob: float, shape):
    """(mask, q=keep_prob): one batched bernoulli per dropout site.

    An 8-bit threshold variant (keep_mask_u8) was tried to cut hardware-RNG
    bits 4x, but MEASURED SLOWER end-to-end (Pubmed epoch 14.6 -> 17.9 ms):
    the u32 -> u8 bitcast + trailing-dim merge is a lane-level relayout that
    costs more than the rng it saves. Kept for reference."""
    return jax.random.bernoulli(key, keep_prob, shape), keep_prob


def _coerce_masks(rng_or_masks, layer_type: str, drop: float, train: bool,
                  n: int, f_in: int, f_out: int, e: int) -> DropoutMasks:
    """Accept either pre-drawn DropoutMasks (the apply_gat fast path) or a
    PRNG key (single-head convenience; draws unbatched masks)."""
    if not train or drop <= 0.0:
        return NO_MASKS
    if isinstance(rng_or_masks, DropoutMasks):
        return rng_or_masks
    return draw_masks(rng_or_masks, layer_type, drop,
                      n=n, f_in=f_in, f_out=f_out, e=e, train=train)


def leaky_relu(x, alpha: float):
    return jnp.where(x >= 0, x, alpha * x)


def _finish(h_prime, h_dropped, skip, concat: bool):
    """Shared tail: optional skip projection (from the dropped input, as the
    reference does at layers.py:166) then ELU iff non-final layer."""
    if skip is not None:
        h_prime = h_prime + h_dropped @ skip
    if concat:
        h_prime = jax.nn.elu(h_prime)
    return h_prime


# ---------------------------------------------------------------------------
# Dense variants: full [N, N] masked attention
# ---------------------------------------------------------------------------


def gat_v1_dense(
    params: V1Params,
    h: jax.Array,  # [N, F_in]
    adj_mask: jax.Array,  # [N, N] bool; adj_mask[i, j] == edge j -> i
    masks,  # DropoutMasks (pre-drawn) or a PRNG key, ignored unless train
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    m = _coerce_masks(masks, "GAT", drop, train,
                      h.shape[0], h.shape[1], params.W.shape[1], 0)
    h = apply_mask(h, m.m_in, drop)
    Wh = h @ params.W
    Wh = apply_mask(Wh, m.m_proj, drop)  # official-TF-repo placement (layers.py:37)

    f_out = params.W.shape[1]
    e_i = Wh @ params.a[:f_out]  # [N] receiver term  (reference Wh1)
    e_j = Wh @ params.a[f_out:]  # [N] sender term    (reference Wh2)
    e = leaky_relu(e_i[:, None] + e_j[None, :], alpha)  # e[i, j]

    att = jnp.where(adj_mask, e, NEG_INF)
    att = jax.nn.softmax(att, axis=1)
    att = apply_mask(att, m.m_att, drop)
    h_prime = att @ Wh
    return _finish(h_prime, h, params.skip, concat)


def gat_v2_dense(
    params: V2Params,
    h: jax.Array,
    adj_mask: jax.Array,
    masks,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    """Reference-faithful dense GATv2, INCLUDING its [N, 1] logit quirk:
    ``e = leaky_relu(Wh1 + Wh2) @ a`` is per-node, so after the adjacency
    mask the row softmax is uniform over neighbors (SURVEY §2.4). The
    semantically-correct GATv2 lives in :func:`gat_v2_sparse`."""
    f_in = h.shape[1]
    m = _coerce_masks(masks, "GATv2", drop, train,
                      h.shape[0], f_in, params.W.shape[1], 0)
    h = apply_mask(h, m.m_in, drop)
    Wh1 = h @ params.W[:f_in]  # left half
    Wh2 = h @ params.W[f_in:]  # right half
    Wh1 = apply_mask(Wh1, m.m_proj, drop)
    Wh2 = apply_mask(Wh2, m.m_proj2, drop)

    e = leaky_relu(Wh1 + Wh2, alpha) @ params.a  # [N]  (reference layers.py:212-214)
    att = jnp.where(adj_mask, e[:, None], NEG_INF)  # broadcast [N,1] vs [N,N]
    att = jax.nn.softmax(att, axis=1)
    att = apply_mask(att, m.m_att, drop)
    h_prime = att @ Wh2  # aggregates the RIGHT projection (layers.py:220)
    return _finish(h_prime, h, params.skip, concat)


# ---------------------------------------------------------------------------
# Sparse variants: edge-list segment attention (static padded COO)
# ---------------------------------------------------------------------------


def _sparse_attention_aggregate(
    edge_logits,  # [E] pre-softmax logits
    values,  # [N, F] per-node messages, gathered at senders
    graph: Graph,
    m_att,  # [E] boolean keep mask or None
    *,
    drop: float,
):
    """Segment softmax over incoming edges + SpMM aggregation.

    Replaces the reference's scatter_max + exp + two SpecialSpmm calls
    (layers.py:145-160). The denominator uses PRE-dropout numerators and the
    numerator is dropped afterwards — exact reference order.

    When the graph carries its CSC view (built by ``build_graph``), every
    reduction and gather here (and in their VJPs) lowers to segmented scans
    and gathers — no TPU scatter anywhere in the train step.
    """
    n_pad = graph.num_nodes_padded
    fast = graph.col_perm is not None
    num, denom = segment_softmax_stable(
        edge_logits, graph.receivers, n_pad, edge_mask=graph.edge_mask,
        row_ptr=graph.row_ptr if fast else None,
    )
    num = apply_mask(num, m_att, drop)
    if fast:
        vals = take_senders(values, graph.senders, graph.col_perm, graph.col_ptr)
        h_prime = sorted_segment_sum(num[:, None] * vals, graph.receivers, graph.row_ptr)
    else:
        h_prime = segment_sum(num[:, None] * values[graph.senders], graph.receivers, n_pad)
    # Reference divides with no guard (self-loops ensure denom > 0 on real
    # rows; layers.py:160); padding rows have denom == 0, softmax_div clamps.
    return softmax_div(h_prime, denom)


def gat_v1_sparse(
    params: V1Params,
    h: jax.Array,
    graph: Graph,
    masks,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    m = _coerce_masks(masks, "GAT_sparse", drop, train,
                      h.shape[0], h.shape[1], params.W.shape[1],
                      graph.num_edges_padded)
    h = apply_mask(h, m.m_in, drop)
    Wh = h @ params.W
    Wh = apply_mask(Wh, m.m_proj, drop)

    f_out = params.W.shape[1]
    # SDDMM-style decomposition: a^T [Wh_i || Wh_j] = <a_dst, Wh_i> + <a_src, Wh_j>
    # — never materializes the reference's [2F', E] concat (layers.py:141).
    f_dst = Wh @ params.a[:f_out]  # pairs Wh[edge dst] (reference edge[0])
    f_src = Wh @ params.a[f_out:]  # pairs Wh[edge src] (reference edge[1])
    if graph.col_perm is not None:
        e_dst = take_receivers(f_dst, graph.receivers, graph.row_ptr)
        e_src = take_senders(f_src, graph.senders, graph.col_perm, graph.col_ptr)
    else:
        e_dst = f_dst[graph.receivers]
        e_src = f_src[graph.senders]
    edge_logits = leaky_relu(e_dst + e_src, alpha)

    h_prime = _sparse_attention_aggregate(
        edge_logits, Wh, graph, m.m_att, drop=drop
    )
    return _finish(h_prime, h, params.skip, concat)


def gat_v2_sparse(
    params: V2Params,
    h: jax.Array,
    graph: Graph,
    masks,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
) -> jax.Array:
    f_in = h.shape[1]
    m = _coerce_masks(masks, "GATv2_sparse", drop, train,
                      h.shape[0], f_in, params.W.shape[1],
                      graph.num_edges_padded)
    h = apply_mask(h, m.m_in, drop)
    Whi = h @ params.W[:f_in]  # left: gathered at the receiver i
    Whj = h @ params.W[f_in:]  # right: gathered at the sender j
    Whi = apply_mask(Whi, m.m_proj, drop)
    Whj = apply_mask(Whj, m.m_proj2, drop)

    # GATv2: LeakyReLU BEFORE the a-projection (reference layers.py:280-283).
    if graph.col_perm is not None:
        pre = take_receivers(Whi, graph.receivers, graph.row_ptr) + take_senders(
            Whj, graph.senders, graph.col_perm, graph.col_ptr
        )  # [E, F_out]
    else:
        pre = Whi[graph.receivers] + Whj[graph.senders]
    edge_logits = leaky_relu(pre, alpha) @ params.a

    # Aggregates the LEFT projection Whi of the sender (reference layers.py:296).
    h_prime = _sparse_attention_aggregate(
        edge_logits, Whi, graph, m.m_att, drop=drop
    )
    return _finish(h_prime, h, params.skip, concat)


def _heads_tail(out, params, h, x_h, concat: bool):
    """Shared skip/ELU/concat-or-mean tail of the head-batched sparse
    layers: ``out`` is the aggregated [N, H, F_out]."""
    n, n_heads, f_out = out.shape
    if params.skip is not None:
        if x_h is not None:
            out = out + jnp.einsum("nhf,hfo->nho", x_h,
                                   params.skip.astype(x_h.dtype),
                                   preferred_element_type=jnp.float32)
        else:
            out = out + jnp.einsum("nf,hfo->nho", h, params.skip)
    if concat:
        return jax.nn.elu(out).reshape(n, n_heads * f_out)
    return out.mean(axis=1)


def _att_keepq(k_att, keep: float, e_pad: int, n_heads: int, use_drop: bool):
    """[E, H] attention keep/(1-p) factors (lane-minor; ones in eval)."""
    if not use_drop:
        return jnp.ones((e_pad, n_heads), jnp.float32)
    keep_att, q_att = _keep(k_att, keep, (e_pad, n_heads))
    return jnp.where(keep_att, 1.0 / q_att, 0.0)


def gat_v1_sparse_heads(
    params: V1Params,  # stacked [H, ...] leaves
    h: jax.Array,  # [N, F_in] (or [N, H*F] from a previous concat layer)
    graph: Graph,
    rng,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
    plans=None,  # ops.large.CscCsrPlans: gather-free fused path (large N)
) -> jax.Array:
    """Head-batched sparse GATv1 in TPU-friendly layouts (the XLA fast path).

    The naive per-head vmap produces [H, N, F_out] / [H, E, F_out] tensors
    whose minor dimension is F_out (8 for the citation presets); the TPU
    lane width is 128, so XLA pads every such tensor 16x and the train step
    drowns in pad/slice/copy relayouts (profiled: >60% of step time on
    Pubmed). Here heads stay folded into the minor axis:

    * projections: ``[N, H*F_out]`` (minor 64+), one MXU matmul when the
      input is shared (eval) and one batched einsum when per-head input
      dropout masks apply (train);
    * per-node logit components: ``[H, N]``; per-edge values: ``[H, E]`` —
      both minor-dim friendly;
    * the neighbor gather and the segment-sum aggregation move ``[E, H*F]``
      blocks, not H separate [E, F] ones.

    Semantics match ``gat_v1_sparse`` per head (same math, same dropout
    sites, per-head independent masks); returns the layer output directly:
    ``[N, H*F_out]`` (ELU'd head-concat) when ``concat`` else the head-mean
    ``[N, F_out]`` (reference models.py:32-34).
    """
    n_heads, f_in, f_out = params.W.shape
    n = h.shape[0]
    e_pad = graph.num_edges_padded
    use_drop = train and drop > 0.0
    k_in, k_proj, k_att = (jax.random.split(rng, 3) if use_drop
                           else (None, None, None))
    keep = 1.0 - drop

    if use_drop:
        # per-head masked inputs in [N, H, F_in] (minor dim stays F_in) and
        # ONE block-diagonal matmul [N, H*F_in] @ [H*F_in, H*F_out]: a
        # batched "hnf,hfo->nho" einsum would emit a lane-padded [N, H, 8]
        # intermediate (16x relayout traffic); the 8x block-diag FLOP waste
        # is trivial next to that. Masks are one batched bernoulli per site
        # via _keep (see its docstring for the measured alternative).
        keep_in, q_in = _keep(k_in, keep, (n, n_heads, f_in))
        # bf16 storage for the masked copies: the MXU's DEFAULT-precision
        # f32 matmul already multiplies at bf16-class precision, so this
        # loses nothing while halving the [N, H, F_in] HBM traffic.
        # (TPU only: XLA:CPU's DotThunk rejects bf16 x bf16 dots at some
        # shapes, and the traffic argument is TPU-specific anyway.)
        pdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        x_h = jnp.where(keep_in, h[:, None, :] / q_in, 0.0).astype(pdt)
        w_bd = jnp.einsum("hfo,hk->hfko", params.W, jnp.eye(n_heads, dtype=params.W.dtype))
        w_bd = w_bd.reshape(n_heads * f_in, n_heads * f_out)
        wh = jnp.dot(x_h.reshape(n, n_heads * f_in), w_bd.astype(pdt),
                     preferred_element_type=jnp.float32)  # [N, H*F] f32
        keep_proj, q_proj = _keep(k_proj, keep, wh.shape)
        wh = jnp.where(keep_proj, wh / q_proj, 0.0)  # [N, H*F]
    else:
        x_h = None
        w2d = jnp.moveaxis(params.W, 0, 1).reshape(f_in, n_heads * f_out)
        wh = h @ w2d  # [N, H*F] — one MXU matmul

    wh3 = wh.reshape(n, n_heads, f_out)

    from pygat_tpu.ops import fused_stream as _fs

    if _fs.fused_enabled(graph):
        # Fused path: logits/exp/dropout/messages/scatter all inside ONE
        # Pallas kernel (ops/fused_stream.py) — no [E, *] intermediate or
        # [H, E] tensor ever reaches HBM; the custom VJP recomputes
        # lane-minor and reduces through the stream kernels. (Note: the
        # attention keep mask draws as [E, H] here vs [H, E] below — a
        # different rng stream, same distribution.)
        from pygat_tpu.ops import segment as _seg

        f_dst_n = jnp.einsum("nho,ho->nh", wh3, params.a[:, :f_out])  # [N, H]
        f_src_n = jnp.einsum("nho,ho->nh", jax.lax.stop_gradient(wh3),
                             params.a[:, f_out:])
        m_src = jnp.max(jnp.where(graph.node_mask[:, None], f_src_n,
                                  -jnp.inf), axis=0)
        m_src = jnp.where(jnp.isfinite(m_src), m_src, 0.0)
        bound = jax.lax.stop_gradient(
            leaky_relu(f_dst_n + m_src[None, :], alpha))
        interp = _seg._stream_interpret()
        if plans is not None:
            from pygat_tpu.ops import banded as _bd

            if isinstance(plans, _bd.BandPlan):
                # large-N path: banded VMEM windows (ops/banded.py) — no
                # serialized row gather in the forward; keep mask drawn
                # over BANDED slots (a different rng stream, same
                # distribution — like fused vs unfused)
                keepq = _att_keepq(k_att, keep, plans.num_slots, n_heads,
                                   use_drop)
                agg, den = _bd.fused_v1_attention_banded(
                    wh, f_dst_n, bound, params.a[:, f_out:], keepq, plans,
                    alpha=alpha, precision=_seg._STREAM_PRECISION,
                    interpret=interp,
                )
                out = softmax_div(agg.reshape(n, n_heads, f_out), den)
                return _heads_tail(out, params, h, x_h, concat)
            # million-node opt-in path: sender windows by CSC expand +
            # corner-turn (no serialized row gather, forward or backward)
            from pygat_tpu.ops import fused_corner as _fcn

            keepq = _att_keepq(k_att, keep, e_pad, n_heads, use_drop)
            agg, den = _fcn.fused_v1_attention_corner(
                wh, f_dst_n, bound, params.a[:, f_out:], keepq, graph,
                plans, alpha=alpha, precision=_seg._STREAM_PRECISION,
                interpret=interp,
            )
            out = softmax_div(agg.reshape(n, n_heads, f_out), den)
            return _heads_tail(out, params, h, x_h, concat)
        keepq = _att_keepq(k_att, keep, e_pad, n_heads, use_drop)
        agg, den = _fs.fused_v1_attention(
            wh, f_dst_n, bound, params.a[:, f_out:], keepq,
            graph.senders, graph.receivers, graph.r_local, graph.r_chunk,
            graph.c_slot, graph.c_local, graph.c_chunk,
            alpha, _seg._STREAM_PRECISION, interp,
        )
        out = softmax_div(agg.reshape(n, n_heads, f_out), den)
        return _heads_tail(out, params, h, x_h, concat)

    f_dst = jnp.einsum("nho,ho->hn", wh3, params.a[:, :f_out])  # [H, N]
    f_src = jnp.einsum("nho,ho->hn", wh3, params.a[:, f_out:])

    # Gather sender features ONCE and derive the sender logit component
    # from the gathered block (rather than gathering f_src separately):
    # the cotangents of the logits and of the messages then flow through a
    # SINGLE sender-segmented reduction in the backward pass instead of two
    # scatter-adds. gather_*/segment_sum_* dispatch to the Pallas stream
    # kernel (ops.stream) on TPU and to the XLA paths elsewhere.
    gathered = gather_senders(wh, graph)  # [E, H*F]
    l_src = jnp.einsum("ehf,hf->he", gathered.reshape(e_pad, n_heads, f_out),
                       params.a[:, f_out:])  # [H, E]
    logits = leaky_relu(gather_receivers_hn(f_dst, graph) + l_src, alpha)

    # Softmax stabilization WITHOUT a segment-max scatter: the softmax is
    # invariant to any per-receiver shift, so instead of the exact per-row
    # max (a slow TPU scatter-max; the reference's torch_scatter trick,
    # layers.py:145-146) subtract the cheap upper bound
    #     bound[h, i] = leaky(f_dst[h, i] + max_j f_src[h, j])  >=  logit
    # (leaky_relu is monotone). exp(logit - bound) <= 1 — no overflow ever;
    # the bound is looser than the exact max by the f_src spread, which
    # costs underflow only when that spread exceeds ~88 nats (a regime
    # where the reference's own exp overflows f32). Gradient-stopped: the
    # shift's true gradient is exactly zero.
    # max over REAL senders only: padding rows hold 0, which would loosen
    # the bound by |max real f_src| when all real components are negative
    # (bringing the ~88-nat underflow regime forward for no reason)
    m_src = jnp.max(jnp.where(graph.node_mask[None, :], f_src, -jnp.inf), axis=1)
    m_src = jnp.where(jnp.isfinite(m_src), m_src, 0.0)  # all-masked fallback
    bound = jax.lax.stop_gradient(leaky_relu(f_dst + m_src[:, None], alpha))
    num = jnp.where(graph.edge_mask[None, :],
                    jnp.exp(logits - bound[:, graph.receivers]), 0.0)  # [H, E]
    if use_drop:
        keep_att, q_att = _keep(k_att, keep, num.shape)
        qnum = jnp.where(keep_att, num / q_att, 0.0)
    else:
        qnum = num

    hf = n_heads * f_out
    # ONE segment reduction for numerator AND denominator: append the
    # pre-dropout numerators as H extra columns (reference semantics: the
    # denominator uses PRE-dropout numerators, layers.py:150-160). The
    # extra lanes are free — [*, HF] was padded to the 128-lane width
    # anyway.
    msgs = jnp.concatenate(
        [
            (gathered.reshape(e_pad, n_heads, f_out)
             * jnp.moveaxis(qnum, 0, 1)[:, :, None]).reshape(e_pad, hf),
            jnp.moveaxis(num, 0, 1),  # [E, H]
        ],
        axis=1,
    )  # [E, HF + H]
    agg = segment_sum_receivers(msgs, graph)  # [N, HF + H]

    out = softmax_div(agg[:, :hf].reshape(n, n_heads, f_out), agg[:, hf:])

    return _heads_tail(out, params, h, x_h, concat)


def gat_v2_sparse_heads(
    params: V2Params,  # stacked [H, ...] leaves; W [H, 2*F_in, F_out]
    h: jax.Array,  # [N, F_in]
    graph: Graph,
    rng,
    *,
    alpha: float,
    drop: float,
    concat: bool,
    train: bool,
    plans=None,  # ops.large.CscCsrPlans: gather-free fused path (large N)
) -> jax.Array:
    """Head-batched sparse GATv2 in TPU-friendly layouts (see
    :func:`gat_v1_sparse_heads` for the layout rationale). Per-head math is
    ``gat_v2_sparse`` exactly: LeakyReLU before the a-projection (reference
    layers.py:280-283), aggregation of the LEFT projection Whi gathered at
    senders (layers.py:296); dropout on the input, both projections, and
    the attention numerator, with a pre-dropout softmax denominator."""
    n_heads, two_f_in, f_out = params.W.shape
    f_in = two_f_in // 2
    n = h.shape[0]
    e_pad = graph.num_edges_padded
    hf = n_heads * f_out
    use_drop = train and drop > 0.0
    keep = 1.0 - drop
    if use_drop:
        k_in, k_i, k_j, k_att = jax.random.split(rng, 4)
        keep_in, q_in = _keep(k_in, keep, (n, n_heads, f_in))
        x_h = jnp.where(keep_in, h[:, None, :] / q_in, 0.0)  # [N, H, F_in]
        eye = jnp.eye(n_heads, dtype=params.W.dtype)
        wi_bd = jnp.einsum("hfo,hk->hfko", params.W[:, :f_in], eye).reshape(
            n_heads * f_in, hf)
        wj_bd = jnp.einsum("hfo,hk->hfko", params.W[:, f_in:], eye).reshape(
            n_heads * f_in, hf)
        x2 = x_h.reshape(n, n_heads * f_in)
        whi = x2 @ wi_bd  # [N, H*F]
        whj = x2 @ wj_bd
        keep_i, q_i = _keep(k_i, keep, whi.shape)
        keep_j, q_j = _keep(k_j, keep, whj.shape)
        whi = jnp.where(keep_i, whi / q_i, 0.0)
        whj = jnp.where(keep_j, whj / q_j, 0.0)
    else:
        x_h = None
        wi2d = jnp.moveaxis(params.W[:, :f_in], 0, 1).reshape(f_in, hf)
        wj2d = jnp.moveaxis(params.W[:, f_in:], 0, 1).reshape(f_in, hf)
        whi = h @ wi2d
        whj = h @ wj2d

    from pygat_tpu.ops import fused_stream as _fs

    if _fs.fused_enabled(graph):
        # Fused v2: the sign-split monotone bound (below) computed
        # lane-minor, then the whole per-edge pipeline in one Pallas kernel
        # (see the v1 branch / ops/fused_stream.py).
        from pygat_tpu.ops import segment as _seg

        whj_m = jax.lax.stop_gradient(whj)
        node_col = graph.node_mask[:, None]
        big = jnp.asarray(jnp.inf, whj_m.dtype)
        Mq = jnp.max(jnp.where(node_col, whj_m, -big), axis=0)  # [H*F]
        mq = jnp.min(jnp.where(node_col, whj_m, big), axis=0)
        Mq = jnp.where(jnp.isfinite(Mq), Mq, 0.0).reshape(n_heads, f_out)
        mq = jnp.where(jnp.isfinite(mq), mq, 0.0).reshape(n_heads, f_out)
        whi3 = jax.lax.stop_gradient(whi).reshape(n, n_heads, f_out)
        a_pos = jnp.maximum(params.a, 0.0)
        a_neg = jnp.minimum(params.a, 0.0)
        ub = jnp.einsum("nhf,hf->nh", leaky_relu(whi3 + Mq[None], alpha),
                        a_pos)
        ub = ub + jnp.einsum("nhf,hf->nh", leaky_relu(whi3 + mq[None], alpha),
                             a_neg)
        ub = jax.lax.stop_gradient(ub)  # [N, H]
        interp = _seg._stream_interpret()
        if plans is not None:
            from pygat_tpu.ops import banded as _bd

            if isinstance(plans, _bd.BandPlan):
                # large-N banded path (see the v1 branch / ops/banded.py)
                keepq = _att_keepq(k_att if use_drop else None, keep,
                                   plans.num_slots, n_heads, use_drop)
                agg, den = _bd.fused_v2_attention_banded(
                    whi, whj, ub, params.a, keepq, plans,
                    alpha=alpha, precision=_seg._STREAM_PRECISION,
                    interpret=interp,
                )
                out = softmax_div(agg.reshape(n, n_heads, f_out), den)
                return _heads_tail(out, params, h, x_h, concat)
            # million-node opt-in path (see v1 / ops/fused_corner.py)
            from pygat_tpu.ops import fused_corner as _fcn

            keepq = _att_keepq(k_att if use_drop else None, keep, e_pad,
                               n_heads, use_drop)
            agg, den = _fcn.fused_v2_attention_corner(
                whi, whj, ub, params.a, keepq, graph, plans,
                alpha=alpha, precision=_seg._STREAM_PRECISION,
                interpret=interp,
            )
            out = softmax_div(agg.reshape(n, n_heads, f_out), den)
            return _heads_tail(out, params, h, x_h, concat)
        keepq = _att_keepq(k_att if use_drop else None, keep, e_pad,
                           n_heads, use_drop)
        agg, den = _fs.fused_v2_attention(
            whi, whj, ub, params.a, keepq,
            graph.senders, graph.receivers, graph.r_local, graph.r_chunk,
            graph.c_slot, graph.c_local, graph.c_chunk,
            alpha, _seg._STREAM_PRECISION, interp,
        )
        out = softmax_div(agg.reshape(n, n_heads, f_out), den)
        return _heads_tail(out, params, h, x_h, concat)

    pre_i = gather_receivers(whi, graph)
    pre_j = gather_senders(whj, graph)
    pre = leaky_relu(pre_i + pre_j, alpha)  # [E, H*F]
    logits = jnp.einsum("ehf,hf->he", pre.reshape(e_pad, n_heads, f_out),
                        params.a)  # [H, E]

    # Softmax stabilization WITHOUT a segment-max scatter (the v2 analogue
    # of the v1 path's receiver bound): logits are
    #   e[h,i,j] = sum_f a[h,f] * leaky(whi[i,hf] + whj[j,hf])
    # and leaky_relu is monotone increasing, so per (h,f) the j-term is
    # bounded by the global max (for a >= 0) or min (for a < 0) of
    # whj[:,hf] over real nodes:
    #   ub[h,i] = sum_f a+[h,f]*leaky(whi+Mq) + a-[h,f]*leaky(whi+mq)
    # exp(logit - ub) <= 1 — no overflow ever. Looser than the exact max by
    # the a-weighted whj spread: underflow costs accuracy only when that
    # gap exceeds ~88 nats, a regime where the reference's own exp
    # overflows f32. Gradient-stopped: softmax shift-invariance makes the
    # shift's true gradient exactly zero. (Replaces the round-1 exact
    # scatter segment-max; VERDICT r1 item 8.)
    whj_m = jax.lax.stop_gradient(whj)
    node_col = graph.node_mask[:, None]
    big = jnp.asarray(jnp.inf, whj_m.dtype)
    Mq = jnp.max(jnp.where(node_col, whj_m, -big), axis=0)  # [H*F]
    mq = jnp.min(jnp.where(node_col, whj_m, big), axis=0)
    Mq = jnp.where(jnp.isfinite(Mq), Mq, 0.0).reshape(n_heads, f_out)
    mq = jnp.where(jnp.isfinite(mq), mq, 0.0).reshape(n_heads, f_out)
    whi3 = jax.lax.stop_gradient(whi).reshape(n, n_heads, f_out)
    a_pos = jnp.maximum(params.a, 0.0)
    a_neg = jnp.minimum(params.a, 0.0)
    ub = jnp.einsum("nhf,hf->hn", leaky_relu(whi3 + Mq[None], alpha), a_pos)
    ub = ub + jnp.einsum("nhf,hf->hn", leaky_relu(whi3 + mq[None], alpha), a_neg)
    ub = jax.lax.stop_gradient(ub)
    num = jnp.where(graph.edge_mask[None, :],
                    jnp.exp(logits - ub[:, graph.receivers]), 0.0)
    if use_drop:
        keep_att, q_att = _keep(k_att, keep, num.shape)
        qnum = jnp.where(keep_att, num / q_att, 0.0)
    else:
        qnum = num

    gathered = gather_senders(whi, graph)  # [E, H*F]
    # one fused segment reduction: aggregation + pre-dropout denominator
    msgs = jnp.concatenate(
        [
            (gathered.reshape(e_pad, n_heads, f_out)
             * jnp.moveaxis(qnum, 0, 1)[:, :, None]).reshape(e_pad, hf),
            jnp.moveaxis(num, 0, 1),  # [E, H]
        ],
        axis=1,
    )
    agg = segment_sum_receivers(msgs, graph)  # [N, HF + H]

    out = softmax_div(agg[:, :hf].reshape(n, n_heads, f_out), agg[:, hf:])

    return _heads_tail(out, params, h, x_h, concat)

