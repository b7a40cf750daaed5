"""Fused Pallas TPU kernel: SDDMM logits + online segment-softmax + SpMM.

One kernel replaces the reference's whole sparse attention pipeline
(reference layers.py:141-160: per-edge logits, scatter_max stabilization,
exp, two SpecialSpmm calls, divide). Per edge-chunk grid step, for ALL
heads at once:

    l[e,h]   = leaky_relu(f_dst[recv_e,h] + f_src[send_e,h])    (SDDMM, v1)
    num[e,h] = exp(l[e,h] - m_row[recv_e,h])                    (online max)
    out[i,(h,f)] = sum_e num[e,h] * Wh[send_e,(h,f)] / sum_e num[e,h]

Design notes (TPU-first):
* per-edge gather/scatter is expressed as one-hot matmuls over 128-node
  tiles (pygat_tpu.ops.tiles BCSR layout), so the hot ops land on the MXU;
* heads are FOLDED INTO THE MINOR AXIS everywhere: per-edge quantities are
  [EDGE_CHUNK, H], features are [TILE, H*F_pad] — one batched matmul per
  pipeline stage instead of a per-head loop of skinny matmuls, and F is
  padded only until H*F_pad is lane-aligned (2x for the 8-head/8-feature
  citation presets, vs 16x for a naive F->128 pad);
* head-expansion ([*, H] -> [*, H*F_pad]) is itself a one-hot matmul
  against a constant [H, H*F_pad] block-expander built from iota — no
  in-kernel transposes or reshapes;
* the segment softmax keeps flash-attention-style running (max, denom, out)
  accumulators per row tile in VMEM — the same online trick that
  generalizes to ring/distributed softmax (SURVEY §5);
* attention values never round-trip to HBM: per-chip traffic is ~E edge
  descriptors + one pass over Wh tiles + one output write.

Mosaic layout notes: edge chunks are packed 8-per-block ([C/8, 8, EC]);
per-node logit components are [n_tiles, TILE, H] so one tile's components
form a legal (TILE, H) block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tests.legacy_bcsr.tiles import EDGE_CHUNK, TILE, TiledGraph

NEG = -1e30
LANE = 128


def head_feature_pad(n_heads: int, f: int) -> int:
    """Smallest f_pad >= f with n_heads * f_pad a multiple of the lane width."""
    f_pad = f
    while (n_heads * f_pad) % LANE:
        f_pad += 1
    return f_pad


def _make_kernel(alpha: float, n_chunks: int, n_heads: int, f_pad: int, precision):
    hf = n_heads * f_pad

    def kernel(
        chunk_row_ref,  # [C] int32 (scalar prefetch, SMEM)
        chunk_col_ref,  # [C] int32 (scalar prefetch, SMEM)
        f_dst_ref,  # [1, TILE, H]  row tile I logit components
        f_src_ref,  # [1, TILE, H]  col tile J logit components
        wh_ref,  # [TILE, HF]       col tile J features, heads folded
        recv_ref,  # [1, 8, EC] int32 (8 packed chunks)
        send_ref,  # [1, 8, EC] int32
        valid_ref,  # [1, 8, EC] f32
        drop_ref,  # [1, 8, EC] f32: numerator multiplier (dropout keep/(1-p);
                   # equals `valid` when dropout is off)
        out_ref,  # [TILE, HF]
        m_ref,  # [TILE, H] scratch: running row max
        d_ref,  # [TILE, H] scratch: running denominator
        o_ref,  # [TILE, HF] scratch: running weighted sum
    ):
        i = pl.program_id(0)
        row = chunk_row_ref[i]
        sub = i % 8
        is_first = jnp.logical_or(
            i == 0, chunk_row_ref[jnp.maximum(i - 1, 0)] != row
        )
        is_last = jnp.logical_or(
            i == n_chunks - 1, chunk_row_ref[jnp.minimum(i + 1, n_chunks - 1)] != row
        )

        @pl.when(is_first)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG)
            d_ref[:] = jnp.zeros_like(d_ref)
            o_ref[:] = jnp.zeros_like(o_ref)

        rl = recv_ref[0, sub, :]  # [EC] int32
        sl = send_ref[0, sub, :]
        v = valid_ref[0, sub, :]  # [EC]
        dropv = drop_ref[0, sub, :]

        # one-hot incidence tiles, both orientations, from iota compares
        t_te = jax.lax.broadcasted_iota(jnp.int32, (TILE, EDGE_CHUNK), 0)
        mr = (t_te == rl[None, :]).astype(jnp.float32)  # [TILE, EC]
        ms = (t_te == sl[None, :]).astype(jnp.float32)
        t_et = jax.lax.broadcasted_iota(jnp.int32, (EDGE_CHUNK, TILE), 1)
        mr_t = (t_et == rl[:, None]).astype(jnp.float32)  # [EC, TILE]
        ms_t = (t_et == sl[:, None]).astype(jnp.float32)

        # constant head-expander: EXP[h, h*f_pad + f] = 1
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (n_heads, hf), 1)
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (n_heads, hf), 0)
        expander = (k_ids // f_pad == h_ids).astype(jnp.float32)  # [H, HF]

        # SDDMM logits for all heads: [EC, H]
        l_dst = jnp.dot(mr_t, f_dst_ref[0], preferred_element_type=jnp.float32,
                        precision=precision)
        l_src = jnp.dot(ms_t, f_src_ref[0], preferred_element_type=jnp.float32,
                        precision=precision)
        pre = l_dst + l_src
        logit = jnp.where(pre >= 0, pre, alpha * pre)
        logit = jnp.where(v[:, None] > 0, logit, NEG)  # [EC, H]

        # per-head chunk row-max (VPU; static unroll over heads)
        cm_cols = []
        for h in range(n_heads):
            z = jnp.where(mr > 0, logit[:, h][None, :], NEG)  # [TILE, EC]
            cm_cols.append(jnp.max(z, axis=1))  # [TILE]
        cm = jnp.stack(cm_cols, axis=1)  # [TILE, H]

        m_new = jnp.maximum(m_ref[:, :], cm)
        scale = jnp.exp(m_ref[:, :] - m_new)  # finite: NEG - NEG == 0

        mg = jnp.dot(mr_t, m_new, preferred_element_type=jnp.float32,
                     precision=precision)  # [EC, H]
        num = jnp.exp(logit - mg) * v[:, None]  # [EC, H]
        # reference dropout order (layers.py:150-160): denominator from
        # PRE-dropout numerators, aggregation from dropped numerators
        qnum = num * dropv[:, None]

        g = jnp.dot(ms_t, wh_ref[:, :], preferred_element_type=jnp.float32,
                    precision=precision)  # [EC, HF]
        qb = jnp.dot(qnum, expander, preferred_element_type=jnp.float32,
                     precision=precision)  # [EC, HF]

        d_ref[:, :] = d_ref[:, :] * scale + jnp.dot(
            mr, num, preferred_element_type=jnp.float32, precision=precision
        )
        o_scale = jnp.dot(scale, expander, preferred_element_type=jnp.float32,
                          precision=precision)  # [TILE, HF]
        o_ref[:, :] = o_ref[:, :] * o_scale + jnp.dot(
            mr, qb * g, preferred_element_type=jnp.float32, precision=precision
        )
        m_ref[:, :] = m_new

        @pl.when(is_last)
        def _():
            d = d_ref[:, :]
            db = jnp.dot(jnp.where(d > 0, d, 1.0), expander,
                         preferred_element_type=jnp.float32, precision=precision)
            out_ref[:, :] = o_ref[:, :] / db

    return kernel


def fused_gat_attention_fwd(
    f_dst: jax.Array,  # [H, N_pad] receiver logit components
    f_src: jax.Array,  # [H, N_pad] sender logit components
    wh: jax.Array,  # [H, N_pad, F] projected features (aggregation source)
    tiles: TiledGraph,
    *,
    alpha: float,
    drop8: jax.Array | None = None,  # [C/8, 8, EC] numerator multiplier
    interpret: bool = False,
    precision: str = "default",
) -> jax.Array:
    """[H, N_pad, F]: attention-softmax-weighted neighbor aggregation (v1).

    ``precision``: 'default' uses the platform's MXU f32 mode (bf16-class
    multiplies, ~1e-2 abs error vs exact — same regime as every other f32
    matmul on TPU); 'highest' forces the f32x3 decomposition (~3x MXU cost,
    ~1e-6 error) for parity testing.
    """
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    h, n_pad = f_dst.shape
    f = wh.shape[-1]
    n_tiles = tiles.n_tiles
    c = tiles.num_chunks
    if n_pad != n_tiles * TILE:
        raise ValueError(f"N_pad={n_pad} inconsistent with {n_tiles} tiles")
    if c % 8:
        raise ValueError(f"chunk count {c} must be a multiple of 8 (tile_graph pads)")

    f_pad = head_feature_pad(h, f)
    hf = h * f_pad

    # [n_tiles, TILE, H]: one tile's logit components, heads minor
    f_dst_t = jnp.moveaxis(f_dst, 0, 1).reshape(n_tiles, TILE, h)
    f_src_t = jnp.moveaxis(f_src, 0, 1).reshape(n_tiles, TILE, h)
    # [N_pad, H*F_pad]: features with heads folded into the minor axis
    wh_p = wh if f == f_pad else jnp.pad(wh, ((0, 0), (0, 0), (0, f_pad - f)))
    wh2d = jnp.moveaxis(wh_p, 0, 1).reshape(n_pad, hf)
    recv8 = tiles.recv_local.reshape(c // 8, 8, EDGE_CHUNK)
    send8 = tiles.send_local.reshape(c // 8, 8, EDGE_CHUNK)
    valid8 = tiles.valid.reshape(c // 8, 8, EDGE_CHUNK)
    if drop8 is None:
        drop8 = valid8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, TILE, h), lambda i, cr, cc: (cr[i], 0, 0)),
            pl.BlockSpec((1, TILE, h), lambda i, cr, cc: (cc[i], 0, 0)),
            pl.BlockSpec((TILE, hf), lambda i, cr, cc: (cc[i], 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, hf), lambda i, cr, cc: (cr[i], 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE, h), jnp.float32),
            pltpu.VMEM((TILE, h), jnp.float32),
            pltpu.VMEM((TILE, hf), jnp.float32),
        ],
    )

    out2d = pl.pallas_call(
        _make_kernel(alpha, c, h, f_pad, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, hf), jnp.float32),
        interpret=interpret,
    )(
        tiles.chunk_row,
        tiles.chunk_col,
        f_dst_t,
        f_src_t,
        wh2d,
        recv8,
        send8,
        valid8,
        drop8,
    )
    out = jnp.moveaxis(out2d.reshape(n_pad, h, f_pad), 0, 1)
    return out[..., :f]
