"""Fused Pallas TPU kernel: SDDMM logits + online segment-softmax + SpMM.

One kernel replaces the reference's whole sparse attention pipeline
(reference layers.py:141-160: per-edge logits, scatter_max stabilization,
exp, two SpecialSpmm calls, divide). Per edge-chunk grid step, for ALL
heads at once:

    l[h,e]   = leaky_relu(f_dst[h,recv_e] + f_src[h,send_e])    (SDDMM, v1)
    num[h,e] = exp(l[h,e] - m_row[h,recv_e])                    (online max)
    out[h,i] = sum_e num[h,e] * Wh[h,send_e] / sum_e num[h,e]   (SpMM)

Design notes (TPU-first):
* per-edge gather/scatter is expressed as one-hot matmuls over 128-node
  tiles (pygat_tpu.ops.tiles BCSR layout), so the hot ops land on the MXU;
* the one-hot incidence tiles are head-independent — building them once per
  chunk and unrolling the (static) head loop amortizes the VPU work and
  cuts grid steps by H;
* the segment softmax keeps flash-attention-style running (max, denom, out)
  accumulators per (head, row tile) in VMEM — the same online trick that
  generalizes to ring/distributed softmax (SURVEY §5);
* attention values never round-trip to HBM: per-chip traffic is ~E edge
  descriptors + one pass over Wh tiles + one output write — the HBM
  speed-of-light regime for SpMM.

Mosaic layout notes: edge chunks are packed 8-per-block ([C/8, 8, EC]);
the per-node logit components are laid out [n_tiles, H, TILE] so one row
(col) tile's components form a legal (H, TILE) block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygat_tpu.ops.tiles import EDGE_CHUNK, TILE, TiledGraph

NEG = -1e30


def _make_kernel(alpha: float, n_chunks: int, n_heads: int, precision):
    def kernel(
        chunk_row_ref,  # [C] int32 (scalar prefetch, SMEM)
        chunk_col_ref,  # [C] int32 (scalar prefetch, SMEM)
        f_dst_ref,  # [1, H, TILE]  row tile I components, all heads
        f_src_ref,  # [1, H, TILE]  col tile J components, all heads
        wh_ref,  # [H, TILE, F]     col tile J features, all heads
        recv_ref,  # [1, 8, EC] int32 (8 packed chunks)
        send_ref,  # [1, 8, EC] int32
        valid_ref,  # [1, 8, EC] f32
        drop_ref,  # [1, 8, EC] f32: numerator multiplier (dropout keep/(1-p);
                   # equals `valid` when dropout is off)
        out_ref,  # [H, TILE, F]
        m_ref,  # [H, TILE, 1] scratch: running row max
        d_ref,  # [H, TILE, 1] scratch: running denominator
        o_ref,  # [H, TILE, F] scratch: running weighted sum
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
        v = valid_ref[0, sub, :][None, :]  # [1, EC]
        dropv = drop_ref[0, sub, :][None, :]  # [1, EC]

        # head-independent one-hot incidence tiles (built once per chunk)
        tids = jax.lax.broadcasted_iota(jnp.int32, (TILE, EDGE_CHUNK), 0)
        mr = (tids == rl[None, :]).astype(jnp.float32)
        ms = (tids == sl[None, :]).astype(jnp.float32)
        fdb = f_dst_ref[0]  # [H, TILE]
        fsb = f_src_ref[0]

        for h in range(n_heads):  # static unroll; shares mr/ms across heads
            fd = fdb[h : h + 1, :]  # [1, TILE]
            fs = fsb[h : h + 1, :]
            wh = wh_ref[h]  # [TILE, F]

            l_dst = jnp.dot(fd, mr, preferred_element_type=jnp.float32, precision=precision)  # [1, EC]
            l_src = jnp.dot(fs, ms, preferred_element_type=jnp.float32, precision=precision)
            pre = l_dst + l_src
            logit = jnp.where(pre >= 0, pre, alpha * pre)
            logit = jnp.where(v > 0, logit, NEG)

            z = jnp.where(mr > 0, logit, NEG)  # [TILE, EC]
            cm = jnp.max(z, axis=1, keepdims=True)  # [TILE, 1]
            m_new = jnp.maximum(m_ref[h], cm)
            scale = jnp.exp(m_ref[h] - m_new)  # finite: NEG - NEG == 0

            mg = jnp.sum(mr * m_new, axis=0, keepdims=True)  # [1, EC]
            num = jnp.exp(logit - mg) * v  # [1, EC]
            # reference dropout order (layers.py:150-160): denominator from
            # PRE-dropout numerators, aggregation from dropped numerators
            qnum = num * dropv

            g = jax.lax.dot_general(
                ms, wh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [EC, F]

            num_col = num.reshape(EDGE_CHUNK, 1)
            qnum_col = qnum.reshape(EDGE_CHUNK, 1)
            d_ref[h] = d_ref[h] * scale + jnp.dot(
                mr, num_col, preferred_element_type=jnp.float32, precision=precision
            )
            o_ref[h] = o_ref[h] * scale + jnp.dot(
                mr, qnum_col * g, preferred_element_type=jnp.float32,
                precision=precision,
            )
            m_ref[h] = m_new

        @pl.when(is_last)
        def _():
            d = d_ref[:]
            out_ref[:] = o_ref[:] / jnp.where(d > 0, d, 1.0)

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
    if f % 128:
        raise ValueError(f"feature dim {f} must be padded to 128")
    if c % 8:
        raise ValueError(f"chunk count {c} must be a multiple of 8 (tile_graph pads)")

    # [n_tiles, H, TILE]: one tile's components for all heads = one block
    f_dst_t = jnp.moveaxis(f_dst.reshape(h, n_tiles, TILE), 0, 1)
    f_src_t = jnp.moveaxis(f_src.reshape(h, n_tiles, TILE), 0, 1)
    recv8 = tiles.recv_local.reshape(c // 8, 8, EDGE_CHUNK)
    send8 = tiles.send_local.reshape(c // 8, 8, EDGE_CHUNK)
    valid8 = tiles.valid.reshape(c // 8, 8, EDGE_CHUNK)
    if drop8 is None:
        drop8 = valid8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, h, TILE), lambda i, cr, cc: (cr[i], 0, 0)),
            pl.BlockSpec((1, h, TILE), lambda i, cr, cc: (cc[i], 0, 0)),
            pl.BlockSpec((h, TILE, f), lambda i, cr, cc: (0, cc[i], 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda i, cr, cc: (i // 8, 0, 0)),
        ],
        out_specs=pl.BlockSpec((h, TILE, f), lambda i, cr, cc: (0, cr[i], 0)),
        scratch_shapes=[
            pltpu.VMEM((h, TILE, 1), jnp.float32),
            pltpu.VMEM((h, TILE, 1), jnp.float32),
            pltpu.VMEM((h, TILE, f), jnp.float32),
        ],
    )

    return pl.pallas_call(
        _make_kernel(alpha, c, h, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, n_pad, f), jnp.float32),
        interpret=interpret,
    )(
        tiles.chunk_row,
        tiles.chunk_col,
        f_dst_t,
        f_src_t,
        wh,
        recv8,
        send8,
        valid8,
        drop8,
    )
