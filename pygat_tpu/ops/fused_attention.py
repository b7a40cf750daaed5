"""Fused Pallas TPU kernel: SDDMM logits + online segment-softmax + SpMM.

One kernel replaces the reference's whole sparse attention pipeline
(reference layers.py:141-160: per-edge logits, scatter_max stabilization,
exp, two SpecialSpmm calls, divide). Per (head, edge-chunk) grid step:

    l[e]   = leaky_relu(f_dst[recv_e] + f_src[send_e])        (SDDMM, v1)
    num[e] = exp(l[e] - m_row[recv_e])                         (online max)
    out[i] = sum_e num[e] * Wh[send_e] / sum_e num[e]          (SpMM)

All per-edge gather/scatter is expressed as one-hot matmuls over 128-node
tiles (see pygat_tpu.ops.tiles), so the hot ops land on the MXU; the
segment softmax keeps a flash-attention-style running (max, denom, out)
accumulator per row tile in VMEM — the same online trick that generalizes
to the ring/distributed softmax (SURVEY §5 long-context analogue).

Attention values never round-trip to HBM: per-chip traffic is ~E edge
descriptors + one pass over Wh tiles + one output write — the HBM
speed-of-light regime for SpMM.

Mosaic layout notes: edge chunks are packed 8-per-block ([C/8, 8, EC]
blocks satisfy the (8, 128) tile rule); the per-node logit components
f_dst/f_src stay fully VMEM-resident per head ([n_tiles, TILE] block) and
are row-selected dynamically — fine up to ~1M nodes per head-step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pygat_tpu.ops.tiles import EDGE_CHUNK, TILE, TiledGraph

NEG = -1e30


def _make_kernel(alpha: float, n_chunks: int):
    def kernel(
        chunk_row_ref,  # [C] int32 (scalar prefetch, SMEM)
        chunk_col_ref,  # [C] int32 (scalar prefetch, SMEM)
        f_dst_ref,  # [1, n_tiles, TILE] (resident per head)
        f_src_ref,  # [1, n_tiles, TILE]
        wh_ref,  # [1, TILE, F] (col tile J)
        recv_ref,  # [1, 8, EC] int32 (8 packed chunks)
        send_ref,  # [1, 8, EC] int32
        valid_ref,  # [1, 8, EC] f32
        out_ref,  # [1, TILE, F]
        m_ref,  # [TILE, 1] scratch: running row max
        d_ref,  # [TILE, 1] scratch: running denominator
        o_ref,  # [TILE, F] scratch: running weighted sum
    ):
        i = pl.program_id(1)
        row = chunk_row_ref[i]
        col = chunk_col_ref[i]
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
        fd = f_dst_ref[0, pl.ds(row, 1), :]  # [1, TILE]
        fs = f_src_ref[0, pl.ds(col, 1), :]
        wh = wh_ref[0]  # [TILE, F]

        # one-hot incidence tiles: mr[t, e] = (recv_e == t); ms likewise
        tids = jax.lax.broadcasted_iota(jnp.int32, (TILE, EDGE_CHUNK), 0)
        mr = (tids == rl[None, :]).astype(jnp.float32)
        ms = (tids == sl[None, :]).astype(jnp.float32)

        # SDDMM logits via one-hot gathers (MXU)
        l_dst = jnp.dot(fd, mr, preferred_element_type=jnp.float32)  # [1, EC]
        l_src = jnp.dot(fs, ms, preferred_element_type=jnp.float32)
        pre = l_dst + l_src
        logit = jnp.where(pre >= 0, pre, alpha * pre)
        logit = jnp.where(v > 0, logit, NEG)

        # online max update (column form [TILE, 1] matches the accumulators)
        z = jnp.where(mr > 0, logit, NEG)  # [TILE, EC]
        cm = jnp.max(z, axis=1, keepdims=True)  # [TILE, 1]
        m_new = jnp.maximum(m_ref[:], cm)
        scale = jnp.exp(m_ref[:] - m_new)  # finite: NEG - NEG == 0

        # per-edge gather of m_new: mg[e] = m_new[recv_e]
        mg = jnp.sum(mr * m_new, axis=0, keepdims=True)  # [1, EC]
        num = jnp.exp(logit - mg) * v  # [1, EC]

        # gather sender rows: g[e, :] = wh[send_e, :]  (MXU)
        g = jax.lax.dot_general(
            ms, wh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [EC, F]

        num_col = num.reshape(EDGE_CHUNK, 1)
        d_ref[:] = d_ref[:] * scale + jnp.dot(
            mr, num_col, preferred_element_type=jnp.float32
        )
        o_ref[:] = o_ref[:] * scale + jnp.dot(
            mr, num_col * g, preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

        @pl.when(is_last)
        def _():
            d = d_ref[:]
            out_ref[0] = o_ref[:] / jnp.where(d > 0, d, 1.0)

    return kernel


def fused_gat_attention_fwd(
    f_dst: jax.Array,  # [H, N_pad] receiver logit components
    f_src: jax.Array,  # [H, N_pad] sender logit components
    wh: jax.Array,  # [H, N_pad, F] projected features (aggregation source)
    tiles: TiledGraph,
    *,
    alpha: float,
    interpret: bool = False,
) -> jax.Array:
    """[H, N_pad, F]: attention-softmax-weighted neighbor aggregation (v1)."""
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

    f_dst_t = f_dst.reshape(h, n_tiles, TILE)
    f_src_t = f_src.reshape(h, n_tiles, TILE)
    recv8 = tiles.recv_local.reshape(c // 8, 8, EDGE_CHUNK)
    send8 = tiles.send_local.reshape(c // 8, 8, EDGE_CHUNK)
    valid8 = tiles.valid.reshape(c // 8, 8, EDGE_CHUNK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h, c),
        in_specs=[
            pl.BlockSpec((1, n_tiles, TILE), lambda hh, i, cr, cc: (hh, 0, 0)),
            pl.BlockSpec((1, n_tiles, TILE), lambda hh, i, cr, cc: (hh, 0, 0)),
            pl.BlockSpec((1, TILE, f), lambda hh, i, cr, cc: (hh, cc[i], 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda hh, i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda hh, i, cr, cc: (i // 8, 0, 0)),
            pl.BlockSpec((1, 8, EDGE_CHUNK), lambda hh, i, cr, cc: (i // 8, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TILE, f), lambda hh, i, cr, cc: (hh, cr[i], 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, 1), jnp.float32),
            pltpu.VMEM((TILE, f), jnp.float32),
        ],
    )

    return pl.pallas_call(
        _make_kernel(alpha, c),
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
    )
