"""Multi-layer multi-head GAT model (head-batched, functional).

Re-design of the reference container (models.py:7-35): instead of H*L
independent ``nn.Module`` heads, each layer's heads live in one stacked
``[H, ...]`` parameter tree and run under ``jax.vmap`` — one big einsum per
layer on the MXU instead of H small matmuls. Semantics preserved:

* ``nheads`` is preceded by an implicit 1 (models.py:12); layer ``i`` takes
  ``nfeats[i] * nheads[i-1]`` inputs and emits ``nfeats[i+1]`` per head.
* non-final layers: per-head ELU then concat (head-major feature blocks,
  models.py:32); final layer: mean over heads, no activation (models.py:34).
* every head draws its own dropout masks (each reference head module calls
  F.dropout independently on the same input).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pygat_tpu.graph import Graph
from pygat_tpu.models import init as gini
from pygat_tpu.models.layers import (
    V1Params,
    V2Params,
    gat_v1_dense,
    gat_v1_sparse,
    gat_v2_dense,
    gat_v2_sparse,
)

LAYER_TYPES = ("GAT", "GAT_sparse", "GATv2", "GATv2_sparse")

# Dense attention switches from vmapped heads to sequential rematerialized
# heads above this many bytes of [H, N, N] attention (see apply_gat).
_DENSE_VMAP_BYTES = int(
    __import__("os").environ.get("PYGAT_DENSE_VMAP_BYTES", 2 << 30)
)


class GATConfig(NamedTuple):
    nlayers: int
    nheads: tuple[int, ...]  # heads per layer, e.g. (8, 1)
    nfeats: tuple[int, ...]  # len == nlayers + 1, e.g. (1433, 8, 7)
    dropout: float
    alpha: float
    layer_type: str = "GAT_sparse"
    skip_connection: bool = False

    @property
    def is_sparse(self) -> bool:
        return self.layer_type.endswith("_sparse")

    @property
    def is_v2(self) -> bool:
        return self.layer_type.startswith("GATv2")


def layer_dims(cfg: GATConfig, i: int) -> tuple[int, int, int]:
    """(in_features, out_features, heads) of layer i, reference models.py:18-25."""
    heads = (1,) + tuple(cfg.nheads)
    return cfg.nfeats[i] * heads[i], cfg.nfeats[i + 1], heads[i + 1]


def init_gat(key: jax.Array, cfg: GATConfig) -> list[Any]:
    """Per-layer stacked-head parameter trees, reference init distributions
    (xavier uniform for dense variants, xavier normal for sparse; skip
    projections always uniform — layers.py:22,112,119,193,248)."""
    if cfg.layer_type not in LAYER_TYPES:
        raise ValueError(f"unknown layer_type {cfg.layer_type!r}")
    if len(cfg.nfeats) != cfg.nlayers + 1 or len(cfg.nheads) != cfg.nlayers:
        raise ValueError("nfeats must have nlayers+1 entries, nheads nlayers")
    w_init = gini.xavier_normal if cfg.is_sparse else gini.xavier_uniform

    params: list[Any] = []
    for i in range(cfg.nlayers):
        f_in, f_out, h = layer_dims(cfg, i)
        key, kw, ka, ks = jax.random.split(key, 4)
        skip = (
            gini.xavier_uniform(ks, (h, f_in, f_out), f_in + f_out)
            if cfg.skip_connection
            else None
        )
        if cfg.is_v2:
            params.append(
                V2Params(
                    W=w_init(kw, (h, 2 * f_in, f_out), 2 * f_in + f_out),
                    a=w_init(ka, (h, f_out), f_out + 1),
                    skip=skip,
                )
            )
        else:
            params.append(
                V1Params(
                    W=w_init(kw, (h, f_in, f_out), f_in + f_out),
                    a=w_init(ka, (h, 2 * f_out), 2 * f_out + 1),
                    skip=skip,
                )
            )
    return params


def _head_fn(cfg: GATConfig):
    return {
        "GAT": gat_v1_dense,
        "GAT_sparse": gat_v1_sparse,
        "GATv2": gat_v2_dense,
        "GATv2_sparse": gat_v2_sparse,
    }[cfg.layer_type]


def apply_gat(
    params: list[Any],
    cfg: GATConfig,
    x: jax.Array,  # [N_pad, F0]
    graph: Graph,
    rng: jax.Array,
    *,
    train: bool,
    plans: Any = None,  # ops.large.CscCsrPlans: gather-free sparse layers
) -> jax.Array:
    """Forward pass; returns raw per-node outputs [N_pad, n_classes]
    (final layer has concat=False, so no activation — reference models.py:34;
    the transductive loss head adds ELU + log_softmax, train.py:151-152).

    Sparse layers take exactly two paths: the fused/stream Pallas pipeline
    (PYGAT_FUSED_ATTENTION / PYGAT_SEGMENT_IMPL, the TPU default) or the XLA
    scatter fallback — selected inside ops.segment / ops.fused_stream. The
    round-1 BCSR kernel was retired to tests/legacy_bcsr in round 4.
    """
    from pygat_tpu.utils.platform import dropout_key

    if train and cfg.dropout > 0.0:
        # hardware RNG (rbg) on TPU: threefry mask generation would dominate
        # the train step (~19 ms vs ~2 ms for Pubmed-scale per-head masks)
        rng = dropout_key(rng)

    if cfg.is_sparse:
        # head-batched TPU-layout path: heads folded into the minor axis
        # (a per-head vmap would drown in [H, N, F_out] pad/relayout traffic)
        from pygat_tpu.models.layers import gat_v1_sparse_heads, gat_v2_sparse_heads

        heads_fn = gat_v2_sparse_heads if cfg.is_v2 else gat_v1_sparse_heads
        h = x
        for i, layer_params in enumerate(params):
            concat = i < cfg.nlayers - 1
            rng, layer_key = jax.random.split(rng)
            h = heads_fn(
                layer_params, h, graph, layer_key,
                alpha=cfg.alpha, drop=cfg.dropout, concat=concat, train=train,
                # corner plans (million-node graphs) apply to the fused
                # branch only; ignored when the fused kernel is off
                plans=plans,
            )
        return h

    # Dense variants from here on (sparse returned above). The mask is
    # computed once per forward and shared by all layers — the reference's
    # `adj > 0` test (layers.py:41) against the densified normalized
    # adjacency (utils.py:55).
    fn = _head_fn(cfg)
    neighborhood: Any = graph.to_dense(binary=True) > 0

    from pygat_tpu.models.layers import NO_MASKS, draw_masks

    use_drop = train and cfg.dropout > 0.0
    n_pad = x.shape[0]
    h = x
    for i, layer_params in enumerate(params):
        concat = i < cfg.nlayers - 1
        n_heads = jax.tree_util.tree_leaves(layer_params)[0].shape[0]
        f_out = jax.tree_util.tree_leaves(layer_params)[0].shape[-1]
        rng, layer_key = jax.random.split(rng)

        def run_head(p, m, h=h, concat=concat):
            return fn(
                p,
                h,
                neighborhood,
                m,
                alpha=cfg.alpha,
                drop=cfg.dropout,
                concat=concat,
                train=train,
            )

        # Memory policy (VERDICT r1 item 7): the vmapped path materializes
        # [H, N, N] attention (and, in train, [H, N, N] dropout masks) —
        # ~12.6 GB each for the Pubmed dense preset, past one v5e's HBM
        # (the reference hits the same O(N^2) wall at ~7 GB, README.md:26).
        # Above the threshold, heads run SEQUENTIALLY under lax.scan with
        # jax.checkpoint: peak memory is a few [N, N] buffers regardless of
        # H, and the backward recomputes each head's attention instead of
        # saving it. Masks are drawn inside the checkpointed body, so they
        # are rematerialized too (deterministic per-head keys).
        big = n_heads * n_pad * n_pad * 4 > _DENSE_VMAP_BYTES
        if big:
            keys = jax.random.split(layer_key, n_heads)

            @jax.checkpoint
            def head_body(p, key, h=h, concat=concat):
                m = (
                    draw_masks(
                        key, cfg.layer_type, cfg.dropout,
                        n=h.shape[0], f_in=h.shape[1], f_out=f_out, e=0,
                    )
                    if use_drop
                    else NO_MASKS
                )
                return run_head(p, m, h=h, concat=concat)

            def step(_, ph):
                p, key = ph
                return None, head_body(p, key)

            _, outs = jax.lax.scan(step, None, (layer_params, keys))
        elif use_drop:
            # per-head masks drawn in ONE bernoulli per site ([H, ...]):
            # vmapping per-head PRNG keys serializes the hardware generator
            masks = draw_masks(
                layer_key, cfg.layer_type, cfg.dropout,
                n=h.shape[0], f_in=h.shape[1], f_out=f_out,
                e=graph.num_edges_padded, heads=n_heads,
            )
            outs = jax.vmap(run_head)(layer_params, masks)  # [H, N, F_out]
        else:
            outs = jax.vmap(lambda p: run_head(p, NO_MASKS))(layer_params)
        if concat:
            # torch.cat(head outputs, dim=1): head-major feature blocks.
            h = jnp.moveaxis(outs, 0, 1).reshape(outs.shape[1], -1)
        else:
            h = jnp.mean(outs, axis=0)
    return h


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
