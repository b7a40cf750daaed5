"""Transductive trainer CLI (Cora / Citeseer / Pubmed).

Same interface as the reference ``train.py`` (flags at train.py:31-45;
per-dataset presets at train.py:47-87), plus TPU-specific knobs:

    python -m pygat_tpu.cli.train --dataset cora --model GAT_sparse

New flags: --backend {stream,xla}, --platform, --checkpoint-dir, --jsonl,
--log-every, --no-checkpoint.
"""

from __future__ import annotations

import argparse
import os
import random
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="pygat_tpu transductive trainer")
    p.add_argument("--no-cuda", action="store_true", default=False,
                   help="(reference compat; accepted and ignored — device is the JAX platform)")
    p.add_argument("--fastmode", action="store_true", default=False,
                   help="Validate during training pass.")
    p.add_argument("--dataset", type=str, default="cora",
                   choices=["cora", "pubmed", "citeseer"])
    p.add_argument("--model", type=str, default="GAT_sparse",
                   choices=["GAT_sparse", "GAT", "GATv2", "GATv2_sparse"],
                   help="GAT/GATv2 are the DENSE parity paths: they match "
                        "the reference exactly (incl. training datasets the "
                        "reference OOMs on) but run the O(N^2) attention — "
                        "an order of magnitude slower than the *_sparse "
                        "models; use the sparse variants for speed")
    p.add_argument("--seed", type=int, default=72)
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--patience", type=int, default=100)
    # --- new, TPU-native ---
    p.add_argument("--backend", type=str, default=None,
                   choices=["stream", "xla"],
                   help="sparse kernel backend: stream = fused Pallas "
                        "attention + stream-scatter segment sums (TPU "
                        "default), xla = scatter lowering (the round-1 "
                        "BCSR kernel was retired to tests/legacy_bcsr "
                        "in round 4)")
    p.add_argument("--corner", type=str, default=None,
                   choices=["auto", "on", "off"],
                   help="gather-free fused-attention window build for "
                        "million-node graphs (CSC expand + corner-turn "
                        "instead of a serialized row gather); auto = on "
                        "above PYGAT_CORNER_N padded nodes (measured round 4: "
                        "never wins on v5e, so auto never selects it)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. cpu)")
    p.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    p.add_argument("--no-checkpoint", action="store_true", default=False)
    p.add_argument("--jsonl", type=str, default=None, help="JSONL metrics path")
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--resume", dest="resume_training", action="store_true",
                   default=False,
                   help="continue from the newest checkpoint in "
                        "--checkpoint-dir (full state: params, optimizer "
                        "moments, RNG key, best-val bookkeeping)")
    p.add_argument("--reorder", action="store_true", default=False,
                   help="RCM node relabeling (isomorphic; packs neighborhoods "
                        "into few 128-node tiles — what the panel-gather "
                        "path needs on million-node graphs)")
    p.add_argument("--mesh", type=str, default=None, metavar="D,M",
                   help="multi-chip SPMD: 'data,model' mesh sizes (e.g. 4,2) "
                        "— node/edge arrays shard on data, head-stacked "
                        "params on model; requires D*M visible devices")
    p.add_argument("--partition", type=str, default="gspmd",
                   choices=["gspmd", "ring"],
                   help="with --mesh: 'gspmd' = XLA-inserted collectives "
                        "(segment ops fall back to scatter), 'ring' = "
                        "ppermute halo exchange running the Pallas stream "
                        "kernel per shard (the multi-chip fast path; sparse "
                        "models only)")
    p.add_argument("--epoch-chunk", type=int, default=1,
                   help=">1: run K epochs per device dispatch (lax.scan) with "
                        "on-device best-params tracking — much faster wall "
                        "clock on remote-attached TPUs; checkpoints at chunk "
                        "boundaries instead of every epoch")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="multi-host: call jax.distributed.initialize() before "
                        "mesh construction (coordinator/process env from the "
                        "launcher, e.g. a TPU pod slice); harmless no-op on a "
                        "single-process run")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    random.seed(args.seed)
    np.random.seed(args.seed)

    # Multi-host init must run BEFORE the first JAX computation: load_citation
    # device-puts arrays, which initializes the local backend and makes
    # jax.distributed.initialize() raise (ADVICE r4; train_ppi.py already
    # ordered it this way).
    if args.distributed:
        from pygat_tpu.parallel.mesh import initialize_distributed

        multi = initialize_distributed()
        import jax as _jax
        print(f"distributed init: {'multi-host' if multi else 'single-host'} "
              f"({len(_jax.devices())} global / "
              f"{len(_jax.local_devices())} local devices)")

    from pygat_tpu.data.citation import dataset_stats, load_citation
    from pygat_tpu.models.gat import GATConfig
    from pygat_tpu.models.presets import PRESETS, TRAIN_PRESETS
    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import fit_transductive, fit_transductive_fast

    if args.backend:
        from pygat_tpu.ops.segment import set_segment_impl

        # 'stream' = Pallas stream/fused pipeline, 'xla' = scatter lowering
        set_segment_impl("stream" if args.backend == "stream" else "scatter")
    if args.corner:
        from pygat_tpu.ops.large import set_corner

        set_corner(args.corner)

    data = load_citation(args.dataset, data_root=args.data_root,
                         reorder=args.reorder)
    stats = dataset_stats(data)
    print(f"Number of nodes: {stats['nodes']}")
    print(f"Number of edges: {stats['edges']}")
    print(f"Number of input features: {stats['input_features']}")
    print(f"Number of classes: {stats['classes']}")
    print(f"Number of training nodes: {stats['train_nodes']}")
    print(f"Number of validation nodes: {stats['val_nodes']}")
    print(f"Number of test nodes: {stats['test_nodes']}")
    if stats["synthetic_parts"]:
        print(f"WARNING: synthetic stand-ins for: {stats['synthetic_parts']}")

    cfg = GATConfig(layer_type=args.model, **PRESETS[args.dataset])
    # first-layer width follows the LANE-padded feature matrix (padding
    # columns are zero; static shape keeps the matmul MXU-aligned)
    cfg = cfg._replace(nfeats=(int(data.features.shape[1]),) + cfg.nfeats[1:])
    tp = TRAIN_PRESETS[args.dataset]
    logger = TrainLogger(jsonl_path=args.jsonl)

    print("start training")
    t0 = time.time()
    common = dict(
        lr=tp["lr"],
        weight_decay=tp["weight_decay"],
        epochs=args.epochs,
        patience=args.patience,
        seed=args.seed,
        fastmode=args.fastmode,
        checkpoint_dir=None if args.no_checkpoint else args.checkpoint_dir,
        dataset_tag=args.dataset,
        logger=logger,
        log_every=args.log_every,
    )
    mesh = None
    if args.mesh:
        from pygat_tpu.parallel.mesh import make_mesh

        n_data, n_model = (int(v) for v in args.mesh.split(","))
        mesh = make_mesh(n_data, n_model)
        print(f"mesh: data={n_data} model={n_model} "
              f"partition={args.partition}")
    if args.epoch_chunk > 1:
        result = fit_transductive_fast(cfg, data, epoch_chunk=args.epoch_chunk,
                                       mesh=mesh, resume=args.resume_training,
                                       partition=args.partition, **common)
    else:
        result = fit_transductive(cfg, data, resume=args.resume_training,
                                  mesh=mesh, partition=args.partition,
                                  **common)
    print("Optimization Finished!")
    print("Total time elapsed: {:.4f}s".format(time.time() - t0))
    print("Loading {}th epoch".format(result.best_epoch))
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
