"""Inductive PPI trainer CLI.

Same interface as the reference ``train_ppi.py`` (flags train_ppi.py:26-39,
config train_ppi.py:43-55):

    python -m pygat_tpu.cli.train_ppi --batch_size 2 --model GAT

The reference's checkpoint rotation/restore crashes after epoch 0
(train_ppi.py:198: int('0_ppi')); this implements the intended keep-best
policy shared with the transductive trainer.
"""

from __future__ import annotations

import argparse
import random
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="pygat_tpu inductive PPI trainer")
    p.add_argument("--no-cuda", action="store_true", default=False,
                   help="(reference compat; accepted and ignored)")
    p.add_argument("--fastmode", action="store_true", default=False)
    p.add_argument("--dataset", type=str, default="ppi", choices=["ppi"])
    p.add_argument("--model", type=str, default="GAT",
                   choices=["GAT_sparse", "GAT", "GATv2", "GATv2_sparse"])
    p.add_argument("--seed", type=int, default=72)
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=2,
                   help="Number of graphs that are passed during training")
    # --- new, TPU-native ---
    p.add_argument("--backend", type=str, default=None,
                   choices=["stream", "xla"])
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    p.add_argument("--no-checkpoint", action="store_true", default=False)
    p.add_argument("--jsonl", type=str, default=None)
    p.add_argument("--quiet-batches", action="store_true", default=False)
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--mesh", type=str, default=None, metavar="D,M",
                   help="inductive data parallelism (with --epoch-scan): "
                        "graph-batches sharded D-way with gradient "
                        "all-reduce; head params shard on the model axis")
    p.add_argument("--epoch-scan", action="store_true", default=False,
                   help="one device dispatch per train/eval epoch (lax.scan "
                        "over stacked batches) — much faster wall clock on "
                        "remote-attached TPUs; per-epoch logs only")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="multi-host: call jax.distributed.initialize() before "
                        "mesh construction (coordinator/process env from the "
                        "launcher); harmless no-op on a single-process run")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    random.seed(args.seed)
    np.random.seed(args.seed)

    from pygat_tpu.data.ppi import load_ppi
    from pygat_tpu.models.gat import GATConfig
    from pygat_tpu.models.presets import PRESETS, TRAIN_PRESETS
    from pygat_tpu.train.logging import TrainLogger
    from pygat_tpu.train.loop import (
        fit_inductive,
        fit_inductive_banked,
        fit_inductive_fast,
    )
    from pygat_tpu.utils.padding import round_up

    if args.backend:
        from pygat_tpu.ops.segment import set_segment_impl

        # 'stream' = Pallas stream/fused pipeline, 'xla' = scatter lowering
        set_segment_impl("stream" if args.backend == "stream" else "scatter")

    if args.distributed:
        from pygat_tpu.parallel.mesh import initialize_distributed

        multi = initialize_distributed()
        import jax as _jax
        print(f"distributed init: {'multi-host' if multi else 'single-host'} "
              f"({len(_jax.devices())} global / "
              f"{len(_jax.local_devices())} local devices)")

    data = load_ppi(data_root=args.data_root)
    print(f"PPI graphs: {len(data.train)} train / {len(data.valid)} valid / "
          f"{len(data.test)} test")
    if data.synthetic_parts:
        print(f"WARNING: synthetic stand-ins for: {list(data.synthetic_parts)}")

    cfg = GATConfig(layer_type=args.model, **PRESETS["ppi"])
    cfg = cfg._replace(nfeats=(round_up(cfg.nfeats[0]),) + cfg.nfeats[1:])
    tp = TRAIN_PRESETS["ppi"]
    logger = TrainLogger(jsonl_path=args.jsonl)

    t0 = time.time()
    common = dict(
        batch_size=args.batch_size,
        lr=tp["lr"],
        weight_decay=tp["weight_decay"],
        epochs=args.epochs,
        patience=args.patience,
        seed=args.seed,
        checkpoint_dir=None if args.no_checkpoint else args.checkpoint_dir,
        dataset_tag="ppi",
        logger=logger,
    )
    if args.epoch_scan:
        if args.mesh:
            # banked loop + data parallelism in one path (round 5): the
            # on-device shuffle/collate epochs run as weighted-mean DP
            # super-steps over the mesh 'data' axis
            from pygat_tpu.parallel.mesh import make_mesh

            n_data, n_model = (int(v) for v in args.mesh.split(","))
            mesh = make_mesh(n_data, n_model)
            print(f"mesh: data={n_data} model={n_model}")
            result = fit_inductive_banked(cfg, data, mesh=mesh, **common)
        else:
            # single-device: banked loop — shuffle/collate/epochs all on
            # device, host syncs once per epoch chunk
            result = fit_inductive_banked(cfg, data, **common)
    else:
        if args.mesh:
            raise SystemExit("--mesh requires --epoch-scan (the classic "
                             "per-batch host loop is single-device)")
        result = fit_inductive(cfg, data, log_batches=not args.quiet_batches,
                               **common)
    print("Optimization Finished!")
    print("Total time elapsed: {:.4f}s".format(time.time() - t0))
    print("Loading {}th epoch".format(result.best_epoch))
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
