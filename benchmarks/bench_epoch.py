"""Per-dataset / per-model training-epoch benchmark.

One JSON line per (dataset, model) with per-epoch time in ms and derived
edges/s — the device-throughput protocol from the headline bench
(``/root/repo/bench.py``): epochs are lax.scan-ed on device so host/tunnel
dispatch latency is excluded, and a scalar readback forces completion.

Usage:
    python -m benchmarks.bench_epoch [--datasets cora,pubmed,citeseer]
        [--models GAT_sparse,GATv2_sparse] [--epochs 100] [--reps 3]

Reference baseline: Cora sparse epoch 0.08-0.14 s on a Titan Xp
(reference README.md:30); dense ~0.9 s (README.md:24).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINES_MS = {  # fast end of the reference's published per-epoch numbers
    ("cora", "GAT_sparse"): 80.0,  # README.md:30
    ("cora", "GAT"): 900.0,  # README.md:24
}


def bench_one(dataset: str, model: str, epochs: int, reps: int) -> dict:
    import jax

    from pygat_tpu.data.citation import load_citation
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.models.presets import PRESETS, TRAIN_PRESETS
    from pygat_tpu.train.loop import make_scanned_epochs
    from pygat_tpu.train.state import init_state, make_optimizer

    data = load_citation(dataset)
    cfg = GATConfig(layer_type=model, **PRESETS[dataset])
    cfg = cfg._replace(nfeats=(int(data.features.shape[1]),) + cfg.nfeats[1:])
    tp = TRAIN_PRESETS[dataset]
    tx = make_optimizer(tp["lr"], tp["weight_decay"])
    run = make_scanned_epochs(cfg, tx, epochs)
    params = init_gat(jax.random.PRNGKey(72), cfg)
    state = init_state(params, tx, jax.random.PRNGKey(0))

    args = (state, data.features, data.graph, data.labels,
            data.idx_train, data.idx_val)
    out_state, metrics = run(*args)  # compile + warmup
    float(metrics[2][-1])

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out_state, metrics = run(*args)
        float(metrics[2][-1])  # readback forces completion over the tunnel
        best = min(best, (time.perf_counter() - t0) / epochs)

    n_edges = int(data.graph.n_edge)
    ms = best * 1e3
    base = BASELINES_MS.get((dataset, model))
    return {
        "metric": f"{dataset}_{model}_epoch_ms",
        "value": round(ms, 4),
        "unit": "ms",
        "edges_per_s": round(n_edges / best),
        **({"vs_baseline": round(base / ms, 2)} if base else {}),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", default="cora,pubmed,citeseer")
    p.add_argument("--models", default="GAT_sparse,GATv2_sparse")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--fused", default="auto", choices=("auto", "on", "off"),
                   help="fused attention kernel (default auto: on whenever "
                        "the stream segment impl is active)")
    a = p.parse_args()
    from pygat_tpu.ops.fused_stream import set_fused_attention

    set_fused_attention(a.fused)
    for ds in a.datasets.split(","):
        for model in a.models.split(","):
            try:
                print(json.dumps(bench_one(ds, model, a.epochs, a.reps)), flush=True)
            except Exception as exc:  # keep going; report the failure
                print(f"[bench_epoch] {ds}/{model} failed: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
