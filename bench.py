"""Headline benchmark: Cora sparse-GAT training epoch on one chip.

Prints ONE JSON line:
    {"metric": "cora_gat_sparse_epoch_ms", "value": <ms>, "unit": "ms",
     "vs_baseline": <speedup>}

An "epoch" matches the reference's per-epoch work (train.py:154-171): one
full-graph train step (forward + backward + Adam) plus one eval-mode
validation forward. Epochs are lax.scan-ed on device (one dispatch per 100
epochs) so the number measures TPU throughput, not host/tunnel dispatch
latency — the same way the chunked production loop runs. Baseline: the
reference's published sparse-GAT epoch time on a Titan Xp, 0.08-0.14 s
(README.md:30) — compared against the FAST end (80 ms), so
vs_baseline = 80 / ours (higher is better).

Backends timed (details on stderr):
* ``fused``  — fused attention + scatter in ONE Pallas kernel per layer
               (ops/fused_stream.py), the default on TPU;
* ``stream`` — Pallas stream-scatter segment sums only (ops/stream.py),
               per-edge attention in XLA (the round-2 default);
* ``xla``    — XLA scatter-add segment sums (the round-1 default).

The round-1 BCSR one-hot kernel (``pallas-bcsr``) was retired to
tests/legacy_bcsr in round 4 after losing to the stream path in every
round-2 bench (6.29 vs 2.70 ms — BENCH_r02.json).
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_MS = 80.0  # reference sparse Cora epoch, fast end (README.md:30)
N_EPOCHS = 100


def _time_backend(backend: str, dataset: str = "cora") -> float:
    import jax

    from pygat_tpu.data.citation import load_citation
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.models.presets import PRESETS, TRAIN_PRESETS
    from pygat_tpu.ops.fused_stream import set_fused_attention
    from pygat_tpu.ops.segment import set_segment_impl
    from pygat_tpu.train.loop import make_scanned_epochs
    from pygat_tpu.train.state import init_state, make_optimizer

    if backend == "fused":
        set_segment_impl("stream")
        set_fused_attention("on")
    elif backend == "stream":
        set_segment_impl("stream")
        set_fused_attention("off")
    elif backend == "xla":
        set_segment_impl("scatter")
        set_fused_attention("off")
    else:
        raise ValueError(backend)

    data = load_citation(dataset)
    cfg = GATConfig(layer_type="GAT_sparse", **PRESETS[dataset])
    cfg = cfg._replace(nfeats=(int(data.features.shape[1]),) + cfg.nfeats[1:])
    tp = TRAIN_PRESETS[dataset]
    tx = make_optimizer(tp["lr"], tp["weight_decay"])

    run = make_scanned_epochs(cfg, tx, N_EPOCHS)
    params = init_gat(jax.random.PRNGKey(72), cfg)
    state = init_state(params, tx, jax.random.PRNGKey(0))

    args = (state, data.features, data.graph, data.labels,
            data.idx_train, data.idx_val)
    out_state, metrics = run(*args)  # compile + warmup
    float(metrics[2][-1])

    # force a value readback per rep: through the remote-attached device
    # relay, block_until_ready can acknowledge before execution finishes,
    # but a scalar readback cannot.
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out_state, metrics = run(*args)
        float(metrics[2][-1])
    return (time.perf_counter() - t0) / (reps * N_EPOCHS) * 1e3


def main() -> int:
    import jax

    from pygat_tpu.ops.segment import set_segment_impl

    results = {}
    for backend in ("fused", "stream", "xla"):
        try:
            results[backend] = _time_backend(backend)
        except Exception as exc:  # pallas may be unavailable off-TPU
            print(f"[bench] backend {backend} failed: {exc}", file=sys.stderr)
    # Pubmed row (VERDICT r3): the shape where fusion pays — Cora is small
    # enough that dispatch noise hides the round-3 machinery entirely
    pubmed = {}
    for backend in ("fused", "stream"):
        try:
            pubmed[backend] = round(_time_backend(backend, "pubmed"), 4)
        except Exception as exc:
            print(f"[bench] pubmed {backend} failed: {exc}", file=sys.stderr)
    set_segment_impl("auto")
    from pygat_tpu.ops.fused_stream import set_fused_attention

    set_fused_attention("auto")
    if not results:
        raise SystemExit("no backend produced a measurement")
    best_backend = min(results, key=results.get)
    dt_ms = results[best_backend]
    print(
        f"[bench] platform={jax.devices()[0].platform} device={jax.devices()[0]} "
        f"cora per-epoch(ms): {results} -> best={best_backend}; "
        f"pubmed per-epoch(ms): {pubmed} "
        f"({N_EPOCHS} epochs lax.scan-ed on device, fwd+bwd+adam+eval)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cora_gat_sparse_epoch_ms",
                "value": round(dt_ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / dt_ms, 2),
                "best_backend": best_backend,
                "cora_ms": {k: round(v, 4) for k, v in results.items()},
                "pubmed_ms": pubmed,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
