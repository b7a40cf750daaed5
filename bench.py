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
HBM_GBPS = 819.0  # TPU v5e nominal HBM bandwidth

# Large-N synthetic row (VERDICT r4 item 3): one fused-attention forward at
# a scale where the wh table cannot stay VMEM-resident — the regime the
# BASELINE north-star ("SpMM/SDDMM at HBM speed-of-light") is about.
# Clustered graph + RCM-style locality is the stated precondition of the
# panel path (real graphs get it via --reorder).
LARGE_N, LARGE_DEG, LARGE_H, LARGE_F = 262_144, 16, 4, 32


def _epoch_traffic_bytes(data, cfg) -> tuple[int, int]:
    """(min HBM bytes per epoch, sparse edge-visits per epoch) under the
    documented floor model.  Per sparse layer application: the [E, HF]
    gathered window is written+read once in bf16 (2 B), the [N, *] node
    tables are read and the [N, HF+H] outputs written in f32; the
    projection reads its input and writes wh.  One epoch = train forward +
    backward (~2x forward bytes) + eval forward = 4x forward bytes; edge
    visits count 3 model applications (fwd, bwd, eval fwd) per layer."""
    g = data.graph
    e_pad = int(g.num_edges_padded)
    n_pad = int(g.num_nodes_padded)
    e_real = int(g.n_edge)
    nfeats, nheads = cfg.nfeats, cfg.nheads
    fwd = 0
    for layer in range(len(nheads)):
        h = nheads[layer]
        f_out = nfeats[layer + 1]
        hf = h * f_out
        f_in = nfeats[layer] * (nheads[layer - 1] if layer else 1)
        fwd += n_pad * f_in * 4 + n_pad * hf * 4  # projection read+write
        fwd += 2 * e_pad * hf * 2                 # window write+read (bf16)
        fwd += n_pad * (hf + 2 * h) * 4           # node tables read
        fwd += n_pad * (hf + h) * 4               # numerator+den write
    n_layers = len(nheads)
    return 4 * fwd, 3 * n_layers * e_real


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
    dt_ms = (time.perf_counter() - t0) / (reps * N_EPOCHS) * 1e3

    bytes_floor, edge_visits = _epoch_traffic_bytes(data, cfg)
    sol_ms = bytes_floor / HBM_GBPS / 1e6
    return {
        "ms": round(dt_ms, 4),
        "edges_per_s": round(edge_visits / (dt_ms / 1e3)),
        "roofline_frac": round(sol_ms / dt_ms, 4),
    }


def _time_large_fused() -> dict:
    """Fused v1 attention forward at LARGE_N (clustered graph): the
    north-star kernel row.  Measures BOTH window builds — the XLA take
    gather (collapses past ~300k nodes) and the banded VMEM-window kernel
    (ops/banded.py) — and reports each plus the winner."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_kernels import _devtime, _graph
    from pygat_tpu.ops.banded import build_band_plan, fused_v1_attention_banded
    from pygat_tpu.ops.fused_stream import fused_v1_attention

    interp = jax.default_backend() != "tpu"
    g = _graph(LARGE_N, LARGE_DEG, clustered=True)
    n_pad, e_pad = g.num_nodes_padded, g.num_edges_padded
    plan = build_band_plan(g, w=4)
    hf = LARGE_H * LARGE_F
    rng = np.random.default_rng(1)
    wh = jnp.asarray(rng.standard_normal((n_pad, hf)).astype(np.float32))
    f_dst = jnp.asarray(
        rng.standard_normal((n_pad, LARGE_H)).astype(np.float32))
    bound = jnp.abs(f_dst) + 2.0
    a_src = jnp.asarray(
        rng.standard_normal((LARGE_H, LARGE_F)).astype(np.float32) * 0.1)
    keepq = jnp.ones((e_pad, LARGE_H), jnp.float32)
    keepq_b = jnp.ones((plan.num_slots, LARGE_H), jnp.float32)

    def run_take(wh, f_dst, bound, a_src, keepq, gg):
        return fused_v1_attention(
            wh, f_dst, bound, a_src, keepq, gg.senders, gg.receivers,
            gg.r_local, gg.r_chunk, gg.c_slot, gg.c_local, gg.c_chunk,
            0.2, "fastest", interp)[0]

    def run_banded(wh, f_dst, bound, a_src, keepq, pp):
        return fused_v1_attention_banded(
            wh, f_dst, bound, a_src, keepq, pp,
            alpha=0.2, precision="fastest", interpret=interp)[0]

    # min-traffic floor: read the wh table + node tables once, write out+den
    traffic = (n_pad * hf * 4 + n_pad * 2 * LARGE_H * 4
               + n_pad * (hf + LARGE_H) * 4 + e_pad * LARGE_H * 4)
    sol_ms = traffic / HBM_GBPS / 1e6
    e_real = int(g.n_edge)
    out: dict = {"config": {"n": LARGE_N, "deg": LARGE_DEG, "h": LARGE_H,
                            "f": LARGE_F, "clustered": True,
                            "band_fill": round(plan.fill, 3)}}
    for name, fn, args in (
        ("take", run_take, (wh, f_dst, bound, a_src, keepq, g)),
        ("banded", run_banded, (wh, f_dst, bound, a_src, keepq_b, plan)),
    ):
        try:
            dt = _devtime(fn, *args, k1=2, k2=6)
        except Exception as exc:  # record, keep the other row
            out[name] = {"error": str(exc)[:200]}
            continue
        out[name] = {
            "ms": round(dt * 1e3, 3),
            "edges_per_s": round(e_real / dt),
            "roofline_frac": round(sol_ms / (dt * 1e3), 4),
        }
    good = {k: v for k, v in out.items()
            if k in ("take", "banded") and "ms" in v}
    if good:
        best = min(good, key=lambda k: good[k]["ms"])
        out.update(best=best, **good[best])
    return out


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
            pubmed[backend] = _time_backend(backend, "pubmed")
        except Exception as exc:
            print(f"[bench] pubmed {backend} failed: {exc}", file=sys.stderr)
    # Large-N synthetic kernel row (VERDICT r4 item 3): tracks the
    # north-star (roofline fraction) where the wh table exceeds VMEM
    large = None
    try:
        large = _time_large_fused()
    except Exception as exc:
        print(f"[bench] large-N row failed: {exc}", file=sys.stderr)
    set_segment_impl("auto")
    from pygat_tpu.ops.fused_stream import set_fused_attention

    set_fused_attention("auto")
    if not results:
        raise SystemExit("no backend produced a measurement")
    best_backend = min(results, key=lambda k: results[k]["ms"])
    dt_ms = results[best_backend]["ms"]
    print(
        f"[bench] platform={jax.devices()[0].platform} device={jax.devices()[0]} "
        f"cora: {results} -> best={best_backend}; "
        f"pubmed: {pubmed}; large_fused: {large} "
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
                "cora": results,
                "pubmed": pubmed,
                "large_fused_fwd": large,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
