"""Headline benchmark: Cora sparse-GAT training epoch on one chip.

Prints ONE JSON line:
    {"metric": "cora_gat_sparse_epoch_ms", "value": <ms>, "unit": "ms",
     "vs_baseline": <speedup>}

An "epoch" matches the reference's per-epoch work (train.py:154-171): one
full-graph train step (forward + backward + Adam) plus one eval-mode
validation forward. Baseline: the reference's published sparse-GAT epoch
time on a Titan Xp, 0.08-0.14 s (README.md:30) — we compare against the
FAST end (80 ms), so vs_baseline = 80 / ours (higher is better).

Extra diagnostics (edges/s, dense-path time, backend) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MS = 80.0  # reference sparse Cora epoch, fast end (README.md:30)


def _build():
    import jax
    import jax.numpy as jnp

    from pygat_tpu.data.citation import load_citation
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.models.presets import PRESETS, TRAIN_PRESETS
    from pygat_tpu.train.loop import make_transductive_steps
    from pygat_tpu.train.state import init_state, make_optimizer

    data = load_citation("cora")
    cfg = GATConfig(layer_type="GAT_sparse", **PRESETS["cora"])
    cfg = cfg._replace(nfeats=(int(data.features.shape[1]),) + cfg.nfeats[1:])
    tp = TRAIN_PRESETS["cora"]
    tx = make_optimizer(tp["lr"], tp["weight_decay"])
    params = init_gat(jax.random.PRNGKey(72), cfg)
    state = init_state(params, tx, jax.random.PRNGKey(0))
    train_step, eval_step = make_transductive_steps(cfg, tx)
    return data, state, train_step, eval_step


def main() -> int:
    import jax

    data, state, train_step, eval_step = _build()
    x, g, labels = data.features, data.graph, data.labels

    def epoch(state):
        state, loss, acc, _ = train_step(state, x, g, labels, data.idx_train)
        loss_v, acc_v, _ = eval_step(state.params, x, g, labels, data.idx_val)
        return state, loss_v

    # warmup/compile
    state, _ = epoch(state)
    jax.block_until_ready(state)

    n_iters = 100
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, loss_v = epoch(state)
    jax.block_until_ready(loss_v)
    dt_ms = (time.perf_counter() - t0) / n_iters * 1e3

    edges = int(g.n_edge)
    print(
        f"[bench] platform={jax.devices()[0].platform} device={jax.devices()[0]} "
        f"epoch={dt_ms:.3f}ms edges/s={edges * 8 / (dt_ms / 1e3):.3e} "
        f"(8 heads, fwd+bwd+adam+eval)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cora_gat_sparse_epoch_ms",
                "value": round(dt_ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / dt_ms, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
