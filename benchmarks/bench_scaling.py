"""Multi-device scaling benchmark (edges/s efficiency).

On real multi-chip hardware this measures ICI scaling of the GSPMD
node/edge-partitioned train step; in this container it runs on a virtual
N-device CPU mesh, which validates the sharded program end-to-end and
reports *relative* scaling of the same program at 1..N devices. CPU-mesh
numbers exercise correctness and compilation, not ICI bandwidth — treat
the efficiency figure as a lower bound sanity check, not a TPU result
(BASELINE north star: >=80% edges/s efficiency on real chips).

Usage: python -m benchmarks.bench_scaling [--devices 8] [--n 4096] [--deg 16]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--steps", type=int, default=20)
    a = p.parse_args()

    import jax

    from pygat_tpu.utils.platform import force_cpu_devices

    if jax.device_count() < a.devices:
        force_cpu_devices(a.devices)

    import __graft_entry__ as ge
    from pygat_tpu.models.gat import GATConfig, init_gat
    from pygat_tpu.parallel import make_mesh, sharded_fit_inputs
    from pygat_tpu.train.loop import make_transductive_steps
    from pygat_tpu.train.state import init_state, make_optimizer

    data = ge._synthetic_citation(a.n, 128, 4, "bench-scaling")
    cfg = GATConfig(nlayers=2, nheads=(8, 1), nfeats=(128, 8, 4),
                    dropout=0.6, alpha=0.2, layer_type="GAT_sparse")
    tx = make_optimizer(0.005, 5e-4)
    n_edges = int(data.graph.n_edge)

    def run(n_dev: int) -> float:
        mesh = make_mesh(n_dev, 1)
        params = init_gat(jax.random.PRNGKey(72), cfg)
        state = init_state(params, tx, jax.random.PRNGKey(0))
        sdata, sstate = sharded_fit_inputs(data, state, mesh)
        train_step, _ = make_transductive_steps(cfg, tx)
        st = sstate
        st, *_ = train_step(st, sdata.features, sdata.graph, sdata.labels,
                            sdata.idx_train)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        for _ in range(a.steps):
            st, loss, *_ = train_step(st, sdata.features, sdata.graph,
                                      sdata.labels, sdata.idx_train)
        jax.block_until_ready(st)
        return (time.perf_counter() - t0) / a.steps

    def run_ring(n_dev: int) -> float:
        from pygat_tpu.parallel.partition import partition_edges
        from pygat_tpu.parallel.ring_model import make_ring_transductive_steps

        mesh = make_mesh(n_dev, 1)
        part = partition_edges(data.graph, n_dev)
        params = init_gat(jax.random.PRNGKey(72), cfg)
        state = init_state(params, tx, jax.random.PRNGKey(0))
        sdata, sstate = sharded_fit_inputs(data, state, mesh)
        train_step, _ = make_ring_transductive_steps(cfg, tx, part, mesh)
        st = sstate
        st, *_ = train_step(st, sdata.features, sdata.labels, sdata.idx_train)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        for _ in range(a.steps):
            st, loss, *_ = train_step(st, sdata.features, sdata.labels,
                                      sdata.idx_train)
        jax.block_until_ready(st)
        return (time.perf_counter() - t0) / a.steps

    t1 = run(1)
    tn = run(a.devices)
    eff = t1 / (tn * a.devices)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction",
        "devices": a.devices,
        "step_ms_1dev": round(t1 * 1e3, 3),
        "step_ms_ndev": round(tn * 1e3, 3),
        "edges_per_s_ndev": round(n_edges / tn),
        "platform": jax.devices()[0].platform,
    }))
    # hand-scheduled ring halo-exchange path (ppermute + online softmax)
    tr = run_ring(a.devices)
    print(json.dumps({
        "metric": "ring_step_ms_ndev",
        "value": round(tr * 1e3, 3),
        "unit": "ms",
        "devices": a.devices,
        "edges_per_s_ndev": round(n_edges / tr),
        "vs_gspmd": round(tn / tr, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
