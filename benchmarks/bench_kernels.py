"""Sparse-kernel microbenchmarks vs the HBM roofline.

For each op the minimum HBM traffic is computed from the arrays it must
touch; speed-of-light time = traffic / measured-or-nominal HBM bandwidth.
TPU v5e nominal HBM bandwidth: 819 GB/s.

Ops (E edges, N nodes, F features, receiver-sorted COO):
  spmm   : out[recv] += v * dense[send]         reads E*(4+4+4) + E*F*4, writes N*F*4
  sddmm  : out[e] = <a[recv_e], b[send_e]>      reads E*8 + 2*E*F*4, writes E*4
  fused  : full GATv1 attention epoch-step       reads ~E descriptors + N*F, writes N*F

One JSON line per op: edges/s, GB/s effective, fraction of roofline.

Usage: python -m benchmarks.bench_kernels [--n 19840] [--deg 8] [--f 128]
"""

from __future__ import annotations

import argparse
import json
import time

HBM_GBPS = 819.0  # TPU v5e nominal


def _graph(n: int, deg: int):
    import numpy as np

    from pygat_tpu.graph import build_graph

    rng = np.random.default_rng(0)
    send = np.concatenate([rng.integers(0, n, n * deg), np.arange(n)])
    recv = np.concatenate([rng.integers(0, n, n * deg), np.arange(n)])
    return build_graph(send, recv, None, n)


def _devtime(fn, *args, iters: int = 50, reps: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(*a)
            return c + out.ravel()[0].astype(jnp.float32) * 1e-20, None
        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    o = loop(*args)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=19840)
    p.add_argument("--deg", type=int, default=8)
    p.add_argument("--f", type=int, default=128)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pygat_tpu.ops.sddmm import sddmm
    from pygat_tpu.ops.spmm import spmm

    g = _graph(a.n, a.deg)
    n_pad, e_pad = g.num_nodes_padded, g.num_edges_padded
    e_real = int(g.n_edge)
    rng = np.random.default_rng(1)
    dense = jnp.asarray(rng.standard_normal((n_pad, a.f)).astype(np.float32))
    dense2 = jnp.asarray(rng.standard_normal((n_pad, a.f)).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal(e_pad).astype(np.float32))

    results = []

    dt = _devtime(lambda: spmm(vals, dense, g.senders, g.receivers, g.edge_mask))
    traffic = e_pad * 12 + e_pad * a.f * 4 + n_pad * a.f * 4
    results.append(("spmm", dt, traffic))

    dt = _devtime(lambda: sddmm(dense, dense2, g.senders, g.receivers, g.edge_mask))
    traffic = e_pad * 12 + 2 * e_pad * a.f * 4
    results.append(("sddmm", dt, traffic))

    for name, dt, traffic in results:
        gbps = traffic / dt / 1e9
        print(json.dumps({
            "metric": f"{name}_edges_per_s",
            "value": round(e_real / dt),
            "unit": "edges/s",
            "ms": round(dt * 1e3, 4),
            "effective_gbps": round(gbps, 1),
            "roofline_frac": round(gbps / HBM_GBPS, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
