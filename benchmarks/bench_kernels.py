"""Sparse-kernel microbenchmarks vs the HBM roofline.

For each op the minimum HBM traffic is computed from the arrays it must
touch; speed-of-light time = traffic / nominal HBM bandwidth (TPU v5e:
819 GB/s). The gather term is counted as E*F*4 (no-reuse model — every
edge fetches its sender row), indices as E*4 each.

Ops (E edges, N nodes, F features, receiver-sorted COO):
  spmm-scatter : legacy flat-arg op, XLA scatter-add forward
  spmm-stream  : ops.spmm.spmm_graph — XLA gather + Pallas stream-scatter
  spmm-stream-grad : value+dense gradients of spmm-stream (SDDMM + sender
                     stream reduction; the SpecialSpmmFunction backward
                     replacement, reference layers.py:80-90)
  sddmm        : gather-dot (XLA fused)

Timing: two-K on-device lax.scan differential — the axon-tunneled device
has a ~30 ms per-dispatch floor that a single scan would smear over the
iteration count (this corrupted the round-1 numbers: spmm "49 GB/s" was
~40% dispatch floor).

Usage:
  python -m benchmarks.bench_kernels                     # Pubmed scale
  python -m benchmarks.bench_kernels --n 1000000 --deg 16 --f 64
  python -m benchmarks.bench_kernels --n 1000000 --deg 16 --clustered
"""

from __future__ import annotations

import argparse
import json
import time

HBM_GBPS = 819.0  # TPU v5e nominal


def _graph(n: int, deg: int, clustered: bool = False):
    import numpy as np

    from pygat_tpu.graph import build_graph

    rng = np.random.default_rng(0)
    base = np.repeat(np.arange(n, dtype=np.int64), deg)
    if clustered:
        # community-local neighbors (what RCM/partitioning yields on real
        # graphs): senders within +-1024 of the receiver
        send = base + rng.integers(-1024, 1024, base.shape[0])
        send = np.clip(send, 0, n - 1)
    else:
        send = rng.integers(0, n, base.shape[0])
    send = np.concatenate([send, np.arange(n)])
    recv = np.concatenate([base, np.arange(n)])
    return build_graph(send, recv, None, n)


def _devtime(fn, *args, k1: int = 20, k2: int = 60, reps: int = 3) -> float:
    """Dispatch-floor-free device time via a two-length scan differential."""
    import jax
    import jax.numpy as jnp

    def make(iters):
        @jax.jit
        def loop(*a):
            def body(c, _):
                # the carry perturbs the first (float) operand so XLA cannot
                # hoist the op out of the scan as loop-invariant
                out = fn(a[0] + c * 1e-30, *a[1:])
                return c + out.ravel()[0].astype(jnp.float32) * 1e-20, None
            return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]
        return loop

    times = {}
    for k in (k1, k2):
        loop = make(k)
        float(loop(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(*args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return max((times[k2] - times[k1]) / (k2 - k1), 1e-9)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=19840)
    p.add_argument("--deg", type=int, default=8)
    p.add_argument("--f", type=int, default=128)
    p.add_argument("--clustered", action="store_true")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pygat_tpu.ops.panel import build_panel_layout, panel_spmm_graph
    from pygat_tpu.ops.sddmm import sddmm_graph
    from pygat_tpu.ops.spmm import spmm, spmm_graph

    g = _graph(a.n, a.deg, a.clustered)
    n_pad, e_pad = g.num_nodes_padded, g.num_edges_padded
    e_real = int(g.n_edge)
    rng = np.random.default_rng(1)
    dense = jnp.asarray(rng.standard_normal((n_pad, a.f)).astype(np.float32))
    dense2 = jnp.asarray(rng.standard_normal((n_pad, a.f)).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal(e_pad).astype(np.float32))

    t_spmm = e_pad * 8 + e_pad * a.f * 4 + n_pad * a.f * 4
    t_sddmm = e_pad * 8 + 2 * e_pad * a.f * 4 + e_pad * 4

    def spmm_grad(v, d, gg):
        return jax.grad(
            lambda vv, dd: (spmm_graph(vv, dd, gg) * dense2).sum(),
            argnums=(0, 1),
        )(v, d)[1]

    # graph/operand arrays are passed as jit ARGUMENTS — closing over them
    # embeds multi-MB constants into the program (slow lowering; the remote
    # compile endpoint rejects >~40MB bodies outright)
    import sys as _sys

    lay = build_panel_layout(g)
    print(f"[bench_kernels] panel layout: P={lay.n_panels} "
          f"overflow={lay.n_overflow} ({lay.overflow_frac:.1%})",
          file=_sys.stderr, flush=True)

    from pygat_tpu.ops.corner import flatten_plan
    from pygat_tpu.ops.large import _spmm_corner_op, plan_csc_to_csr

    plans = plan_csc_to_csr(g)
    arr_f, ps_f = flatten_plan(plans.fwd)
    arr_i, ps_i = flatten_plan(plans.inv)
    print(f"[bench_kernels] corner plans: fwd spans "
          f"{[cp.p for cp in plans.fwd.passes]} inv "
          f"{[cp.p for cp in plans.inv.passes]}", file=_sys.stderr, flush=True)
    from pygat_tpu.ops.corner import default_permute_mode

    _interp = jax.default_backend() != "tpu"
    corner_op = _spmm_corner_op(ps_f, ps_i, default_permute_mode(_interp),
                                "fastest", _interp)

    def spmm_corner_fn(v, d, gg, *arrs):
        return corner_op(v, d, gg.edge_mask, gg.r_local, gg.r_chunk,
                         gg.c_local, gg.c_chunk, *arrs)

    from pygat_tpu.ops.panel import panel_spmm

    def spmm_panel(mode):
        # layout arrays ride as jit ARGUMENTS (g_idx is ~E*4 bytes); only
        # the static panel count is closed over
        interp = jax.default_backend() != "tpu"

        def fn(v, d, gg, pt, gi, ov):
            return panel_spmm(v, d, pt, gi, ov, gg.senders, gg.receivers,
                              gg.edge_mask, gg.r_local, gg.r_chunk,
                              lay.n_panels, "fastest", interp, mode)
        return fn

    lay_args = (lay.panel_tiles, lay.g_idx, lay.overflow_edges)
    cases = [
        ("spmm-scatter", t_spmm,
         lambda v, d, gg: spmm(v, d, gg.senders, gg.receivers, gg.edge_mask),
         (vals, dense, g)),
        ("spmm-stream", t_spmm, spmm_graph, (vals, dense, g)),
        ("spmm-panel-onehot", t_spmm, spmm_panel("onehot"),
         (vals, dense, g) + lay_args),
        ("spmm-panel-take", t_spmm, spmm_panel("take"),
         (vals, dense, g) + lay_args),
        ("spmm-corner", t_spmm, spmm_corner_fn,
         (vals, dense, g) + arr_f + arr_i),
        ("spmm-stream-grad", 3 * t_spmm, spmm_grad, (vals, dense, g)),
        ("sddmm", t_sddmm, sddmm_graph, (dense, dense2, g)),
    ]

    import sys
    for name, traffic, fn, args in cases:
        print(f"[bench_kernels] timing {name}...", file=sys.stderr, flush=True)
        try:
            dt = _devtime(fn, *args)
        except Exception as exc:
            print(json.dumps({"metric": name, "error": str(exc)[:200]}),
                  flush=True)
            continue
        gbps = traffic / dt / 1e9
        print(json.dumps({
            "metric": f"{name}_edges_per_s",
            "value": round(e_real / dt),
            "unit": "edges/s",
            "ms": round(dt * 1e3, 4),
            "effective_gbps": round(gbps, 1),
            "roofline_frac": round(gbps / HBM_GBPS, 3),
            "config": {"n": a.n, "deg": a.deg, "f": a.f,
                       "clustered": a.clustered},
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
