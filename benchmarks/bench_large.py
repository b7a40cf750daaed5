"""Million-node fused-attention benchmark: corner (gather-free) vs take.

Times the fused v1 attention op — the whole per-edge pipeline of one
sparse GAT layer — at large N, where XLA's row gather serializes
(~14 ns/row once the wh table exceeds VMEM; RESULTS.md "Large-graph
finding"). The corner variant replaces that gather with CSC expand +
corner-turn passes (ops/fused_corner.py) whose cost is k full HBM sweeps
of the [E, HF] window (k = number of corner passes), so its roofline
time is ~(2k + 2.5) * E*HF*4 / BW versus the take path's E * 14 ns wall.

Usage:
  python -m benchmarks.bench_large --n 500000 --deg 16 --h 4 --f 32
  python -m benchmarks.bench_large --n 500000 --deg 16 --clustered --grad
"""

from __future__ import annotations

import argparse
import json
import sys

HBM_GBPS = 819.0  # TPU v5e nominal

from benchmarks.bench_kernels import _devtime, _graph


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500_000)
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--h", type=int, default=4)
    p.add_argument("--f", type=int, default=32)
    p.add_argument("--clustered", action="store_true")
    p.add_argument("--grad", action="store_true",
                   help="also time forward+backward")
    p.add_argument("--skip-take", action="store_true",
                   help="skip the serialized-gather baseline (slow at 1M+)")
    p.add_argument("--band", action="store_true",
                   help="also time the banded-window paths (fused v1 "
                        "attention + fused/two-pass SpMM; needs locality — "
                        "use with --clustered)")
    p.add_argument("--band-w", type=int, default=4,
                   help="banded window width in 128-row tiles")
    p.add_argument("--skip-corner", action="store_true",
                   help="skip the corner path (measured never-wins on v5e)")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pygat_tpu.ops import fused_corner as fc
    from pygat_tpu.ops import fused_stream as fs
    from pygat_tpu.ops.corner import flatten_plan
    from pygat_tpu.ops.large import plan_csc_to_csr

    interp = jax.default_backend() != "tpu"
    g = _graph(a.n, a.deg, a.clustered)
    n_pad, e_pad = g.num_nodes_padded, g.num_edges_padded
    e_real = int(g.n_edge)
    hf = a.h * a.f
    if a.skip_corner:
        arr_f = arr_i = ()
        ps_f = ps_i = ()
        k = 1  # only used in the (skipped) corner traffic model
        print(f"[bench_large] N={a.n} E={e_real} HF={hf} (corner skipped)",
              file=sys.stderr, flush=True)
    else:
        plans = plan_csc_to_csr(g)
        arr_f, ps_f = flatten_plan(plans.fwd)
        arr_i, ps_i = flatten_plan(plans.inv)
        k = len(ps_f)
        print(f"[bench_large] N={a.n} E={e_real} HF={hf} corner passes fwd "
              f"{[cp.p for cp in plans.fwd.passes]} overflow "
              f"{plans.fwd.overflow_total + plans.inv.overflow_total}",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(1)
    wh = jnp.asarray(rng.standard_normal((n_pad, hf)).astype(np.float32))
    f_dst = jnp.asarray(
        rng.standard_normal((n_pad, a.h)).astype(np.float32))
    bound = jnp.abs(f_dst) + 2.0
    a_src = jnp.asarray(
        rng.standard_normal((a.h, a.f)).astype(np.float32) * 0.1)
    keepq = jnp.ones((e_pad, a.h), jnp.float32)

    corner_op = (None if a.skip_corner else
                 fc._v1_corner_op(ps_f, ps_i, 0.2, "fastest", interp))

    # bound/keepq ride as ARGUMENTS: closing over them embeds [N,H]/[E,H]
    # constants in the jitted scan body, and the remote compile helper
    # rejects >~40MB bodies (this was the round-3 "take-grad fails at
    # 500k" artifact — a benchmark bug, not a kernel bug)
    def run_corner(wh, f_dst, bound, a_src, keepq, gg, *arrs):
        return corner_op(wh, f_dst, bound, a_src, keepq, gg.r_local,
                         gg.r_chunk, gg.c_local, gg.c_chunk, *arrs)[0]

    def run_take(wh, f_dst, bound, a_src, keepq, gg):
        return fs.fused_v1_attention(
            wh, f_dst, bound, a_src, keepq, gg.senders, gg.receivers,
            gg.r_local, gg.r_chunk, gg.c_slot, gg.c_local, gg.c_chunk,
            0.2, "fastest", interp)[0]

    def grad_of(fn):
        def gfn(wh, f_dst, bound, a_src, keepq, *rest):
            return jax.grad(
                lambda w, fd, asr: jnp.sum(
                    fn(w, fd, bound, asr, keepq, *rest) ** 2),
                argnums=(0, 1, 2))(wh, f_dst, a_src)[0]
        return gfn

    # forward HBM traffic: expand reads E/2 rows-equivalent of wh tiles +
    # writes [E_s2, HF]; k passes read+write; kernel reads windows + writes
    # [N, HF+H]. take path: same window write/read + N-table gather.
    t_corner = e_pad * hf * 4 * (0.5 + 1 + 2 * k + 1) + n_pad * (hf + a.h) * 4
    t_take = e_pad * hf * 4 * 2 + n_pad * hf * 4 + n_pad * (hf + a.h) * 4

    cases = []
    if not a.skip_corner:
        cases.append(("fusedv1-corner", t_corner, run_corner,
                      (wh, f_dst, bound, a_src, keepq, g) + arr_f + arr_i))
    if not a.skip_take:
        cases.append(("fusedv1-take", t_take, run_take,
                      (wh, f_dst, bound, a_src, keepq, g)))
    if a.grad and not a.skip_corner:
        cases.append(("fusedv1-corner-grad", 3 * t_corner,
                      grad_of(run_corner),
                      (wh, f_dst, bound, a_src, keepq, g) + arr_f + arr_i))
    if a.grad:
        if not a.skip_take:
            cases.append(("fusedv1-take-grad", 3 * t_take,
                          grad_of(run_take),
                          (wh, f_dst, bound, a_src, keepq, g)))

    if a.band:
        from pygat_tpu.ops import banded as bd

        print(f"[bench_large] building band plan (w={a.band_w})...",
              file=sys.stderr, flush=True)
        plan = bd.build_band_plan(g, w=a.band_w)
        print(f"[bench_large] band plan: chunks={plan.num_chunks} "
              f"fill={plan.fill:.3f}", file=sys.stderr, flush=True)
        kqb = jnp.ones((plan.num_slots, a.h), jnp.float32)
        band_op = bd._v1_banded_op(plan.w, 0.2, "fastest", interp)
        flat = (plan.band, plan.s_loc, plan.r_local, plan.r_chunk,
                plan.c_slot, plan.c_local, plan.c_chunk,
                plan.bs_band, plan.bs_chunk, plan.bs_sloc)

        def run_band(wh, f_dst, bound, a_src, kqb, *flat):
            return band_op(wh, f_dst, bound, a_src, kqb, *flat)[0]

        # window DMA upper bound (w tab tiles per chunk, cached across
        # chunks sharing a band base) + tile/out/den + keep window
        bpe = 2  # bf16 windows in fastest mode
        t_band = (plan.num_chunks * a.band_w * 128 * hf * bpe
                  + n_pad * (hf + a.h) * 4 * 2
                  + plan.num_slots * a.h * 4)
        cases.append(("fusedv1-banded", t_band, run_band,
                      (wh, f_dst, bound, a_src, kqb) + flat))
        if a.grad:
            cases.append(("fusedv1-banded-grad", 3 * t_band,
                          grad_of(run_band),
                          (wh, f_dst, bound, a_src, kqb) + flat))

        # SpMM over the same plan: fused single-pass vs two-pass
        vals_b = plan.edge_weight
        spmm_op = bd._spmm_banded_op(plan.w, "fastest", interp)

        def run_spmm_fused(x, v, *flat):
            return spmm_op(v, x, *flat)

        def run_spmm_2pass(x, v, *flat):
            win = bd._banded_take_impl(x, flat[0], flat[1], a.band_w,
                                       exact=False, interpret=interp)
            from pygat_tpu.ops.stream import stream_scatter

            return stream_scatter(v[:, None] * win.astype(jnp.float32),
                                  flat[2], flat[3], x.shape[0],
                                  precision="fastest", interpret=interp)

        xs = wh  # [N, HF] table doubles as the SpMM dense operand
        t_spmm_f = (plan.num_chunks * a.band_w * 128 * hf * bpe
                    + n_pad * hf * 4 + plan.num_slots * 4)
        t_spmm_2 = t_spmm_f + plan.num_slots * hf * bpe * 2  # window RT
        cases.append(("spmm-banded-fused", t_spmm_f, run_spmm_fused,
                      (xs, vals_b) + flat))
        cases.append(("spmm-banded-2pass", t_spmm_2, run_spmm_2pass,
                      (xs, vals_b) + flat))

    for name, traffic, fn, args in cases:
        print(f"[bench_large] timing {name}...", file=sys.stderr, flush=True)
        try:
            dt = _devtime(fn, *args, k1=5, k2=15)
        except Exception as exc:
            print(json.dumps({"metric": name, "error": str(exc)[:200]}),
                  flush=True)
            continue
        gbps = traffic / dt / 1e9
        print(json.dumps({
            "metric": f"{name}_edges_per_s",
            "value": round(e_real / dt),
            "unit": "edges/s",
            "ms": round(dt * 1e3, 3),
            "effective_gbps": round(gbps, 1),
            "roofline_frac": round(gbps / HBM_GBPS, 3),
            "config": {"n": a.n, "deg": a.deg, "h": a.h, "f": a.f,
                       "clustered": a.clustered},
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
