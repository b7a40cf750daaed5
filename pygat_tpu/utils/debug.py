"""Computation-graph introspection and numerics debugging.

Capability parity with the reference's (broken) autograd visualizer
(reference visualize_graph.py:6-62 — walks grad_fn.next_functions; crashes
on a stale models.SpGAT import): in JAX the computation graph is first
class, so this dumps jaxprs and compiled HLO instead.

Also the 'race detector' analogue (SURVEY §5): the reference sprinkles NaN
asserts through the sparse layers (layers.py:138,147,157,162); here a debug
mode enables jax_debug_nans / checkify around any step function.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax


def dump_jaxpr(fn: Callable, *example_args, path: str | None = None, **kw) -> str:
    """Trace ``fn`` and return (optionally write) its jaxpr text."""
    jaxpr = jax.make_jaxpr(fn, **kw)(*example_args)
    text = str(jaxpr)
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def dump_hlo(fn: Callable, *example_args, path: str | None = None,
             optimized: bool = False) -> str:
    """Lowered (or compiler-optimized) HLO of ``fn``."""
    lowered = jax.jit(fn).lower(*example_args)
    text = (
        lowered.compile().as_text() if optimized else lowered.as_text()
    )
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def op_histogram(fn: Callable, *example_args) -> dict[str, int]:
    """Primitive-op counts of the traced computation (a quick structural
    'what does my model lower to' view)."""
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    counts: dict[str, int] = {}

    def walk_all(j):
        for eqn in j.eqns:
            counts[eqn.primitive.name] = counts.get(eqn.primitive.name, 0) + 1
            for p in eqn.params.values():
                inner = getattr(p, "jaxpr", None)
                if inner is not None:
                    walk_all(inner)
    walk_all(jaxpr.jaxpr)
    return counts


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Context manager: fail fast on NaN production (the reference's
    assert-not-isnan checks, layers.py:138 etc., but everywhere)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a jitted step with checkify so NaN/OOB errors surface with
    locations instead of silent garbage (debug flag path)."""
    from jax.experimental import checkify

    checked = checkify.checkify(step_fn, errors=checkify.float_checks)

    def wrapped(*args, **kw):
        err, out = checked(*args, **kw)
        err.throw()
        return out

    return wrapped


def main(argv=None) -> int:
    """Runnable computation-graph dumper — the working equivalent of the
    reference's visualize_graph.py (which crashes on a stale models.SpGAT
    import, reference visualize_graph.py:57). Dumps the flagship forward's
    jaxpr, lowered HLO, and primitive histogram for any dataset/model."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--dataset", default="cora",
                   choices=["cora", "citeseer", "pubmed"])
    p.add_argument("--model", default="GAT_sparse")
    p.add_argument("--out", default="output/graph",
                   help="prefix: writes <out>.jaxpr.txt and <out>.hlo.txt")
    p.add_argument("--optimized", action="store_true",
                   help="dump compiler-optimized HLO (compiles for the "
                        "current platform)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import os

    from pygat_tpu.data.citation import load_citation
    from pygat_tpu.models.gat import GATConfig, apply_gat, init_gat
    from pygat_tpu.models.presets import PRESETS

    data = load_citation(args.dataset)
    cfg = GATConfig(layer_type=args.model, **PRESETS[args.dataset])
    cfg = cfg._replace(nfeats=(int(data.features.shape[1]),) + cfg.nfeats[1:])
    params = init_gat(jax.random.PRNGKey(72), cfg)
    key = jax.random.PRNGKey(0)

    def fwd(params, x, key):
        return apply_gat(params, cfg, x, data.graph, key, train=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    dump_jaxpr(fwd, params, data.features, key, path=args.out + ".jaxpr.txt")
    dump_hlo(fwd, params, data.features, key, path=args.out + ".hlo.txt",
             optimized=args.optimized)
    hist = op_histogram(fwd, params, data.features, key)
    top = sorted(hist.items(), key=lambda kv: -kv[1])[:15]
    print(f"wrote {args.out}.jaxpr.txt and {args.out}.hlo.txt")
    print("primitive histogram (top 15):")
    for name, cnt in top:
        print(f"  {cnt:5d}  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
