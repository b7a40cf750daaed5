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
