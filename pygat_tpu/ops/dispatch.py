"""Backend dispatch for the sparse kernel layer.

``xla``    — segment-op lowering (works on CPU/TPU, reference-verified)
``pallas`` — hand-written Mosaic TPU kernels (CSR row-block SpMM, fused
             SDDMM/segment-softmax)

Selected globally (flag / env PYGAT_BACKEND) or per-call via ``backend=``
arguments; the default is ``xla`` until the Pallas path is profiled faster
on the running platform.
"""

from __future__ import annotations

import os

_VALID = ("xla", "pallas")
_backend = os.environ.get("PYGAT_BACKEND", "xla")


def set_backend(name: str) -> None:
    global _backend
    if name not in _VALID:
        raise ValueError(f"unknown backend {name!r}; expected one of {_VALID}")
    _backend = name


def get_backend(override: str | None = None) -> str:
    if override is not None:
        if override not in _VALID:
            raise ValueError(f"unknown backend {override!r}; expected one of {_VALID}")
        return override
    return _backend
