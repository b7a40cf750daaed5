"""Native (C++) host-side graph ops with transparent NumPy fallback.

The compute path is JAX/XLA/Pallas on TPU; this module is the native
runtime around it: CSR construction, RCM locality reordering (feeds the panel-gather kernel's
locality requirement, pygat_tpu.ops.panel), and normalized-weight computation —
see csrc/graphops.cpp. Loaded via ctypes; if the shared library is absent
it is built on demand with g++, and if that fails every entry point falls
back to vectorized NumPy with identical results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "graphops.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgraphops.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", os.path.abspath(_SRC),
                 "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as exc:  # no compiler / sandbox: fall back
            print(f"[pygat_tpu.native] build skipped: {exc}", file=sys.stderr)
    if os.path.exists(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.graphops_build_csr.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.graphops_rcm_order.argtypes = [
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.graphops_sym_norm_weights.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.graphops_abi_version.restype = ctypes.c_int32
            assert lib.graphops_abi_version() == 1
            _lib = lib
        except Exception as exc:
            print(f"[pygat_tpu.native] load failed: {exc}", file=sys.stderr)
    return _lib


def available() -> bool:
    return _load() is not None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_csr(senders: np.ndarray, receivers: np.ndarray, num_nodes: int):
    """(rowptr[n+1], col[e], perm[e]) — edges sorted by (receiver, sender);
    perm maps sorted position -> original edge index."""
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = len(senders)
    lib = _load()
    if lib is not None:
        rowptr = np.zeros(num_nodes + 1, np.int32)
        col = np.zeros(e, np.int32)
        perm = np.zeros(e, np.int32)
        lib.graphops_build_csr(num_nodes, e, _i32p(senders), _i32p(receivers),
                               _i32p(rowptr), _i32p(col), _i32p(perm))
        return rowptr, col, perm
    # NumPy fallback
    perm = np.lexsort((senders, receivers)).astype(np.int32)
    col = senders[perm]
    rowptr = np.zeros(num_nodes + 1, np.int32)
    np.cumsum(np.bincount(receivers, minlength=num_nodes), out=rowptr[1:])
    return rowptr, col, perm


def rcm_order(rowptr: np.ndarray, col: np.ndarray, num_nodes: int) -> np.ndarray:
    """Reverse Cuthill-McKee: order[new_id] = old_id. Improves BCSR tile
    utilization (fewer nonempty 128x128 tiles => fewer padded edge slots)."""
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    lib = _load()
    if lib is not None:
        order = np.zeros(num_nodes, np.int32)
        lib.graphops_rcm_order(num_nodes, _i32p(rowptr), _i32p(col), _i32p(order))
        return order
    # NumPy/Python fallback (same traversal, slower)
    degree = np.diff(rowptr)
    visited = np.zeros(num_nodes, bool)
    out = []
    for seed in np.argsort(degree, kind="stable"):
        if visited[seed]:
            continue
        visited[seed] = True
        queue = [int(seed)]
        head = 0
        while head < len(queue):
            v = queue[head]; head += 1
            nbrs = []
            for u in col[rowptr[v]:rowptr[v + 1]]:
                u = int(u)
                if 0 <= u < num_nodes and not visited[u]:
                    visited[u] = True  # mark on collection: multi-edges
                    nbrs.append(u)
            nbrs.sort(key=lambda u: (degree[u], u))
            queue.extend(nbrs)
        out.extend(queue)
    return np.asarray(out[::-1], np.int32)


def sym_norm_weights(senders: np.ndarray, receivers: np.ndarray,
                     num_nodes: int) -> np.ndarray:
    """1/sqrt(deg_r * deg_s) per edge (D^-1/2 (A) D^-1/2 for 0/1 adjacency)."""
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = len(senders)
    lib = _load()
    if lib is not None:
        w = np.zeros(e, np.float32)
        lib.graphops_sym_norm_weights(num_nodes, e, _i32p(senders),
                                      _i32p(receivers),
                                      w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return w
    deg = np.bincount(receivers, minlength=num_nodes).astype(np.float32)
    inv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-30)), 0.0)
    return (inv[receivers] * inv[senders]).astype(np.float32)


def apply_reorder(order: np.ndarray, senders: np.ndarray, receivers: np.ndarray):
    """Relabel edges under order[new_id] = old_id; returns (senders',
    receivers', inverse) with inverse[old_id] = new_id (for features/labels:
    x_new = x_old[order])."""
    inverse = np.zeros_like(order)
    inverse[order] = np.arange(len(order), dtype=order.dtype)
    return inverse[senders], inverse[receivers], inverse
