"""Device mesh construction (the TPU-native runtime the reference lacks —
its only device logic is a cuda/mps/cpu probe, reference train.py:135-140).

Axes:
* ``data``  — graph-partition / batch axis: nodes+edges of the full graph
  (transductive) or PPI graph-batches (inductive) are sharded here; the
  GNN analogue of DP+SP (SURVEY §2.11).
* ``model`` — head axis (the GNN analogue of TP): the ``[H, ...]`` stacked
  head parameters shard here.

Pipeline/expert parallelism have no counterpart in a 2-3 layer GAT and are
deliberately out of scope (SURVEY §2.11 note).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """2-D ('data', 'model') mesh; defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(f"{len(devices)} devices not divisible by n_model={n_model}")
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed(**kwargs) -> bool:
    """Multi-host init (jax.distributed), to be called before any mesh or
    backend use. After it, ``jax.devices()`` spans every host's chips (the
    'data' axis then rides ICI within a slice and DCN across slices) while
    ``jax.local_devices()`` stays host-local.

    Returns True when the distributed runtime is (now) initialized, False
    for a plain single-process run (no cluster autodetected and no
    ``coordinator_address`` given) — the caller proceeds single-host.
    Unexpected failures propagate instead of being swallowed."""
    import os
    import sys

    def _already_initialized() -> bool:
        # Structured state first (ADVICE r4): the distributed client object
        # outlives the call and doesn't depend on error-message wording.
        try:
            from jax._src import distributed as _dist

            return _dist.global_state.client is not None
        except Exception:
            return False

    if _already_initialized():
        return True  # e.g. the launcher already initialized
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError as exc:
        if "only be called once" in str(exc) or _already_initialized():
            return True  # already initialized (e.g. by the launcher)

        def _slurm_nodes() -> int:
            # unparseable values (site-specific strings) are not a hint
            try:
                return int(os.environ.get("SLURM_JOB_NUM_NODES", "1") or 1)
            except ValueError:
                return 1

        cluster_hint = any(
            os.environ.get(v)
            for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                      "MEGASCALE_COORDINATOR_ADDRESS")
        ) or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "") or (
            # single-host values like 'localhost' (the axon runtime sets
            # one at interpreter startup) are not a cluster
            _slurm_nodes() > 1
        )
        if "before any JAX calls" in str(exc) and not kwargs \
                and not cluster_hint:
            # backend already live, but nothing indicates a cluster: this is
            # a single-process run where init would be a no-op anyway
            print("[pygat_tpu.parallel] distributed init skipped: backend "
                  "already initialized, no coordinator configured",
                  file=sys.stderr)
            return False
        raise
    except ValueError as exc:
        if "coordinator_address" in str(exc):
            return False  # single-process run: nothing to coordinate
        raise
