"""Named-axis collectives (thin wrappers over jax.lax), used by the
shard_map code paths so the partitioner is backend-agnostic — the TPU-native
answer to the NCCL/Gloo backend the reference never had (SURVEY §2.11 item 4).

Under jit+GSPMD most communication is inserted automatically from sharding
annotations; these explicit forms are for shard_map kernels (halo exchange,
ring-streamed aggregation) where the schedule is hand-written.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def all_reduce_sum(x, axis: str):
    return lax.psum(x, axis_name=axis)


def all_reduce_mean(x, axis: str):
    return lax.pmean(x, axis_name=axis)


def all_reduce_max(x, axis: str):
    return lax.pmax(x, axis_name=axis)


def all_gather(x, axis: str, *, tiled: bool = True):
    """Gather shards along a new (or concatenated, tiled=True) leading dim."""
    return lax.all_gather(x, axis_name=axis, tiled=tiled)


def all_to_all(x, axis: str, split_axis: int, concat_axis: int):
    return lax.all_to_all(x, axis_name=axis, split_axis=split_axis,
                          concat_axis=concat_axis, tiled=True)


def ppermute_ring(x, axis: str, shift: int = 1):
    """Rotate shards around the ring by ``shift`` (halo-exchange building
    block; rides ICI neighbor links)."""
    n = lax.axis_size(axis)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return lax.ppermute(x, axis_name=axis, perm=perm)


def axis_index(axis: str):
    return lax.axis_index(axis)


def axis_size(axis: str):
    return lax.axis_size(axis)
