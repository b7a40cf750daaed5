"""Static-shape padding helpers.

Everything that enters a jitted TPU program must have a static shape; these
helpers round dataset-dependent sizes up to hardware-friendly multiples so
XLA can tile matmuls onto the MXU (lane dim 128) and so recompilation is
bounded (bucketed sizes for variable-size inductive graphs).
"""

from __future__ import annotations

import numpy as np

# TPU lane width; last-dim alignment target for f32/bf16 tensors.
LANE = 128
# f32 sublane; second-to-last-dim minimum alignment.
SUBLANE = 8


def round_up(x: int, multiple: int = LANE) -> int:
    """Round ``x`` up to the next multiple of ``multiple``."""
    if multiple <= 0:
        raise ValueError(f"multiple must be positive, got {multiple}")
    return int(-(-x // multiple) * multiple)


def pad_axis(arr: np.ndarray, size: int, axis: int = 0, value=0) -> np.ndarray:
    """Pad ``arr`` along ``axis`` with ``value`` up to length ``size``."""
    cur = arr.shape[axis]
    if cur > size:
        raise ValueError(f"cannot pad axis {axis} of length {cur} down to {size}")
    if cur == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - cur)
    return np.pad(arr, widths, mode="constant", constant_values=value)


def bucket_size(x: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= x; used to bound compile count for variable graphs.

    Raises if x exceeds the largest bucket.
    """
    for b in buckets:
        if x <= b:
            return b
    raise ValueError(f"size {x} exceeds largest bucket {buckets[-1]}")


def geometric_buckets(max_size: int, min_size: int = LANE, ratio: float = 2.0) -> tuple[int, ...]:
    """Geometric bucket ladder [min_size, ..., >= max_size], LANE-aligned."""
    out = []
    b = round_up(min_size)
    while b < max_size:
        out.append(b)
        b = round_up(int(b * ratio))
    out.append(round_up(max_size))
    return tuple(out)
