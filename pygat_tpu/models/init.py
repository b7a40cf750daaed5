"""Parameter initializers replicating the reference's torch distributions.

The reference mixes ``xavier_uniform_`` (dense v1/v2, every skip projection;
layers.py:22,24,193,195) and ``xavier_normal_`` (sparse v1/v2 W and a;
layers.py:112,115,248,251), all with gain 1.414. torch computes
fan_in/fan_out from the 2-D parameter shape; the bound only depends on the
SUM of the two dims, so e.g. ``a`` stored here as ``[2F]`` uses the fan sum
of the reference's ``[2F, 1]``.

All heads of a layer are independent draws; we sample the whole ``[H, ...]``
stack in one call (identical distribution).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

GAIN = 1.414  # reference uses nn.init gain=1.414 everywhere


def xavier_uniform(key, shape, fan_sum: int, gain: float = GAIN, dtype=jnp.float32):
    """U(-b, b) with b = gain * sqrt(6 / fan_sum); fan_sum = fan_in + fan_out."""
    bound = gain * math.sqrt(6.0 / fan_sum)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def xavier_normal(key, shape, fan_sum: int, gain: float = GAIN, dtype=jnp.float32):
    """N(0, std^2) with std = gain * sqrt(2 / fan_sum)."""
    std = gain * math.sqrt(2.0 / fan_sum)
    return jax.random.normal(key, shape, dtype=dtype) * std
