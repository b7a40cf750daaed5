"""Train state: params + optimizer state + PRNG key + step counter.

The reference checkpoints only ``model.state_dict()`` (train.py:201) and
cannot truly resume; here the FULL state is a pytree, so checkpoint/restore
is exact (SURVEY §5 'failure detection' gap).

Optimizer matches torch ``optim.Adam(lr, weight_decay)`` (train.py:128-130):
L2 is added to the gradient BEFORE the Adam moments (not AdamW-style), betas
(0.9, 0.999), eps 1e-8, bias correction on.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), optax.adam(lr))
    return optax.adam(lr)


def init_state(params, tx: optax.GradientTransformation, rng: jax.Array) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
    )
