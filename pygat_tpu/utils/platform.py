"""Platform control helpers.

On this image the axon TPU plugin registers itself at interpreter start and
initializes backends, so the usual ``JAX_PLATFORMS=cpu`` /
``--xla_force_host_platform_device_count`` knobs arrive too late. This
helper tears the backend caches down (private API, version-guarded) and
re-resolves onto a virtual multi-device CPU platform — used by multi-chip
dry runs and tests when real chips are unavailable.

Also the dropout-PRNG policy: threefry (the JAX default) costs ~19 ms to
draw the ~80M per-head dropout bits of one Pubmed train step on TPU v5e;
the hardware-backed ``rbg`` generator draws them in ~2 ms. ``dropout_key``
converts a raw threefry key into an rbg key on TPU (override with env
PYGAT_PRNG=threefry|rbg). Train-state keys stay raw uint32 so checkpoints
and key plumbing are PRNG-agnostic.
"""

from __future__ import annotations

import os


def prng_impl() -> str:
    """'rbg' on TPU (fast path), 'threefry' elsewhere; env PYGAT_PRNG wins."""
    import jax

    env = os.environ.get("PYGAT_PRNG")
    if env in ("rbg", "threefry"):
        return env
    return "rbg" if jax.default_backend() == "tpu" else "threefry"


def dropout_key(raw_key):
    """Convert a raw/threefry PRNG key into the platform dropout key.

    For 'rbg', the 2-word threefry key is widened to the 4-word rbg state
    deterministically; splits of the result stay rbg. Typed keys pass
    through unchanged.
    """
    import jax
    import jax.numpy as jnp

    if jnp.issubdtype(raw_key.dtype, jax.dtypes.prng_key):
        return raw_key
    if prng_impl() == "rbg":
        data = jnp.concatenate([raw_key.astype(jnp.uint32)] * 2)
        return jax.random.wrap_key_data(data, impl="rbg")
    return jax.random.wrap_key_data(raw_key.astype(jnp.uint32), impl="threefry2x32")


def force_cpu_devices(n_devices: int) -> int:
    """Ensure >= n_devices JAX devices, switching to a virtual CPU platform
    if the current platform has too few. Returns the resulting device count."""
    import jax

    if jax.device_count() >= n_devices:
        return jax.device_count()

    from jax._src import xla_bridge as xb

    if hasattr(xb, "_clear_backends"):
        xb._clear_backends()
    if hasattr(xb.get_backend, "cache_clear"):
        xb.get_backend.cache_clear()
    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
    except RuntimeError:
        pass  # backends not actually cleared on this jax version
    jax.config.update("jax_platforms", "cpu")
    return jax.device_count()
