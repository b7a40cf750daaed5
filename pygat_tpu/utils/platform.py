"""Platform control helpers.

On this image the axon TPU plugin registers itself at interpreter start and
initializes backends, so the usual ``JAX_PLATFORMS=cpu`` /
``--xla_force_host_platform_device_count`` knobs arrive too late. This
helper tears the backend caches down (private API, version-guarded) and
re-resolves onto a virtual multi-device CPU platform — used by multi-chip
dry runs and tests when real chips are unavailable.
"""

from __future__ import annotations


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
