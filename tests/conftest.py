"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding tests work without TPU hardware (SURVEY §4.4).

``PYGAT_TPU_TESTS=1`` keeps the real TPU attached instead (for the
compiled-Mosaic numeric tests, e.g. tests/test_stream.py); run only the
TPU-marked tests in that mode — the CPU-mesh sharding tests will skip."""

import os

_TPU_MODE = os.environ.get("PYGAT_TPU_TESTS") == "1"

if not _TPU_MODE:
    # Must be set before the CPU backend initializes. The env var alone is
    # not enough on this image: the axon TPU plugin's sitecustomize
    # force-registers itself and sets jax_platforms via config, so we
    # override via config too.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
else:
    # Parity tests compare kernel outputs against XLA reference paths at
    # f32 tolerances; TPU's DEFAULT matmul precision is one bf16 pass,
    # which drowns those comparisons in ~1e-3 rounding noise. Force exact
    # f32 matmuls for the XLA sides so the tests verify the Mosaic
    # lowering, not bf16 noise. (The Pallas kernels pin their in-kernel
    # dots to ops/stream.MXU_PREC — they control operand rounding
    # explicitly — so this global cannot leak into them; an unpinned
    # 'highest' on bf16 kernel operands fails Mosaic compile outright.)
    jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)

if not _TPU_MODE:
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(72)  # reference default seed (train.py:37)


def _random_graph(rng, n=37, p=0.15):
    """Random directed adjacency with self loops, as (senders, receivers, weights, n)."""
    dense = (rng.random((n, n)) < p).astype(np.float32)
    np.fill_diagonal(dense, 1.0)
    # symmetric like the citation pipeline
    dense = np.maximum(dense, dense.T)
    recv, send = np.nonzero(dense)  # adj[i, j] != 0 => edge j -> i
    w = rng.random(recv.shape[0]).astype(np.float32) * 0.9 + 0.1
    return send, recv, w, n


@pytest.fixture
def random_graph_tuple(rng):
    return _random_graph(rng)
