"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8).  Pallas kernels run in interpret
mode on CPU; the real-TPU compile/execute path is exercised by ``bench.py``
and ``__graft_entry__.py`` on hardware.

Set VKMR_TEST_PLATFORM=tpu to run the suite against the real chip instead.
"""

import os

if os.environ.get("VKMR_TEST_PLATFORM", "cpu") == "cpu":
    # Force, don't setdefault: the ambient environment pins JAX_PLATFORMS to
    # the TPU platform, and the suite must run on the virtual CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest

from vk_merkle_roots_tpu.config import enable_persistent_cache

# Amortize XLA compiles across test runs.
enable_persistent_cache()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1712489279)


def random_leaves(rng, count, maxlen=127, minlen=1):
    """Random printable-ish byte-string leaves (arbitrary bytes allowed)."""
    lens = rng.integers(minlen, maxlen + 1, size=count)
    return [rng.integers(0, 256, size=int(n), dtype=np.uint8).tobytes() for n in lens]
