"""Test configuration: force an 8-device virtual CPU mesh before JAX inits.

This is the standard trick for testing pmap/pjit/sharding logic without TPU
hardware (SURVEY.md §4): tests never touch the real TPU chip, stay
deterministic, and exercise the multi-device code paths.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-selects its platform via
# jax.config, overriding the env var — override it back before any backend
# initializes so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference repo not available for golden parity tests",
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
