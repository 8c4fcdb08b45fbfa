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


# --- shared tiny-model builders -------------------------------------------
# One home for the small factory config used across the suite (train-step,
# checkpoint, CLI, parallel, serve tests) instead of cross-test-file imports.

SMALL_GEN_CHANNELS = ((64, 64), (64, 32), (32, 16))
SMALL_CRITIC_FROM_RGB = (16, 32, 64)
SMALL_CRITIC_BLOCKS = ((16, 32), (32, 64), (64, 64))


def small_generator():
    from byogan_tpu.models import Generator

    return Generator(channels=SMALL_GEN_CHANNELS, style_dim=32, mapping_depth=2)


def small_critic():
    from byogan_tpu.models import Critic

    return Critic(
        from_rgb_channels=SMALL_CRITIC_FROM_RGB,
        block_channels=SMALL_CRITIC_BLOCKS,
    )


def small_config(**kw):
    from byogan_tpu.train.config import TrainConfig

    defaults = dict(
        noise_size=32,
        compute_dtype="float32",
        batch_progression=(4, 4, 4),
        epoch_progression=(1, 1, 1),
        learning_rate=0.001,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def build(config):
    from byogan_tpu.train.state import create_train_state

    gen = small_generator()
    critic = small_critic()
    state = create_train_state(config, gen, critic)
    return gen, critic, state
