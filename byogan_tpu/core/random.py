"""PRNG utilities: truncated latent sampling and per-stage synthesis noise.

The reference samples latents with scipy ``truncnorm.rvs(-trunc, trunc)`` on
the host then copies to device (reference helper.py:36-45, hardcoded
``.cuda()``).  TPU-natively we sample on device with
``jax.random.truncated_normal`` — identical distribution (standard normal
truncated to [-trunc, trunc]), no host->device copy, fully traceable inside
jit.

Per-stage synthesis noise replicates reference gan.py:189-197: one
``(N, size, size, 1)`` standard-normal map per progressive stage, *shared by
both convs of a stage* (reference gan.py:125-127 passes the same map to
conv_1 and conv_2).  NHWC layout.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def truncated_noise(
    key: jax.Array,
    n_samples: int,
    z_dim: int = 512,
    trunc: float = 0.75,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Sample ``(n_samples, z_dim)`` latents from N(0,1) truncated to ±trunc."""
    return jax.random.truncated_normal(
        key, -trunc, trunc, (n_samples, z_dim), dtype=dtype
    )


def stage_resolution(stage_index: int, base: int = 4) -> int:
    """Spatial resolution of progressive stage ``stage_index`` (0-based)."""
    return base * 2**stage_index


def synthesis_noise(
    key: jax.Array,
    batch: int,
    steps: int,
    base: int = 4,
    dtype: jnp.dtype = jnp.float32,
) -> List[jax.Array]:
    """Per-stage noise maps [(N, 4*2^i, 4*2^i, 1) for i < steps], NHWC."""
    keys = jax.random.split(key, steps)
    return [
        jax.random.normal(
            keys[i],
            (batch, stage_resolution(i, base), stage_resolution(i, base), 1),
            dtype=dtype,
        )
        for i in range(steps)
    ]


def fixed_synthesis_noise(
    key: jax.Array,
    steps: int = 8,
    base: int = 4,
    dtype: jnp.dtype = jnp.float32,
) -> List[jax.Array]:
    """Batch-1 fixed noise pyramid (reference interpolate.py:23-26)."""
    return synthesis_noise(key, 1, steps, base, dtype)
