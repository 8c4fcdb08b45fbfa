"""Multi-scale sliced Wasserstein distance (SWD) over Laplacian pyramids.

The Progressive-GAN paper's evaluation metric (Karras et al. 2018, appendix
A), re-designed for TPU:

- Laplacian pyramid levels from the full resolution down to ``min_size``
  (16px by convention), built from this repo's closed-form 2x stencils
  (core/resize.py) — a handful of shifted adds XLA fuses, instead of the
  paper's 5-tap Gaussian ``pyrDown``.  The metric is self-consistent (real
  and fake go through the identical pyramid); absolute values are therefore
  not comparable to the tkarras reference implementation, only across runs
  of THIS implementation.
- ``patches_per_image`` random 7x7x3 descriptors per image per level,
  gathered on device with a static-shape advanced-index (no host loop).
- Descriptors are normalized per color channel over each set independently,
  then compared by projecting onto random unit directions and sorting —
  the sort (the O(P log P) heart of SWD) runs on the TPU, and the whole
  per-level computation is one jitted function.

Everything is shape-static: n_images, patches_per_image, and the direction
counts are compile-time constants, so repeated evaluation during a training
run hits the jit cache.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from byogan_tpu.core.resize import avg_pool2x, upsample2x_bilinear

PATCH = 7  # descriptor spatial extent (Progressive GAN appendix A)


def laplacian_pyramid(x: jax.Array, min_size: int = 16) -> List[jax.Array]:
    """Band-pass levels of ``x`` (NHWC), full resolution first.

    Each level is ``x - up(down(x))``; the final level is the residual
    low-pass at ``min_size``.  Exact reconstruction holds by construction:
    summing each level onto the upsampled next recovers ``x`` bit-for-bit
    in float32 — asserted in tests/test_eval.py.
    """
    levels = []
    while x.shape[1] > min_size:
        down = avg_pool2x(x)
        levels.append(x - upsample2x_bilinear(down))
        x = down
    levels.append(x)
    return levels


def extract_patches(
    level: jax.Array, key: jax.Array, patches_per_image: int = 128
) -> jax.Array:
    """(N*ppi, p, p, C) random patches from an NHWC level, on device.

    ``p`` is 7 (``PATCH``), clamped down to the level's own extent for tiny
    stages (a 4px stage descriptor is the whole 4x4 image).
    """
    n, h, w, c = level.shape
    patch = min(PATCH, h, w)
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (n, patches_per_image), 0, h - patch + 1)
    xs = jax.random.randint(kx, (n, patches_per_image), 0, w - patch + 1)
    d = jnp.arange(patch)
    rows = ys[..., None] + d  # (n, ppi, PATCH)
    cols = xs[..., None] + d

    def per_image(img, r, co):
        # img: (h, w, c); broadcasted gather -> (ppi, patch, patch, c)
        return img[r[:, :, None], co[:, None, :], :]

    patches = jax.vmap(per_image)(level, rows, cols)
    return patches.reshape(n * patches_per_image, patch, patch, c)


def _normalize_descriptors(desc: jax.Array) -> jax.Array:
    """Zero-mean unit-std per color channel over the whole set (appendix A)."""
    mean = desc.mean(axis=(0, 1, 2), keepdims=True)
    std = desc.std(axis=(0, 1, 2), keepdims=True)
    return (desc - mean) / (std + 1e-8)


def sliced_wasserstein(
    a: jax.Array,
    b: jax.Array,
    key: jax.Array,
    dirs_per_repeat: int = 128,
    repeats: int = 4,
) -> jax.Array:
    """Average 1-D Wasserstein distance over random projection directions.

    ``a``/``b`` are equal-count descriptor sets; each repeat draws fresh
    unit directions, projects both sets, sorts along the sample axis, and
    averages |sorted_a - sorted_b| — the exact 1-D optimal transport cost.
    """
    if a.shape[0] != b.shape[0]:
        raise ValueError(
            f"SWD needs equal descriptor counts, got {a.shape[0]} vs "
            f"{b.shape[0]}"
        )
    a = a.reshape(a.shape[0], -1).astype(jnp.float32)
    b = b.reshape(b.shape[0], -1).astype(jnp.float32)
    dim = a.shape[1]

    def one_repeat(carry, sub):
        dirs = jax.random.normal(sub, (dim, dirs_per_repeat), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)
        pa = jnp.sort(a @ dirs, axis=0)
        pb = jnp.sort(b @ dirs, axis=0)
        return carry + jnp.mean(jnp.abs(pa - pb)), None

    total, _ = jax.lax.scan(
        one_repeat, jnp.float32(0.0), jax.random.split(key, repeats)
    )
    return total / repeats


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _level_swd(
    real_level, fake_level, key, patches_per_image, dirs_per_repeat, repeats
):
    kr, kf, kp = jax.random.split(key, 3)
    dr = _normalize_descriptors(extract_patches(real_level, kr, patches_per_image))
    df = _normalize_descriptors(extract_patches(fake_level, kf, patches_per_image))
    return sliced_wasserstein(dr, df, kp, dirs_per_repeat, repeats)


def sliced_wasserstein_distance(
    real: jax.Array,
    fake: jax.Array,
    key: jax.Array,
    patches_per_image: int = 128,
    min_size: int = 16,
    dirs_per_repeat: int = 128,
    repeats: int = 4,
) -> Dict[int, float]:
    """Per-resolution SWD between two equal-size NHWC image sets.

    Inputs may be uint8 (converted to the training range [-1, 1]) or float.
    Returns ``{resolution_px: distance * 1e3}`` for every pyramid level,
    highest resolution first — the conventional x1e3 scaling of the paper's
    tables — plus the across-level mean under key ``0``.
    """
    if real.shape != fake.shape:
        raise ValueError(f"shape mismatch: {real.shape} vs {fake.shape}")
    if real.shape[1] < min_size:
        raise ValueError(
            f"images are {real.shape[1]}px; SWD needs >= {min_size}px "
            "(lower min_size for tiny stages)"
        )

    def to_float(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            from byogan_tpu.core.grids import uint8_to_training_range

            x = uint8_to_training_range(x)
        return x.astype(jnp.float32)

    real_levels = laplacian_pyramid(to_float(real), min_size)
    fake_levels = laplacian_pyramid(to_float(fake), min_size)
    out: Dict[int, float] = {}
    for rl, fl in zip(real_levels, fake_levels):
        key, sub = jax.random.split(key)
        out[int(rl.shape[1])] = float(
            _level_swd(rl, fl, sub, patches_per_image, dirs_per_repeat, repeats)
        ) * 1e3
    out[0] = sum(out.values()) / len(out)
    return out


def swd_summary(
    real_batches: Sequence[jax.Array],
    fake_batches: Sequence[jax.Array],
    seed: int = 0,
    **kwargs,
) -> Dict[int, float]:
    """SWD over pre-batched image sets (concatenated on device once)."""
    real = jnp.concatenate([jnp.asarray(b) for b in real_batches], axis=0)
    fake = jnp.concatenate([jnp.asarray(b) for b in fake_batches], axis=0)
    n = min(real.shape[0], fake.shape[0])
    return sliced_wasserstein_distance(
        real[:n], fake[:n], jax.random.PRNGKey(seed), **kwargs
    )
