"""Multi-scale structural similarity (MS-SSIM) — the diversity metric.

TPU-native extension; the reference has no quantitative evaluation at all
(its train.py only saves 5x5 grids to eyeball).  SWD (eval/swd.py) measures
how close the generated DISTRIBUTION is to the real one; MS-SSIM measures
the opposite failure mode — **mode collapse**: the mean MS-SSIM between
random pairs of generated images spikes toward 1.0 when the generator
collapses onto few modes (Odena et al. 2017 §4.2 introduced this use;
Karras et al. 2018 report it beside SWD for exactly this reason).  Like
SWD it needs no pretrained feature network, so it works offline and
entirely on device.

Implementation: Wang et al. 2003 ("Multi-scale structural similarity for
image quality assessment"), the canonical 5-scale form —

- 11x11 Gaussian window, sigma 1.5, applied as two separable 1-D depthwise
  convolutions (`feature_group_count=C`) in float32; VALID padding, so no
  border invention.
- contrast*structure term ``cs_j`` at every scale, luminance ``l_M`` only
  at the coarsest; scales linked by the same 2x average pool the rest of
  this repo uses (core/resize.py::avg_pool2x).
- canonical exponents (0.0448, 0.2856, 0.3001, 0.2363, 0.1333);
  ``MS-SSIM = l_M^{w_M} * prod_j cs_j^{w_j}``.  Negative ``cs`` is clamped
  to 0 before the fractional power (standard practice — the product is a
  similarity in [0, 1]).

Progressive stages are small, so the scale count adapts: scale ``j`` needs
the image to still cover the window after ``j-1`` pools, giving
``M = min(5, floor(log2(size/11)) + 1)`` (512px -> the full 5, 128px -> 4,
16px -> 1 = plain SSIM); the first ``M`` exponents are renormalized to sum
to 1 so scores stay in [0, 1] at every stage.  Below 11px the window clamps
to the image (a 4px "window" is global statistics).  Everything is
shape-static per (batch, resolution): repeated evaluation hits the jit
cache.

Inputs may be uint8 (converted with the training-range transform, matching
eval/swd.py) or float in [-1, 1]; the dynamic range L is fixed at 2.0
accordingly.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from byogan_tpu.core.resize import avg_pool2x

#: Canonical per-scale exponents (Wang et al. 2003, from their optimization
#: over human opinion scores).  Truncated + renormalized for small images.
WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
WINDOW = 11
SIGMA = 1.5
K1 = 0.01
K2 = 0.03
#: Images live in the training range [-1, 1] (PARITY.md) -> dynamic range 2.
DYNAMIC_RANGE = 2.0


def _gaussian_kernel(size: int) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * SIGMA * SIGMA))
    return g / jnp.sum(g)


def _blur(x: jax.Array, size: int) -> jax.Array:
    """Separable depthwise Gaussian, VALID padding, NHWC float32."""
    c = x.shape[-1]
    g = _gaussian_kernel(size)
    col = jnp.tile(g.reshape(size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1
    row = jnp.tile(g.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, col, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return lax.conv_general_dilated(
        x, row, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def _ssim_terms(
    a: jax.Array, b: jax.Array, size: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-image mean (luminance*cs, cs) over the valid SSIM map."""
    c1 = (K1 * DYNAMIC_RANGE) ** 2
    c2 = (K2 * DYNAMIC_RANGE) ** 2
    mu_a = _blur(a, size)
    mu_b = _blur(b, size)
    var_a = _blur(a * a, size) - mu_a * mu_a
    var_b = _blur(b * b, size) - mu_b * mu_b
    cov = _blur(a * b, size) - mu_a * mu_b
    lum = (2.0 * mu_a * mu_b + c1) / (mu_a * mu_a + mu_b * mu_b + c1)
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    axes = (1, 2, 3)
    return jnp.mean(lum * cs, axis=axes), jnp.mean(cs, axis=axes)


def _num_scales(size: int, max_scales: int) -> int:
    if size < WINDOW:
        return 1
    return max(1, min(max_scales, int(math.floor(math.log2(size / WINDOW))) + 1))


def _to_float(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.uint8:
        from byogan_tpu.core.grids import uint8_to_training_range

        x = uint8_to_training_range(x)
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def _msssim_pairs(a: jax.Array, b: jax.Array, scales: int) -> jax.Array:
    weights = jnp.asarray(WEIGHTS[:scales], jnp.float32)
    weights = weights / jnp.sum(weights)
    score = jnp.ones((a.shape[0],), jnp.float32)
    for j in range(scales):
        size = min(WINDOW, a.shape[1], a.shape[2])
        lum_cs, cs = _ssim_terms(a, b, size)
        if j < scales - 1:
            score = score * jnp.power(jnp.maximum(cs, 0.0), weights[j])
            a, b = avg_pool2x(a), avg_pool2x(b)
        else:
            score = score * jnp.power(jnp.maximum(lum_cs, 0.0), weights[j])
    return score


def msssim(a: jax.Array, b: jax.Array, max_scales: int = 5) -> jax.Array:
    """Per-pair MS-SSIM in [0, 1] for matched NHWC batches (1.0 = identical).

    Scale count adapts to the resolution (module docstring); both inputs
    must share shape.  uint8 inputs are converted to the training range.
    """
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    a, b = _to_float(a), _to_float(b)
    return _msssim_pairs(a, b, _num_scales(min(a.shape[1], a.shape[2]), max_scales))


def msssim_diversity(images: jax.Array) -> jax.Array:
    """Mean pairwise MS-SSIM of a sample set — the MODE-COLLAPSE readout.

    Split-half pairing (image i vs image i + N/2): with images drawn i.i.d.
    the pairs are random, and the estimator is deterministic given the set.
    Near 1.0 = the generator emits near-identical images (collapse); healthy
    diverse models sit well below the REAL data's own score on the same
    corpus — always report the real-set value beside it (the CLI does).
    """
    n = images.shape[0]
    if n < 2:
        raise ValueError("need at least 2 images to measure diversity")
    half = n // 2
    return jnp.mean(msssim(images[:half], images[half : 2 * half]))
