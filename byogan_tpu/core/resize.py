"""Bilinear resize / pooling primitives with exact PyTorch semantics, NHWC.

The reference model upsamples features and RGB images with
``nn.Upsample(scale_factor=2, mode="bilinear")`` (align_corners=False;
reference gan.py:112, gan.py:213-217) and downsamples with
``F.avg_pool2d(images, 2)`` (gan.py:345) / ``nn.AvgPool2d(2)`` (gan.py:260).
Pixel-level parity with PyTorch checkpoints requires matching those exact
stencils, so rather than relying on ``jax.image.resize`` (gather/einsum based,
and antialiased on downsample, which torch is not), the 2x upsample is
implemented as its closed-form fixed stencil:

  align_corners=False maps output index ``i`` to input coordinate
  ``(i + 0.5)/2 - 0.5``; negative coordinates clamp to 0 (torch
  ``area_pixel_compute_source_index``).  Hence along each spatial axis:

    out[2k]   = 0.25 * x[max(k-1, 0)] + 0.75 * x[k]
    out[2k+1] = 0.75 * x[k]           + 0.25 * x[min(k+1, n-1)]

This is a handful of shifted adds — XLA fuses it into neighbouring work, and
it is dramatically cheaper than a general gather-based resize.  All functions
take NHWC (TPU-native layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _upsample2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """2x bilinear (torch align_corners=False) upsample along one axis."""
    n = x.shape[axis]
    prev_ = jnp.concatenate(
        [
            jax.lax.slice_in_dim(x, 0, 1, axis=axis),
            jax.lax.slice_in_dim(x, 0, n - 1, axis=axis),
        ],
        axis=axis,
    )
    next_ = jnp.concatenate(
        [
            jax.lax.slice_in_dim(x, 1, n, axis=axis),
            jax.lax.slice_in_dim(x, n - 1, n, axis=axis),
        ],
        axis=axis,
    )
    even = 0.25 * prev_ + 0.75 * x
    odd = 0.75 * x + 0.25 * next_
    # Interleave even/odd along `axis`: stack then collapse.
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


# Public alias: the fused upsample+conv path (models/layers.py) upsamples
# single border lines with the same stencil.
upsample2x_axis = _upsample2x_axis


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """NHWC 2x bilinear upsample matching torch ``Upsample(2, "bilinear")``."""
    x = _upsample2x_axis(x, 1)
    x = _upsample2x_axis(x, 2)
    return x


def avg_pool2x(x: jax.Array) -> jax.Array:
    """NHWC 2x average pool matching torch ``avg_pool2d(x, 2)``."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear_torch(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """NHWC bilinear resize matching torch ``F.interpolate(mode="bilinear")``.

    align_corners=False, no antialiasing (torch default; the reference resizes
    real batches with it at train.py:150-158).  Same-size resize is exactly
    the identity, as in torch.
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_weights(in_size: int, out_size: int):
        scale = in_size / out_size
        coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        coords = jnp.maximum(coords, 0.0)  # torch clamps negative coords
        lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = (coords - lo.astype(jnp.float32)).astype(x.dtype)
        return lo, hi, frac

    h_lo, h_hi, h_frac = axis_weights(h, out_h)
    w_lo, w_hi, w_frac = axis_weights(w, out_w)

    top = jnp.take(x, h_lo, axis=1)
    bot = jnp.take(x, h_hi, axis=1)
    rows = top + h_frac[None, :, None, None] * (bot - top)
    left = jnp.take(rows, w_lo, axis=2)
    right = jnp.take(rows, w_hi, axis=2)
    return left + w_frac[None, None, :, None] * (right - left)
