"""Progressive-growing critic / discriminator (reference gan.py:231-355).

TPU-native re-design mirroring the generator: static ``steps`` per compile
bucket, traced ``alpha``, NHWC layout, minibatch-stddev with the reference's
exact (quirky) statistics.  Loss functions live in train/losses.py — the
reference attaches them as methods that call ``.backward()`` themselves
(gan.py:357-412); in JAX the losses are pure functions differentiated with
``jax.grad``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from byogan_tpu.core.resize import avg_pool2x
from byogan_tpu.models.layers import (
    Dtype,
    EqualizedConv,
    EqualizedDense,
    MinibatchStdDev,
    _maybe_cast,
    equalized_conv_pool2x_apply,
    leaky_relu,
)

# from_rgb output channels, highest resolution first (reference gan.py:305-316).
CRITIC_FROM_RGB: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 512, 512)
# (in, out) per critic block, highest resolution first (reference gan.py:318-329).
CRITIC_CHANNELS: Tuple[Tuple[int, int], ...] = (
    (16, 32),
    (32, 64),
    (64, 128),
    (128, 256),
    (256, 512),
    (512, 512),
    (512, 512),
    (512, 512),
)


class FromRGB(nn.Module):
    """1x1 equalized conv + LeakyReLU stem (reference gan.py:351-355)."""

    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = EqualizedConv(
            features=self.features,
            kernel_size=1,
            padding=0,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        return leaky_relu(out)


class CriticBlock(nn.Module):
    """One critic stage (reference ``CriticBlock``, gan.py:231-265).

    Non-final: conv3x3+lrelu, then conv3x3 -> AvgPool(2) -> lrelu (pool
    before activation, matching gan.py:258-262 order).
    Final: MinibatchStdDev -> conv3x3+lrelu -> conv4x4 (valid, 4x4 -> 1x1)
    -> lrelu -> flatten -> dense(512)+lrelu -> dense(1) (gan.py:237-251).
    """

    in_channels: int
    out_channels: int
    is_final: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.is_final:
            out = MinibatchStdDev(name="stddev")(x)
            out = EqualizedConv(
                features=self.out_channels, kernel_size=3, padding=1,
                name="conv1", **common,
            )(out)
            out = leaky_relu(out)
            out = EqualizedConv(
                features=self.out_channels, kernel_size=4, padding=0,
                name="conv2", **common,
            )(out)
            out = leaky_relu(out)
            out = out.reshape(out.shape[0], -1)  # (N,1,1,C) -> (N,C)
            out = EqualizedDense(features=self.out_channels, name="dense1", **common)(out)
            out = leaky_relu(out)
            return EqualizedDense(features=1, name="dense2", **common)(out)
        out = EqualizedConv(
            features=self.out_channels, kernel_size=3, padding=1,
            name="conv1", **common,
        )(x)
        out = leaky_relu(out)
        # conv2 -> AvgPool(2) (gan.py:258-262) as ONE stride-2 4x4 conv —
        # exact algebraic fusion, 2.25x fewer MACs, pre-pool slab never hits
        # HBM (layers.equalized_conv_pool2x_apply).  Same "conv2" param tree.
        w, b, scale = EqualizedConv(
            features=self.out_channels, kernel_size=3, padding=1,
            name="conv2", **common,
        ).scaled_params(out.shape[-1])
        out = equalized_conv_pool2x_apply(
            _maybe_cast(out, self.dtype), w, b, scale
        )
        return leaky_relu(out)


class Critic(nn.Module):
    """Progressive critic (reference ``Critic``, gan.py:301-349).

    Forward enters at block ``start = num_stages - steps`` (gan.py:334);
    fade-in blends the first block's output against
    ``from_rgbs[start+1](avg_pool2x(images))`` by clamped alpha
    (gan.py:342-347).
    """

    from_rgb_channels: Sequence[int] = CRITIC_FROM_RGB
    block_channels: Sequence[Tuple[int, int]] = CRITIC_CHANNELS
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.from_rgbs = [
            FromRGB(features=ch, dtype=self.dtype, param_dtype=self.param_dtype)
            for ch in self.from_rgb_channels
        ]
        n = len(self.block_channels)
        self.blocks = [
            CriticBlock(
                in_channels=ic,
                out_channels=oc,
                is_final=(i == n - 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            for i, (ic, oc) in enumerate(self.block_channels)
        ]

    @property
    def num_stages(self) -> int:
        return len(self.block_channels)

    def __call__(
        self,
        images: jax.Array,
        steps: int = 1,
        alpha: Optional[jax.Array] = None,
    ) -> jax.Array:
        if not 1 <= steps <= self.num_stages:
            raise ValueError(f"steps must be in [1, {self.num_stages}], got {steps}")
        start = self.num_stages - steps

        out = self.from_rgbs[start](images)
        out = self.blocks[start](out)
        if steps > 1 and alpha is not None:
            a = jnp.clip(jnp.asarray(alpha, out.dtype), 0.0, 1.0)
            small = self.from_rgbs[start + 1](avg_pool2x(images))
            out = small + a * (out - small)  # torch.lerp(small, out, a)
        for i in range(start + 1, self.num_stages):
            out = self.blocks[i](out)

        if self.is_initializing():
            # Create every stem's and block's parameters regardless of the
            # init-time `steps` (reference builds everything up front,
            # gan.py:305-329).
            for fr in self.from_rgbs:
                fr(jnp.zeros((1, 1, 1, 3), images.dtype))
            for i in range(start):
                ic = self.block_channels[i][0]
                self.blocks[i](jnp.zeros((1, 4, 4, ic), images.dtype))
        return out
