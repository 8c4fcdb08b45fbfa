"""Progressive-growing StyleGAN generator (reference gan.py:151-228).

TPU-native re-design:
  * ``steps`` is a static Python int — each progressive stage is its own XLA
    compile bucket (<= 8 stages x {fade, no-fade} = 16 compiles max, matching
    the reference's dynamic-depth loop without dynamic shapes).
  * ``alpha`` is a traced scalar (fade-in weight, clamped to [0,1] as in
    gan.py:211); ``alpha=None`` selects the no-blend variant (gan.py:221-222)
    — a distinct jit specialization, preserving bit-parity with the
    reference's ``None`` path.
  * Synthesis noise is passed explicitly as a list of NHWC maps (explicit
    PRNG; see core.random.synthesis_noise) — one map per stage, shared by the
    stage's two convs (gan.py:125-127).
  * All 8 stages' parameters are created at init regardless of ``steps``
    (the reference builds full depth always, gan.py:157-181, so checkpoints
    carry every stage).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from byogan_tpu.core.resize import upsample2x_bilinear
from byogan_tpu.models.layers import (
    Dtype,
    EqualizedConv,
    MappingNetwork,
    StyleStage,
)

# (in_channels, out_channels) per stage, 4x4 -> 512x512 (reference gan.py:157-168).
GENERATOR_CHANNELS: Tuple[Tuple[int, int], ...] = (
    (512, 512),
    (512, 512),
    (512, 512),
    (512, 256),
    (256, 128),
    (128, 64),
    (64, 32),
    (32, 16),
)


class Generator(nn.Module):
    """StyleGAN generator: mapping net + 8 style stages + per-stage to_rgb."""

    channels: Sequence[Tuple[int, int]] = GENERATOR_CHANNELS
    style_dim: int = 512
    mapping_depth: int = 8
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.mapping = MappingNetwork(
            channels=self.style_dim,
            depth=self.mapping_depth,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.stages = [
            StyleStage(
                in_channels=ic,
                out_channels=oc,
                is_initial=(i == 0),
                does_upsample=(i > 0),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
            )
            for i, (ic, oc) in enumerate(self.channels)
        ]
        self.to_rgbs = [
            EqualizedConv(
                features=3,
                kernel_size=1,
                padding=0,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            for _ in self.channels
        ]

    @property
    def num_stages(self) -> int:
        return len(self.channels)

    def map_latent(self, z: jax.Array) -> jax.Array:
        """z -> w through the mapping network only (W-space access).

        Exposed for W-space sampling tools (mean-w truncation, style mixing
        — serve.Sampler): ``gen.apply(vars, z, method="map_latent")``.  The
        reference has no W access (gan.py:185 maps inline); the default
        synthesis path below is unchanged.
        """
        return self.mapping(z)

    def __call__(
        self,
        z: Optional[jax.Array],
        noise: Sequence[jax.Array],
        steps: int = 1,
        alpha: Optional[jax.Array] = None,
        style: Optional[Any] = None,
    ) -> jax.Array:
        """Synthesize a batch of images at stage ``steps`` (NHWC, ~[-1,1]).

        Mirrors reference gan.py:183-222: one w for all layers, walk the
        stages, fade-in lerp of the upsampled previous-stage RGB against the
        current RGB by clamped ``alpha``.

        ``style`` (extension, default None = reference behavior): inject
        precomputed W-space styles, skipping the mapping network — either a
        single ``(B, style_dim)`` w for every stage, or a sequence of
        >= ``steps`` per-stage w's (style mixing).  With ``style`` given,
        ``z`` may be None.
        """
        if not 1 <= steps <= self.num_stages:
            raise ValueError(f"steps must be in [1, {self.num_stages}], got {steps}")
        if len(noise) < steps:
            raise ValueError(f"need {steps} noise maps, got {len(noise)}")

        if style is None:
            styles = [self.mapping(z)] * self.num_stages
        elif isinstance(style, (list, tuple)):
            if len(style) < steps:
                raise ValueError(
                    f"need {steps} per-stage styles, got {len(style)}"
                )
            styles = list(style) + [style[-1]] * (self.num_stages - len(style))
        else:
            styles = [style] * self.num_stages

        out: Optional[jax.Array] = None
        prev: Optional[jax.Array] = None
        for i in range(steps):
            prev = out
            out = self.stages[i](out, styles[i], noise[i])

        if self.is_initializing():
            # Touch every stage and to_rgb so full-depth parameters exist
            # regardless of the init-time `steps` (reference builds all
            # stages up front, gan.py:157-181).  `z` may be None when
            # initializing with injected styles — use them for batch/dtype.
            ref = z if z is not None else styles[0]
            feats = out
            for i in range(steps, self.num_stages):
                feats = self.stages[i](feats, styles[i], _dummy_noise(ref, i))
            for i, (_, oc) in enumerate(self.channels):
                self.to_rgbs[i](jnp.zeros((1, 1, 1, oc), styles[0].dtype))

        if alpha is not None and steps > 1:
            # Fade-in blend (gan.py:207-220): torch.lerp(small_up, large, a).
            a = jnp.clip(jnp.asarray(alpha, styles[0].dtype), 0.0, 1.0)
            small_up = upsample2x_bilinear(self.to_rgbs[steps - 2](prev))
            large = self.to_rgbs[steps - 1](out)
            return small_up + a * (large - small_up)
        return self.to_rgbs[steps - 1](out)

    def synthesize(
        self,
        z: jax.Array,
        rng: jax.Array,
        steps: int = 1,
        alpha: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Convenience: sample fresh per-stage noise then synthesize
        (reference gan.py:189-197 noise fallback)."""
        from byogan_tpu.core.random import synthesis_noise

        noise = synthesis_noise(
            rng, z.shape[0], steps, dtype=z.dtype if self.dtype is None else self.dtype
        )
        return self(z, noise, steps=steps, alpha=alpha)


def _dummy_noise(z: jax.Array, stage: int) -> jax.Array:
    size = 4 * 2**stage
    return jnp.zeros((z.shape[0], size, size, 1), z.dtype)
