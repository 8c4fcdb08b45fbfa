"""Differentiable image augmentations for discriminator regularization.

Weight-free, leak-resistant augmentation pipeline in the spirit of
StyleGAN2-ADA (Karras et al. 2020) / DiffAugment (Zhao et al. 2020): every
transform is applied *per sample* with probability ``p`` to BOTH real and
fake images entering the critic, and is differentiable so generator
gradients flow through the augmented fakes.  Because the critic only ever
sees augmented images while p < 1, the generator has no incentive to bake
the augmentations into its output distribution (the ADA non-leaking
argument) — and the adaptive controller (train/steps.py) keeps p at the
smallest value that stops critic overfit.

The reference has no augmentation at all beyond the loader's 50% x-flip
(train.py:44); this is an opt-in TPU-native extension (config
``aug_p`` / ``ada_target``, default off — PARITY.md "opt-in extensions").

TPU notes: everything here is elementwise/VPU work with static shapes —
a handful of masks, one pad+gather (translation).  The translation must
stay in gather form (take_along_axis): its transpose is then also a
gather, while the vmap(dynamic_slice) formulation transposes to a
per-sample scatter that TPU serializes (41.9 ms vs 2.4 ms backward at
batch 128 @128px — benchmarks/bench_augment.py; the generator phase
backprops through the augmentation every step).  No data-dependent
control flow: "skipped" samples compute the transform and ``where`` it
away.  Measured headline cost: benchmarks/RESULTS.md round 5.

Pipeline order (geometric -> color -> corruption, per ADA Fig. 2 subset):
  x-flip, integer translation (±1/8, zero-pad), brightness (additive
  N(0, 0.2)), contrast (log-normal scale about the per-image mean),
  saturation (log-normal scale about the per-pixel channel mean), cutout
  (one half-size square, zeroed).  Images are in the training range [-1, 1]
  (data/pipeline.py), so cutout's zero fill is mid-gray.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Per-transform strengths (ADA's defaults scaled to this pipeline's subset;
# fixed constants — p is the single runtime knob, as in the paper).
_BRIGHTNESS_STD = 0.2
_CONTRAST_LOG2_STD = 0.5
_SATURATION_LOG2_STD = 1.0


def _gate(key: jax.Array, n: int, p: jax.Array) -> jax.Array:
    """(n,) bool: True where the transform applies (probability p)."""
    return jax.random.uniform(key, (n,)) < p


def augment_batch(key: jax.Array, imgs: jax.Array, p) -> jax.Array:
    """Apply the augmentation pipeline to an NHWC batch in [-1, 1].

    ``p`` may be a python float or a traced scalar (the ADA controller's
    dynamic probability — dynamic so adapting it never retraces the step).
    ``p = 0`` is the identity to float precision but still emits the ops;
    callers gate on the *static* config knob for a truly untouched program
    (train/steps.py ``do_aug``).  Differentiable w.r.t. ``imgs``.
    """
    n, h, w, c = imgs.shape
    dtype = imgs.dtype
    (k_flip, k_tg, k_ty, k_tx, k_bg, k_b, k_cg, k_c,
     k_sg, k_s, k_og, k_oy, k_ox) = jax.random.split(key, 13)

    # -- x-flip (geometric; composes with the loader's dataset flip) --------
    flip = _gate(k_flip, n, p)[:, None, None, None]
    imgs = jnp.where(flip, imgs[:, :, ::-1, :], imgs)

    # -- integer translation: shifts uniform in [-h//8, h//8], zero-padded --
    # Lowered as two single-axis take_along_axis gathers, NOT a
    # vmap(dynamic_slice): the slice form transposes to a per-sample
    # dynamic_update_slice scatter that TPU serializes — measured 41.9 ms
    # backward at the headline shape vs 2.4 ms for the gather form, whose
    # transpose stays gather-shaped (benchmarks/bench_augment.py; the two
    # lowerings are exactly equal forward).
    pad = max(h // 8, 1)
    t_on = _gate(k_tg, n, p)
    ty = jnp.where(t_on, jax.random.randint(k_ty, (n,), -pad, pad + 1), 0)
    tx = jnp.where(t_on, jax.random.randint(k_tx, (n,), -pad, pad + 1), 0)
    padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    rows_ix = (pad + ty)[:, None] + jnp.arange(h)[None, :]  # (n, h)
    cols_ix = (pad + tx)[:, None] + jnp.arange(w)[None, :]  # (n, w)
    imgs = jnp.take_along_axis(padded, rows_ix[:, :, None, None], axis=1)
    imgs = jnp.take_along_axis(imgs, cols_ix[:, None, :, None], axis=2)

    # -- brightness: x + b, b ~ N(0, std) ------------------------------------
    b = jax.random.normal(k_b, (n, 1, 1, 1)) * _BRIGHTNESS_STD
    b = jnp.where(_gate(k_bg, n, p)[:, None, None, None], b, 0.0)
    imgs = imgs + b.astype(dtype)

    # -- contrast: (x - mean) * s + mean, s = 2**N(0, std) -------------------
    s = jnp.exp2(jax.random.normal(k_c, (n, 1, 1, 1)) * _CONTRAST_LOG2_STD)
    s = jnp.where(_gate(k_cg, n, p)[:, None, None, None], s, 1.0)
    mean = imgs.mean(axis=(1, 2, 3), keepdims=True)
    imgs = (imgs - mean) * s.astype(dtype) + mean

    # -- saturation: scale about the per-pixel channel mean ------------------
    s = jnp.exp2(jax.random.normal(k_s, (n, 1, 1, 1)) * _SATURATION_LOG2_STD)
    s = jnp.where(_gate(k_sg, n, p)[:, None, None, None], s, 1.0)
    luma = imgs.mean(axis=3, keepdims=True)
    imgs = (imgs - luma) * s.astype(dtype) + luma

    # -- cutout: one h//2-square at a uniform center, zero (mid-gray) fill --
    half = max(h // 4, 1)
    cy = jax.random.randint(k_oy, (n,), 0, h)[:, None, None]
    cx = jax.random.randint(k_ox, (n,), 0, w)[:, None, None]
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    keep = (jnp.abs(yy - cy) >= half) | (jnp.abs(xx - cx) >= half)
    keep = keep | ~_gate(k_og, n, p)[:, None, None]
    return imgs * keep[..., None].astype(dtype)
