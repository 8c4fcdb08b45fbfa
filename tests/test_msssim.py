"""MS-SSIM metric (eval/msssim.py) — oracle + property tests.

The oracle is an INDEPENDENT numpy/scipy re-implementation of Wang et al.
2003 written here from the paper's definition (scipy.signal.convolve2d
Gaussian windows, explicit per-channel loops) — no code shared with the
jitted implementation under test.
"""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from byogan_tpu.eval.msssim import (
    WEIGHTS,
    msssim,
    msssim_diversity,
)


# --- independent oracle ------------------------------------------------


def _np_gauss2d(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def _np_ssim_terms(a, b, size):
    """Mean (lum*cs, cs) over the valid map; a, b are (N,H,W,C) float."""
    c1 = (0.01 * 2.0) ** 2
    c2 = (0.03 * 2.0) ** 2
    win = _np_gauss2d(size)

    def blur(x):
        out = []
        for n in range(x.shape[0]):
            chans = [
                scipy.signal.convolve2d(x[n, :, :, c], win, mode="valid")
                for c in range(x.shape[-1])
            ]
            out.append(np.stack(chans, axis=-1))
        return np.stack(out)

    mu_a, mu_b = blur(a), blur(b)
    va = blur(a * a) - mu_a**2
    vb = blur(b * b) - mu_b**2
    cov = blur(a * b) - mu_a * mu_b
    lum = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
    cs = (2 * cov + c2) / (va + vb + c2)
    return (lum * cs).mean(axis=(1, 2, 3)), cs.mean(axis=(1, 2, 3))


def _np_msssim(a, b, scales):
    w = np.asarray(WEIGHTS[:scales])
    w = w / w.sum()
    score = np.ones(a.shape[0])
    for j in range(scales):
        size = min(11, a.shape[1], a.shape[2])
        lum_cs, cs = _np_ssim_terms(a, b, size)
        if j < scales - 1:
            score = score * np.maximum(cs, 0.0) ** w[j]
            a = a.reshape(
                a.shape[0], a.shape[1] // 2, 2, a.shape[2] // 2, 2, -1
            ).mean(axis=(2, 4))
            b = b.reshape(
                b.shape[0], b.shape[1] // 2, 2, b.shape[2] // 2, 2, -1
            ).mean(axis=(2, 4))
        else:
            score = score * np.maximum(lum_cs, 0.0) ** w[j]
    return score


# --- tests ---------------------------------------------------------------


def _images(n, size, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth-ish structured images in [-1, 1]: low-freq fields + noise.
    yy, xx = np.meshgrid(
        np.linspace(0, np.pi * 2, size), np.linspace(0, np.pi * 2, size)
    )
    phase = rng.uniform(0, np.pi * 2, (n, 1, 1, 3))
    freq = rng.uniform(0.5, 2.0, (n, 1, 1, 3))
    base = np.sin(freq * (yy + xx)[None, :, :, None] + phase)
    return np.clip(
        base + 0.15 * rng.standard_normal((n, size, size, 3)), -1, 1
    ).astype(np.float32)


def test_identical_images_score_one():
    a = _images(3, 32)
    s = np.asarray(msssim(a, a))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


@pytest.mark.parametrize("size,scales", [(64, 3), (16, 1)])
def test_matches_independent_oracle(size, scales):
    a = _images(4, size, seed=1)
    b = np.clip(
        a + 0.2 * np.random.default_rng(2).standard_normal(a.shape), -1, 1
    ).astype(np.float32)
    ours = np.asarray(msssim(a, b))
    oracle = _np_msssim(a.astype(np.float64), b.astype(np.float64), scales)
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)


def test_symmetry_and_range():
    a = _images(4, 32, seed=3)
    b = _images(4, 32, seed=4)
    ab = np.asarray(msssim(a, b))
    ba = np.asarray(msssim(b, a))
    np.testing.assert_allclose(ab, ba, rtol=1e-5, atol=1e-6)
    assert np.all(ab >= 0.0) and np.all(ab <= 1.0 + 1e-6)


def test_degrades_monotonically_with_noise():
    a = _images(4, 32, seed=5)
    rng = np.random.default_rng(6)
    noise = rng.standard_normal(a.shape).astype(np.float32)
    small = np.asarray(msssim(a, np.clip(a + 0.05 * noise, -1, 1))).mean()
    big = np.asarray(msssim(a, np.clip(a + 0.4 * noise, -1, 1))).mean()
    assert small > big > 0.0


def test_uint8_matches_float_path():
    rng = np.random.default_rng(7)
    u8_a = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    u8_b = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    from byogan_tpu.core.grids import uint8_to_training_range

    fa = np.asarray(uint8_to_training_range(jnp.asarray(u8_a)))
    fb = np.asarray(uint8_to_training_range(jnp.asarray(u8_b)))
    np.testing.assert_allclose(
        np.asarray(msssim(u8_a, u8_b)),
        np.asarray(msssim(fa, fb)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_diversity_flags_mode_collapse():
    collapsed = np.repeat(_images(1, 32, seed=8), 8, axis=0)
    diverse = _images(8, 32, seed=9)
    assert float(msssim_diversity(collapsed)) > 0.999
    assert float(msssim_diversity(diverse)) < 0.6


def test_tiny_stage_resolutions_work():
    # 4px and 8px stages: window clamps to the image extent, 1 scale.
    for size in (4, 8):
        a = _images(2, size, seed=10)
        s = np.asarray(msssim(a, a))
        np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        msssim(np.zeros((1, 32, 32, 3)), np.zeros((1, 16, 16, 3)))
    with pytest.raises(ValueError):
        msssim_diversity(np.zeros((1, 16, 16, 3)))
