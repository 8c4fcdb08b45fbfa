"""Shape/smoke tests for Generator and Critic across all progressive stages."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.core.random import synthesis_noise, truncated_noise
from byogan_tpu.models import Critic, Generator


from tests.conftest import (  # noqa: E402  (shared tiny-model builders)
    SMALL_CRITIC_BLOCKS,
    SMALL_CRITIC_FROM_RGB,
    SMALL_GEN_CHANNELS,
    small_critic,
    small_generator,
)


def test_generator_shapes_all_stages():
    gen = small_generator()
    key = jax.random.PRNGKey(0)
    z = truncated_noise(key, 2, 32)
    noise = synthesis_noise(key, 2, 3)
    params = gen.init(key, z, noise, steps=3, alpha=0.5)
    for steps in (1, 2, 3):
        for alpha in (None, jnp.float32(0.3)):
            out = gen.apply(params, z, noise, steps=steps, alpha=alpha)
            size = 4 * 2 ** (steps - 1)
            assert out.shape == (2, size, size, 3)
            assert np.isfinite(np.asarray(out)).all()


def test_generator_init_creates_all_stage_params():
    gen = small_generator()
    key = jax.random.PRNGKey(0)
    z = truncated_noise(key, 1, 32)
    noise = synthesis_noise(key, 1, 1)
    # Init at steps=1 must still create all stages + all to_rgbs.
    params = gen.init(key, z, noise, steps=1)["params"]
    for i in range(3):
        assert f"stages_{i}" in params, params.keys()
        assert f"to_rgbs_{i}" in params


def test_critic_shapes_all_stages():
    critic = small_critic()
    key = jax.random.PRNGKey(1)
    params = critic.init(key, jnp.zeros((4, 16, 16, 3)), steps=3, alpha=0.5)
    for steps in (1, 2, 3):
        size = 4 * 2 ** (steps - 1)
        imgs = jax.random.normal(key, (4, size, size, 3))
        for alpha in (None, jnp.float32(0.7)):
            out = critic.apply(params, imgs, steps=steps, alpha=alpha)
            assert out.shape == (4, 1)
            assert np.isfinite(np.asarray(out)).all()


def test_critic_init_creates_all_params():
    critic = small_critic()
    key = jax.random.PRNGKey(1)
    params = critic.init(key, jnp.zeros((2, 4, 4, 3)), steps=1)["params"]
    for i in range(3):
        assert f"from_rgbs_{i}" in params
        assert f"blocks_{i}" in params


def test_fade_in_endpoints():
    """alpha=1 reproduces the high-res path; alpha=0 the upsampled low-res."""
    gen = small_generator()
    key = jax.random.PRNGKey(2)
    z = truncated_noise(key, 2, 32)
    noise = synthesis_noise(key, 2, 2)
    params = gen.init(key, z, noise, steps=2, alpha=0.5)

    full = gen.apply(params, z, noise, steps=2, alpha=None)
    blend1 = gen.apply(params, z, noise, steps=2, alpha=jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(full), np.asarray(blend1), atol=1e-5)

    # alpha clamps: -5 behaves as 0, +5 as 1 (reference gan.py:211).
    lo = gen.apply(params, z, noise, steps=2, alpha=jnp.float32(-5.0))
    lo0 = gen.apply(params, z, noise, steps=2, alpha=jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(lo), np.asarray(lo0), atol=0)
    hi = gen.apply(params, z, noise, steps=2, alpha=jnp.float32(5.0))
    np.testing.assert_allclose(np.asarray(hi), np.asarray(blend1), atol=0)


def test_full_size_generator_param_count():
    """Full 8-stage generator ~20.4M params / critic ~21.0M (SURVEY.md §2.6).

    Uses eval_shape: parameter structure only, no compute.
    """
    gen = Generator()
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 512))
    noise = synthesis_noise(key, 1, 1)
    shapes = jax.eval_shape(lambda: gen.init(key, z, noise, steps=1))["params"]
    n_gen = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    assert 20_000_000 < n_gen < 21_500_000, n_gen

    critic = Critic()
    cshapes = jax.eval_shape(
        lambda: critic.init(key, jnp.zeros((4, 4, 4, 3)), steps=1)
    )["params"]
    n_crit = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(cshapes))
    assert 20_500_000 < n_crit < 22_000_000, n_crit


def test_fused_upsample_conv_matches_unfused():
    """equalized_upsample2x_conv_apply == upsample2x_bilinear -> conv3x3
    to float rounding, including the border rings and corners (the phase
    decomposition's correction terms) and non-square/odd sizes."""
    import numpy as np

    from byogan_tpu.core.resize import upsample2x_bilinear
    from byogan_tpu.models.layers import (
        equalized_conv_apply,
        equalized_upsample2x_conv_apply,
    )

    rng = np.random.default_rng(0)
    for (h, w, cin, cout) in [(4, 4, 8, 16), (5, 7, 3, 5), (2, 2, 3, 3)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        want = equalized_conv_apply(upsample2x_bilinear(x), k, b, 0.37, padding=1)
        got = equalized_upsample2x_conv_apply(x, k, b, 0.37)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )
