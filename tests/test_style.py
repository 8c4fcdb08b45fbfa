"""W-space style tools (TPU-native extension): generator style injection,
Sampler truncation_psi, style mixing, and the byogan-mix CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.core.random import synthesis_noise
from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator
from byogan_tpu.serve import Sampler
from byogan_tpu.train.checkpoint import save_checkpoint
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import create_train_state

SPEC = ModelSpec(num_stages=2, channel_divisor=16, mapping_depth=2)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """A fresh-init 2-stage checkpoint (no training needed for API tests)."""
    config = TrainConfig(
        noise_size=16,
        compute_dtype="float32",
        channel_divisor=16,
        mapping_depth=2,
        batch_progression=(4, 4),
        epoch_progression=(1, 1),
    )
    state = create_train_state(
        config, build_generator(SPEC), build_critic(SPEC)
    ).replace(stage=2)
    return save_checkpoint(
        str(tmp_path_factory.mktemp("style_ckpt")), state, alpha=None,
        model_spec=SPEC,
    )


def test_style_injection_matches_default():
    """style=w (and a per-stage list of the same w) reproduces the default
    path bit-for-bit; an actually-mixed list changes the output."""
    gen = build_generator(SPEC)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
    noise = synthesis_noise(jax.random.PRNGKey(2), 3, 2)
    params = gen.init(jax.random.PRNGKey(0), z, noise, steps=2)

    base = gen.apply(params, z, noise, steps=2, alpha=jnp.float32(0.4))
    w = gen.apply(params, z, method="map_latent")
    for style in (w, [w, w]):
        got = gen.apply(
            params, None, noise, steps=2, alpha=jnp.float32(0.4), style=style
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))

    z2 = jax.random.normal(jax.random.PRNGKey(3), (3, 16))
    w2 = gen.apply(params, z2, method="map_latent")
    mixed = gen.apply(params, None, noise, steps=2, style=[w, w2])
    plain = gen.apply(params, None, noise, steps=2, style=w)
    assert not np.array_equal(np.asarray(mixed), np.asarray(plain))


def test_style_list_too_short_raises():
    gen = build_generator(SPEC)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    noise = synthesis_noise(jax.random.PRNGKey(2), 2, 2)
    params = gen.init(jax.random.PRNGKey(0), z, noise, steps=2)
    w = gen.apply(params, z, method="map_latent")
    with pytest.raises(ValueError, match="per-stage styles"):
        gen.apply(params, None, noise, steps=2, style=[w])


def test_sampler_psi_one_is_identity(ckpt):
    plain = Sampler(ckpt, batch=4, dtype="float32", seed=5).sample(4)
    psi1 = Sampler(
        ckpt, batch=4, dtype="float32", seed=5, truncation_psi=1.0
    ).sample(4)
    np.testing.assert_array_equal(plain, psi1)


def test_sampler_psi_zero_collapses_diversity(ckpt):
    def spread(frames):
        f = frames.astype(np.float32)
        return float(np.mean(np.var(f, axis=0)))

    wide = Sampler(
        ckpt, batch=8, dtype="float32", seed=5, truncation_psi=1.0
    ).sample(8)
    collapsed = Sampler(
        ckpt, batch=8, dtype="float32", seed=5, truncation_psi=0.0
    ).sample(8)
    # psi=0 forces every sample onto the mean w; only the per-sample noise
    # maps differ, so cross-sample variance collapses.
    assert spread(collapsed) < 0.5 * spread(wide)


def test_sampler_style_mix(ckpt):
    s = Sampler(ckpt, batch=4, dtype="float32", seed=5)
    frames = s.style_mix(4, crossover=1)
    assert frames.shape == (4, 8, 8, 3) and frames.dtype == np.uint8
    # coarse-only (crossover=steps) vs fine-only (crossover=0) from the same
    # sampler key stream draw DIFFERENT latent halves -> different images
    a = s.style_mix(4, crossover=2)
    b = s.style_mix(4, crossover=0)
    assert not np.array_equal(a, b)
    with pytest.raises(ValueError, match="crossover"):
        s.style_mix(4, crossover=3)


def test_interpolate_w_space_cli(ckpt, tmp_path):
    from byogan_tpu.cli.interpolate import main

    out = tmp_path / "walk"
    main([ckpt, "-o", str(out), "-n", "2", "-p", "3", "-d", "cpu",
          "--w-space", "--seed", "1"])
    assert len(list(out.glob("image_*.png"))) == 3


def test_style_mix_cli(ckpt, tmp_path):
    from byogan_tpu.cli.style_mix import main

    out = tmp_path / "grid.png"
    main([ckpt, "-o", str(out), "-r", "2", "-c", "3", "--crossover", "1",
          "--psi", "0.7", "--seed", "2", "-d", "cpu"])
    assert out.exists()
    from PIL import Image

    with Image.open(out) as im:
        w, h = im.size
    # (rows+1) x (cols+1) cells of 8px + 2px padding everywhere
    assert (w, h) == (4 * 10 + 2, 3 * 10 + 2)


def test_style_mix_compilation_bounded(ckpt):
    """Varying request sizes must NOT compile new executables: the mix
    program is compiled at the constructor batch, one variant per crossover
    (pad-and-tile, like sample_batches) — a long-lived server fed varying n
    previously leaked one executable per (n, crossover) pair."""
    s = Sampler(ckpt, batch=4, dtype="float32", seed=5)
    a = s.style_mix(2, crossover=1)
    b = s.style_mix(7, crossover=1)  # > batch: tiles two device calls
    assert a.shape[0] == 2 and b.shape[0] == 7
    assert list(s._mix_cache.keys()) == [1]
    s.style_mix(3, crossover=0)
    assert sorted(s._mix_cache.keys()) == [0, 1]
