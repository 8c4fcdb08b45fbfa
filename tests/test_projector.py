"""Latent projector (projector.py + byogan-project CLI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.core.random import synthesis_noise
from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator
from byogan_tpu.projector import mean_w, project
from byogan_tpu.serve import Sampler  # noqa: F401  (ckpt fixture parity)
from byogan_tpu.train.checkpoint import save_checkpoint
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import create_train_state

SPEC = ModelSpec(num_stages=2, channel_divisor=16, mapping_depth=2)
STEPS, Z_DIM = 2, 16


@pytest.fixture(scope="module")
def setup():
    gen = build_generator(SPEC)
    config = TrainConfig(
        noise_size=Z_DIM,
        compute_dtype="float32",
        channel_divisor=16,
        mapping_depth=2,
        batch_progression=(4, 4),
        epoch_progression=(1, 1),
    )
    state = create_train_state(config, gen, build_critic(SPEC))
    return gen, {"params": state.gen_params}, state


def _target_from_known_w(gen, params, seed=3, batch=2):
    """An in-range target: synthesize from a known w with the projector's
    own fixed noise (noise_seed=0), so a perfect inversion exists."""
    z = jax.random.normal(jax.random.PRNGKey(seed), (batch, Z_DIM))
    w_true = gen.apply(params, z, method="map_latent")
    noise = synthesis_noise(jax.random.PRNGKey(0), batch, STEPS)
    img = gen.apply(params, None, noise, steps=STEPS, style=w_true)
    return jnp.asarray(img, jnp.float32), w_true


def test_project_recovers_generated_image(setup):
    gen, params, _ = setup
    target, _ = _target_from_known_w(gen, params)
    result = project(
        gen, params, target, steps=STEPS, z_dim=Z_DIM, n_iters=200, lr=0.05
    )
    losses = np.asarray(result.losses)
    assert losses.shape == (200,)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
    err = float(jnp.max(jnp.abs(result.image - target)))
    assert err < 0.15, err  # close pixel reconstruction, not just loss drop


def test_project_w_plus_converges(setup):
    gen, params, _ = setup
    target, _ = _target_from_known_w(gen, params, seed=5)
    plus = project(
        gen, params, target, steps=STEPS, z_dim=Z_DIM,
        n_iters=200, lr=0.05, w_plus=True,
    )
    assert plus.w.shape == (2, STEPS, 32)
    losses = np.asarray(plus.losses)
    assert np.all(np.isfinite(losses))
    # The per-stage parameterization optimizes to a deep loss drop too
    # (head-to-head vs single-w at a fixed small budget is not a stable
    # property — the trajectories differ).
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])


def test_project_accepts_uint8_and_validates_size(setup):
    gen, params, _ = setup
    u8 = np.zeros((1, 8, 8, 3), np.uint8)
    result = project(
        gen, params, u8, steps=STEPS, z_dim=Z_DIM, n_iters=5, lr=0.05
    )
    assert result.image.shape == (1, 8, 8, 3)
    with pytest.raises(ValueError, match="needs 8x8"):
        project(
            gen, params, np.zeros((1, 4, 4, 3), np.float32),
            steps=STEPS, z_dim=Z_DIM, n_iters=5,
        )


def test_project_respects_alpha(setup):
    """Mid-fade checkpoints invert against the blended forward: the same
    target projects to different losses under alpha than without."""
    gen, params, _ = setup
    target, _ = _target_from_known_w(gen, params, seed=7)
    plain = project(
        gen, params, target, steps=STEPS, z_dim=Z_DIM, n_iters=30, lr=0.05
    )
    faded = project(
        gen, params, target, steps=STEPS, z_dim=Z_DIM, n_iters=30, lr=0.05,
        alpha=0.2,
    )
    assert not np.array_equal(
        np.asarray(plain.image), np.asarray(faded.image)
    )


def test_mean_w_shape(setup):
    gen, params, _ = setup
    wm = mean_w(gen, params, Z_DIM, n=256)
    assert wm.shape == (32,)  # style_dim = 512 / 16
    assert np.all(np.isfinite(np.asarray(wm)))


def test_project_cli(setup, tmp_path):
    from PIL import Image

    from byogan_tpu.cli.project import main

    gen, params, state = setup
    ckpt = save_checkpoint(
        str(tmp_path / "ckpt"), state.replace(stage=2), alpha=None,
        model_spec=SPEC,
    )
    src = tmp_path / "in.png"
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
    ).save(src)
    out = tmp_path / "out"
    main([ckpt, str(src), "-o", str(out), "--iters", "10", "-d", "cpu"])
    assert (out / "in-proj.png").exists()
    w = np.load(out / "in-w.npy")
    assert w.shape == (32,)
