"""SeFa edit directions (editing.py + byogan-edit CLI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.editing import (
    edit_sheet,
    sefa_directions,
    style_projection_matrix,
)
from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator
from byogan_tpu.train.checkpoint import save_checkpoint
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import create_train_state

SPEC = ModelSpec(num_stages=2, channel_divisor=16, mapping_depth=2)
STEPS, STYLE_DIM = 2, 32


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    gen = build_generator(SPEC)
    config = TrainConfig(
        noise_size=16,
        compute_dtype="float32",
        channel_divisor=16,
        mapping_depth=2,
        batch_progression=(4, 4),
        epoch_progression=(1, 1),
    )
    state = create_train_state(config, gen, build_critic(SPEC))
    ckpt = save_checkpoint(
        str(tmp_path_factory.mktemp("edit_ckpt")),
        state.replace(stage=2), alpha=None, model_spec=SPEC,
    )
    return gen, {"params": state.gen_params}, state.gen_params, ckpt


def test_projection_matrix_shapes(setup):
    _, _, gen_params, _ = setup
    a = style_projection_matrix(gen_params)
    # 2 stages x 2 convs, each (32, 2*32)
    assert a.shape == (STYLE_DIM, 4 * 2 * 32)
    a0 = style_projection_matrix(gen_params, stages=[0])
    assert a0.shape == (STYLE_DIM, 2 * 2 * 32)
    with pytest.raises(ValueError, match="no stages"):
        style_projection_matrix(gen_params, stages=[99])


def test_sefa_directions_orthonormal_and_ordered(setup):
    _, _, gen_params, _ = setup
    dirs, vals = sefa_directions(gen_params, k=5)
    assert dirs.shape == (5, STYLE_DIM) and vals.shape == (5,)
    np.testing.assert_allclose(dirs @ dirs.T, np.eye(5), atol=1e-5)
    assert np.all(np.diff(vals) <= 1e-6)  # strongest first
    # The top direction is exactly the dominant eigenvector of A A^T:
    a = style_projection_matrix(gen_params)
    m = a @ a.T
    np.testing.assert_allclose(
        np.abs(m @ dirs[0]), np.abs(vals[0] * dirs[0]), rtol=1e-4, atol=1e-5
    )


def test_edit_sheet_renders_and_moves(setup):
    gen, params, gen_params, _ = setup
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
    w = gen.apply(params, z, method="map_latent")
    dirs, _ = sefa_directions(gen_params, k=1)
    sheet = edit_sheet(
        gen, params, w, dirs[0], STEPS, coeffs=(-2.0, 0.0, 2.0)
    )
    assert sheet.shape == (6, 8, 8, 3)
    base = np.asarray(sheet[1])  # coeff 0 of the first sample
    moved = np.asarray(sheet[2])  # coeff +2
    assert not np.array_equal(base, moved)
    # coeff 0 reproduces plain synthesis with the sheet's fixed noise
    from byogan_tpu.core.random import synthesis_noise

    one = synthesis_noise(jax.random.PRNGKey(0), 1, STEPS)
    noise = [jnp.broadcast_to(m, (2,) + m.shape[1:]) for m in one]
    plain = gen.apply(params, None, noise, steps=STEPS, style=w)
    np.testing.assert_allclose(
        np.asarray(sheet[1]), np.asarray(plain[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sheet[4]), np.asarray(plain[1]), atol=1e-5
    )


def test_edit_sheet_stage_restriction(setup):
    """Editing only stage 1 must leave a coarse-only edit's output different
    from the all-stages edit (the restriction is actually wired)."""
    gen, params, gen_params, _ = setup
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    w = gen.apply(params, z, method="map_latent")
    dirs, _ = sefa_directions(gen_params, k=1)
    all_stages = edit_sheet(gen, params, w, dirs[0], STEPS, coeffs=(3.0,))
    late_only = edit_sheet(
        gen, params, w, dirs[0], STEPS, coeffs=(3.0,), edit_stages=[1]
    )
    assert not np.array_equal(np.asarray(all_stages), np.asarray(late_only))


def test_edit_sheet_w_plus_and_alpha(setup):
    """A W+ latent (B, steps, D) edits per stage; alpha switches to the
    fade-blended forward."""
    gen, params, gen_params, _ = setup
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
    w = gen.apply(params, z, method="map_latent")
    w_plus = jnp.broadcast_to(w[:, None, :], (1, STEPS, STYLE_DIM))
    dirs, _ = sefa_directions(gen_params, k=1)
    sheet_w = edit_sheet(gen, params, w, dirs[0], STEPS, coeffs=(0.0, 1.0))
    sheet_wp = edit_sheet(
        gen, params, w_plus, dirs[0], STEPS, coeffs=(0.0, 1.0)
    )
    # identical per-stage rows == the single-w result
    np.testing.assert_allclose(
        np.asarray(sheet_w), np.asarray(sheet_wp), atol=1e-5
    )
    with pytest.raises(ValueError, match="stage rows"):
        edit_sheet(
            gen, params, w_plus[:, :1, :], dirs[0], STEPS, coeffs=(0.0,)
        )
    faded = edit_sheet(
        gen, params, w, dirs[0], STEPS, coeffs=(0.0, 1.0), alpha=0.3
    )
    assert not np.array_equal(np.asarray(sheet_w), np.asarray(faded))


def test_edit_cli(setup, tmp_path):
    from byogan_tpu.cli.edit import main

    _, _, _, ckpt = setup
    out = tmp_path / "edit.png"
    main([ckpt, "-o", str(out), "-r", "2", "--steps", "3", "-d", "cpu",
          "--seed", "1"])
    assert out.exists()
    # projected-w entry point: a saved w vector implies a single row
    w = np.zeros((32,), np.float32)
    np.save(tmp_path / "w.npy", w)
    out2 = tmp_path / "edit2.png"
    main([ckpt, "-o", str(out2), "--steps", "3", "--w",
          str(tmp_path / "w.npy"), "-d", "cpu"])
    assert out2.exists()
