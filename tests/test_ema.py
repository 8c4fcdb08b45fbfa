"""EMA generator weights (TPU-native extension; off by default for reference
parity).  Covers: the shadow update math, checkpoint round-trip + resume
(including resume from a pre-EMA checkpoint), and the sampling surfaces."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.data.prep import prepare_pyramid
from byogan_tpu.data.synthetic import write_synthetic_dataset
from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator
from byogan_tpu.train.checkpoint import (
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
)
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import create_train_state
from byogan_tpu.train.steps import make_train_step

SPEC = ModelSpec(num_stages=2, channel_divisor=16, mapping_depth=2)


def tiny_models():
    return build_generator(SPEC), build_critic(SPEC)


def tiny_config(**kw):
    defaults = dict(
        noise_size=16,
        compute_dtype="float32",
        channel_divisor=16,
        mapping_depth=2,
        ema_beta=0.5,  # large 1-beta so drift is visible in few steps
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def run_steps(config, n, state=None):
    gen, critic = tiny_models()
    if state is None:
        state = create_train_state(config, gen, critic)
    step = make_train_step(
        gen, critic, config, steps=1, batch=4, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )
    real = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 3))
    for _ in range(n):
        state, _ = step(state, real)
    return state


def test_ema_update_math():
    """After each step: ema' = beta*ema + (1-beta)*params' exactly."""
    config = tiny_config()
    gen, critic = tiny_models()
    state = create_train_state(config, gen, critic)
    # shadow starts as an exact copy of the generator
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(e, p),
        state.gen_ema, state.gen_params,
    )
    ema_prev = state.gen_ema
    step = make_train_step(
        gen, critic, config, steps=1, batch=4, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )
    real = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 3))
    new_state, _ = step(state, real)
    expect = jax.tree.map(
        lambda e, p: 0.5 * e + 0.5 * p, ema_prev, new_state.gen_params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        new_state.gen_ema, expect,
    )
    # and the shadow drifted away from the live params (training moved them)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))),
        new_state.gen_ema, new_state.gen_params,
    ))
    assert max(diffs) > 0


def test_ema_off_by_default():
    config = tiny_config(ema_beta=0.0)
    state = run_steps(config, 1)
    assert state.gen_ema is None


def test_ema_checkpoint_roundtrip_and_resume(tmp_path):
    config = tiny_config()
    state = run_steps(config, 2)
    path = save_checkpoint(str(tmp_path), state, alpha=None)

    loaded = load_checkpoint(path)
    assert loaded["gen_ema"] is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        loaded["gen_ema"], state.gen_ema,
    )

    # exact resume keeps the shadow
    gen, critic = tiny_models()
    template = create_train_state(config, gen, critic)
    resumed, _ = restore_train_state(path, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        resumed.gen_ema, state.gen_ema,
    )

    # a non-EMA run can still read the same checkpoint
    template_off = create_train_state(tiny_config(ema_beta=0.0), gen, critic)
    resumed_off, _ = restore_train_state(path, template_off)
    assert resumed_off.gen_ema is None


def test_ema_resume_from_pre_ema_checkpoint(tmp_path):
    """Enabling EMA mid-project: the shadow seeds from the loaded params."""
    state = run_steps(tiny_config(ema_beta=0.0), 1)
    path = save_checkpoint(str(tmp_path), state, alpha=None)
    gen, critic = tiny_models()
    template = create_train_state(tiny_config(), gen, critic)
    resumed, _ = restore_train_state(path, template)
    assert resumed.gen_ema is not None
    jax.tree.map(
        lambda e, p: np.testing.assert_array_equal(np.asarray(e), np.asarray(p)),
        resumed.gen_ema, resumed.gen_params,
    )


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """A real 1-stage training run with EMA through the production loop."""
    from byogan_tpu.train.loop import train

    root = str(tmp_path_factory.mktemp("ema_e2e"))
    write_synthetic_dataset(root, n_images=8, size=4)
    prepare_pyramid(root, start_size=4, end_size=4)
    ckpt_dir = str(tmp_path_factory.mktemp("ema_ckpt"))
    config = tiny_config(
        data=root,
        batch_progression=(4,),
        epoch_progression=(2,),
        display_step=100,
        checkpoint_step=100,
        refresh_stat_step=2,
        checkpoint_dir=ckpt_dir,
        output_dir=str(tmp_path_factory.mktemp("ema_out")),
        show_noise_count=4,
        seed=5,
    )
    train(config)
    return os.path.join(ckpt_dir, "FINAL")


def test_sampler_uses_ema(trained_ckpt):
    from byogan_tpu.serve import Sampler

    live = Sampler(trained_ckpt, batch=2, dtype="float32", seed=1).sample(2)
    ema = Sampler(
        trained_ckpt, batch=2, dtype="float32", seed=1, use_ema=True
    ).sample(2)
    assert live.shape == ema.shape
    assert not np.array_equal(live, ema)  # different weights, same seed


def test_sampler_use_ema_requires_ema(tmp_path):
    from byogan_tpu.serve import Sampler

    state = run_steps(tiny_config(ema_beta=0.0), 1)
    path = save_checkpoint(
        str(tmp_path), state, alpha=None, model_spec=SPEC
    )
    with pytest.raises(ValueError, match="no EMA"):
        Sampler(path, batch=2, dtype="float32", use_ema=True)


def test_generate_samples_cli_ema(trained_ckpt, tmp_path):
    from byogan_tpu.cli.generate_samples import main

    out = tmp_path / "out"
    out.mkdir()
    main([trained_ckpt, "2", "-o", str(out), "--ema", "--seed", "4"])
    assert len(list(out.glob("image_*.png"))) == 2
