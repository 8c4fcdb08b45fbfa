"""Tests for path-length regularization (losses.gen_path_length_penalty and
its lazy wiring in the fused train step) — opt-in extension; the reference
has no generator-side regularizer (PARITY.md "opt-in extensions")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.train import losses
from byogan_tpu.train.steps import make_train_step
from tests.conftest import build, small_config


def _run_steps(config, n_iters=4, batch=4, steps=2, seed=9):
    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config,
        steps=steps, batch=batch, fade_in=1e9,
        critic_fade=(True,) * config.critic_repeats, gen_fade=True,
        donate=False,
    )
    real = jax.random.uniform(
        jax.random.PRNGKey(seed), (batch, 8, 8, 3), minval=-1.0, maxval=1.0
    )
    metrics = None
    for _ in range(n_iters):
        state, metrics = step_fn(state, real)
    return state, metrics


def test_penalty_matches_analytic_linear_map():
    """For a LINEAR synthesis w -> w @ A the Jacobian is A itself, so
    pl_i = ||y_i_flat @ A^T||_2 exactly — closed form vs the VJP estimate."""
    b, s_dim, h, w, c = 3, 6, 4, 4, 2
    key = jax.random.PRNGKey(0)
    a_key, w_key, y_key = jax.random.split(key, 3)
    A = jax.random.normal(a_key, (s_dim, h * w * c), jnp.float32)
    ws = jax.random.normal(w_key, (b, s_dim), jnp.float32)

    def synth(w_):
        return (w_ @ A).reshape(b, h, w, c)

    pl_ema = jnp.float32(0.7)
    penalty, pl_mean = losses.gen_path_length_penalty(synth, ws, pl_ema, y_key)

    y = np.asarray(
        jax.random.normal(y_key, (b, h, w, c), jnp.float32)
    ) / np.sqrt(h * w)
    grads = y.reshape(b, -1) @ np.asarray(A).T  # J^T y per sample
    pl_exact = np.sqrt((grads**2).sum(axis=1) + 1e-8)
    np.testing.assert_allclose(float(pl_mean), pl_exact.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(penalty), ((pl_exact - 0.7) ** 2).mean(), rtol=1e-5
    )


def test_plr_off_carries_no_state():
    config = small_config()
    _, _, state = build(config)
    assert state.pl_ema is None


def test_plr_step_trains_and_tracks_pl_ema():
    """With PLR on: losses finite, the penalty metric appears, and pl_ema
    moves off its 0 init after the first penalized iteration (iters=0 always
    fires: 0 % interval == 0)."""
    config = small_config(plr_weight=2.0, plr_interval=2, plr_decay=0.1)
    state, metrics = _run_steps(config)
    assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
    assert "pl_penalty" in metrics and "pl_ema" in metrics
    assert float(state.pl_ema) > 0.0
    assert np.isfinite(float(state.pl_ema))


def test_pl_ema_updates_only_on_penalized_iterations():
    config = small_config(plr_weight=2.0, plr_interval=3, plr_decay=0.1)
    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config, steps=2, batch=4, fade_in=1e9,
        critic_fade=(True,), gen_fade=True, donate=False,
    )
    real = jax.random.uniform(
        jax.random.PRNGKey(3), (4, 8, 8, 3), minval=-1.0, maxval=1.0
    )
    state, m0 = step_fn(state, real)  # iters 0 -> penalized
    ema_after_fire = float(state.pl_ema)
    assert ema_after_fire > 0.0
    assert float(m0["pl_penalty"]) > 0.0
    state, m1 = step_fn(state, real)  # iters 1 -> skip
    state, m2 = step_fn(state, real)  # iters 2 -> skip
    assert float(state.pl_ema) == pytest.approx(ema_after_fire)
    assert float(m1["pl_penalty"]) == 0.0 and float(m2["pl_penalty"]) == 0.0
    state, m3 = step_fn(state, real)  # iters 3 -> penalized again
    assert float(m3["pl_penalty"]) > 0.0
    assert float(state.pl_ema) != pytest.approx(ema_after_fire)


def test_plr_requires_matching_state():
    config_off = small_config()
    config_on = small_config(plr_weight=2.0)
    gen, critic, state = build(config_off)
    step_fn = make_train_step(
        gen, critic, config_on, steps=1, batch=4, fade_in=100.0,
        critic_fade=(True,), gen_fade=True, donate=False,
    )
    real = jnp.zeros((4, 4, 4, 3), jnp.float32)
    with pytest.raises(ValueError, match="pl_ema"):
        step_fn(state, real)


def test_plr_under_bfloat16_compute():
    """Both lax.cond branches must emit the same (f32) loss dtype under the
    production bf16 compute path — regression for the dtype-mismatch the
    CLI drive caught (penalty f32 vs bf16 main loss)."""
    config = small_config(
        compute_dtype="bfloat16", plr_weight=2.0, plr_interval=2,
    )
    state, metrics = _run_steps(config, n_iters=2)
    assert np.isfinite(metrics["g_loss"]) and np.isfinite(metrics["c_loss"])
    assert float(state.pl_ema) > 0.0


def test_plr_composes_with_recipe_extensions():
    """PLR + lazy R1 + style mixing + EMA in ONE compiled program."""
    config = small_config(
        plr_weight=2.0, plr_interval=2, r1_interval=2,
        style_mix_prob=0.5, ema_beta=0.99,
    )
    state, metrics = _run_steps(config, n_iters=3)
    assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
    assert state.gen_ema is not None and state.pl_ema is not None


def test_plr_checkpoint_roundtrip(tmp_path):
    from byogan_tpu.train.checkpoint import (
        restore_train_state,
        save_checkpoint,
    )

    config = small_config(plr_weight=2.0, plr_interval=1, plr_decay=0.2)
    state, _ = _run_steps(config, n_iters=2)
    saved_ema = float(state.pl_ema)
    assert saved_ema > 0.0
    path = save_checkpoint(str(tmp_path), state, None)
    _, _, template = build(config)
    restored, _ = restore_train_state(path, template)
    assert float(restored.pl_ema) == pytest.approx(saved_ema)


def test_resume_from_pre_plr_checkpoint_keeps_zero_init(tmp_path):
    """A checkpoint written WITHOUT PLR restores into a PLR-enabled run with
    the paper's 0 init (no KeyError, no stale value)."""
    from byogan_tpu.train.checkpoint import (
        restore_train_state,
        save_checkpoint,
    )

    config_off = small_config()
    state, _ = _run_steps(config_off, n_iters=1)
    path = save_checkpoint(str(tmp_path), state, None)
    config_on = small_config(plr_weight=2.0)
    _, _, template = build(config_on)
    restored, _ = restore_train_state(path, template)
    assert float(restored.pl_ema) == 0.0


def test_sharded_state_replicates_pl_ema():
    from jax.sharding import Mesh

    from byogan_tpu.parallel.mesh import shard_train_state

    config = small_config(plr_weight=2.0)
    _, _, state = build(config)
    devices = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devices, ("data", "model"))
    sharded = shard_train_state(state, mesh)
    assert sharded.pl_ema.sharding.is_fully_replicated


def test_ini_keys_parse(tmp_path):
    from byogan_tpu.train.config import load_ini_config

    ini = tmp_path / "config.txt"
    ini.write_text(
        "[DEFAULT]\ndata = d\nplr_weight = 2.0\nplr_interval = 4\n"
        "plr_decay = 0.02\nplr_batch_shrink = 2\n"
    )
    config = load_ini_config(str(ini), "DEFAULT")
    assert config.plr_weight == 2.0
    assert config.plr_interval == 4
    assert config.plr_decay == 0.02
    assert config.plr_batch_shrink == 2


def test_invalid_plr_config_rejected():
    with pytest.raises(ValueError, match="plr_interval"):
        small_config(plr_weight=2.0, plr_interval=0)
