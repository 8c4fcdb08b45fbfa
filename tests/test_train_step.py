"""Tests for the fused train step: both losses, fade/no-fade, state advance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.models import Critic, Generator
from byogan_tpu.train.state import make_gen_optimizer
from byogan_tpu.train.steps import make_eval_step, make_train_step
from tests.conftest import (
    SMALL_CRITIC_BLOCKS,
    SMALL_CRITIC_FROM_RGB,
    SMALL_GEN_CHANNELS,
    build,
    small_config,
    small_critic,
    small_generator,
)


@pytest.mark.parametrize("use_r1", [True, False])
@pytest.mark.parametrize("fade", [True, False])
def test_train_step_runs_and_updates(use_r1, fade):
    config = small_config(use_r1=use_r1)
    gen, critic, state = build(config)
    steps, batch = 2, 4
    step_fn = make_train_step(
        gen, critic, config,
        steps=steps, batch=batch, fade_in=100.0,
        critic_fade=(fade,), gen_fade=fade, donate=False,
    )
    real = jax.random.normal(jax.random.PRNGKey(9), (batch, 8, 8, 3))
    g0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.gen_params)

    metrics = None
    for _ in range(2):
        state, metrics = step_fn(state, real)

    assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
    assert int(state.iters) == 2
    assert int(state.im_count) == 2 * batch * config.critic_repeats
    # generator params moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.gen_params, g0
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_critic_repeats_advances_im_count():
    config = small_config(critic_repeats=3)
    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config,
        steps=1, batch=4, fade_in=50.0,
        critic_fade=(True, True, True), gen_fade=True, donate=False,
    )
    real = jnp.zeros((4, 4, 4, 3))
    state, _ = step_fn(state, real)
    assert int(state.im_count) == 12


def test_mapping_lr_group_is_smaller():
    """Mapping net must update ~100x slower than synthesis (train.py:61-64)."""
    config = small_config()
    gen, critic, state = build(config)
    tx = make_gen_optimizer(config)
    grads = jax.tree.map(jnp.ones_like, state.gen_params)
    updates, _ = tx.update(grads, state.gen_opt_state, state.gen_params)
    map_update = float(
        jnp.abs(updates["mapping"]["dense0"]["weight"]).max()
    )
    main_update = float(jnp.abs(updates["stages_0"]["conv1"]["const"]).max())
    assert map_update == pytest.approx(main_update * config.mapping_lr_mult, rel=1e-3)


def test_eval_step_shapes():
    config = small_config()
    gen, critic, state = build(config)
    eval_fn = make_eval_step(gen, config, steps=3, fade=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (25, 32))
    imgs = eval_fn(state.gen_params, z, jax.random.PRNGKey(1), jnp.float32(0.5))
    assert imgs.shape == (25, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_r1_penalty_matches_torch_reference_gradients():
    """R1 critic gradients via nested vjp equal torch autograd numbers."""
    torch = pytest.importorskip("torch")
    import sys

    from tests.conftest import REFERENCE_DIR, reference_available

    if not reference_available():
        pytest.skip("reference unavailable")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import gan

    from byogan_tpu.compat.torch_ckpt import critic_params_from_torch
    from byogan_tpu.train.losses import critic_r1_loss

    torch.manual_seed(0)
    ref_critic = gan.Critic()
    params = critic_params_from_torch(ref_critic.state_dict())
    critic = Critic()

    batch, steps, lam = 4, 2, 10.0
    real_t = torch.randn(batch, 3, 8, 8, requires_grad=True)
    fake_t = torch.randn(batch, 3, 8, 8)

    # torch oracle (mirrors gan.py:393-412 math without the .backward side
    # effect)
    real_pred = ref_critic(real_t, 2, None)
    fake_pred = ref_critic(fake_t, 2, None)
    grad_real = torch.autograd.grad(real_pred.sum(), real_t, create_graph=True)[0]
    gp = (grad_real.view(batch, -1).norm(2, dim=1) ** 2).mean()
    want = (
        torch.nn.functional.softplus(-real_pred).mean()
        + torch.nn.functional.softplus(fake_pred).mean()
        + lam / 2 * gp
    ).item()

    real_j = jnp.asarray(real_t.detach().numpy().transpose(0, 2, 3, 1))
    fake_j = jnp.asarray(fake_t.numpy().transpose(0, 2, 3, 1))
    crit_fn = lambda imgs: critic.apply(  # noqa: E731
        {"params": params}, imgs, steps=2, alpha=None
    )
    got, _ = critic_r1_loss(crit_fn, real_j, fake_j, lam)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_donated_step_matches_undonated():
    """Buffer donation must not change results (SURVEY §5: guard donated-
    buffer reuse) — run the same sequence with and without donation."""
    config = small_config()
    gen, critic, state_a = build(config)
    _, _, state_b = build(config)  # identical init (same seed)
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 3))
    kwargs = dict(steps=1, batch=4, fade_in=50.0, critic_fade=(True,), gen_fade=True)
    donated = make_train_step(gen, critic, config, donate=True, **kwargs)
    plain = make_train_step(gen, critic, config, donate=False, **kwargs)
    for _ in range(3):
        state_a, m_a = donated(state_a, real)
        state_b, m_b = plain(state_b, real)
    np.testing.assert_allclose(float(m_a["c_loss"]), float(m_b["c_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_a["g_loss"]), float(m_b["g_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.gen_params), jax.tree.leaves(state_b.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_lazy_r1_penalizes_every_nth_iteration():
    """r1_interval=N: the penalty fires only when iters % N == 0, and the
    penalized iteration is numerically identical to an eager step whose
    lambda is scaled by N (the StyleGAN2 lazy-regularization contract)."""
    n = 4
    config = small_config(r1_interval=n)
    gen, critic, state = build(config)
    kwargs = dict(steps=1, batch=4, fade_in=50.0, critic_fade=(False,),
                  gen_fade=False, donate=False)
    step_fn = make_train_step(gen, critic, config, **kwargs)
    real = jax.random.normal(jax.random.PRNGKey(7), (4, 4, 4, 3))

    # Oracle for the first (penalized) iteration: eager R1 with lambda*N.
    eager_cfg = small_config(c_lambda=config.c_lambda * n)
    _, _, state_e = build(eager_cfg)  # same seed -> identical init
    eager_fn = make_train_step(gen, critic, eager_cfg, **kwargs)
    state_e, m_e = eager_fn(state_e, real)

    penalties = []
    for i in range(2 * n):
        state, metrics = step_fn(state, real)
        assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
        penalties.append(float(metrics["r1_penalty"]))
        if i == 0:
            np.testing.assert_allclose(
                float(metrics["c_loss"]), float(m_e["c_loss"]), rtol=1e-6
            )
            for a, b in zip(
                jax.tree.leaves(state.critic_params),
                jax.tree.leaves(state_e.critic_params),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
                )
    assert penalties[0] != 0.0 and penalties[n] != 0.0
    assert all(p == 0.0 for i, p in enumerate(penalties) if i % n != 0)


def test_lazy_r1_requires_use_r1():
    config = small_config(use_r1=False, r1_interval=2)
    gen, critic, state = build(config)
    with pytest.raises(ValueError, match="r1_interval"):
        make_train_step(
            gen, critic, config, steps=1, batch=4, fade_in=50.0,
            critic_fade=(False,), gen_fade=False, donate=False,
        )
