"""Loss-function tests: reference formulas, WGAN-GP correctness (the
reference's own WGAN-GP is broken — gan.py:368/372 — so the oracle here is
the intended WGAN-GP semantics, written independently in torch)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.train.losses import (
    critic_wgan_gp_loss,
    gen_logistic_loss,
    gen_wgan_loss,
)


def test_gen_losses_formulas():
    pred = jnp.asarray([[1.0], [-2.0], [0.5]])
    np.testing.assert_allclose(float(gen_wgan_loss(pred)), -float(pred.mean()))
    want = float(np.mean(np.log1p(np.exp(-np.asarray(pred)))))
    np.testing.assert_allclose(float(gen_logistic_loss(pred)), want, rtol=1e-6)


def test_wgan_gp_matches_torch_oracle():
    torch = pytest.importorskip("torch")

    from tests.conftest import REFERENCE_DIR, reference_available

    if not reference_available():
        pytest.skip("reference unavailable")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import gan

    from byogan_tpu.compat.torch_ckpt import critic_params_from_torch
    from byogan_tpu.models import Critic

    torch.manual_seed(0)
    ref_critic = gan.Critic()
    params = critic_params_from_torch(ref_critic.state_dict())
    critic = Critic()

    batch, steps, lam = 4, 2, 10.0
    real_t = torch.randn(batch, 3, 8, 8)
    fake_t = torch.randn(batch, 3, 8, 8)
    eps_t = torch.rand(batch, 1, 1, 1)

    # Intended WGAN-GP semantics (what gan.py:357-391 tries to compute),
    # written independently:
    mixed = (real_t * eps_t + (1 - eps_t) * fake_t).requires_grad_()
    mixed_scores = ref_critic(mixed, steps, None)
    grad = torch.autograd.grad(
        mixed_scores.sum(), mixed, create_graph=True
    )[0]
    gp = ((grad.view(batch, -1).norm(2, dim=1) - 1) ** 2).mean()
    want = (
        -ref_critic(real_t, steps, None).mean()
        + ref_critic(fake_t, steps, None).mean()
        + lam * gp
    ).item()

    # Ours, with the SAME eps injected by monkeypatching the uniform draw.
    crit_fn = lambda imgs: critic.apply(  # noqa: E731
        {"params": params}, imgs, steps=steps, alpha=None
    )
    real_j = jnp.asarray(real_t.numpy().transpose(0, 2, 3, 1))
    fake_j = jnp.asarray(fake_t.numpy().transpose(0, 2, 3, 1))
    eps_j = jnp.asarray(eps_t.numpy().reshape(batch, 1, 1, 1))

    orig_uniform = jax.random.uniform
    try:
        jax.random.uniform = lambda key, shape, dtype=jnp.float32, **kw: (
            eps_j.astype(dtype)
        )
        got, aux = critic_wgan_gp_loss(
            crit_fn, real_j, fake_j, lam, jax.random.PRNGKey(0)
        )
    finally:
        jax.random.uniform = orig_uniform
    np.testing.assert_allclose(float(got), want, rtol=2e-4, atol=2e-4)


def test_wgan_gp_gradients_flow():
    """Outer param-grad through the double-backward is finite and nonzero."""
    from tests.conftest import small_critic

    critic = small_critic()
    key = jax.random.PRNGKey(0)
    params = critic.init(key, jnp.zeros((4, 4, 4, 3)), steps=1)["params"]
    real = jax.random.normal(key, (4, 4, 4, 3))
    fake = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 3))

    def loss_fn(p):
        crit = lambda imgs: critic.apply(  # noqa: E731
            {"params": p}, imgs, steps=1, alpha=None
        )
        loss, _ = critic_wgan_gp_loss(crit, real, fake, 10.0, jax.random.PRNGKey(2))
        return loss

    grads = jax.grad(loss_fn)(params)
    flat = np.concatenate([np.asarray(g).ravel() for g in jax.tree.leaves(grads)])
    assert np.isfinite(flat).all()
    assert np.abs(flat).max() > 0
