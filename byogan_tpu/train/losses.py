"""GAN losses as pure functions (reference gan.py:224-228, 357-412).

The reference attaches losses as nn.Module methods that call ``.backward()``
themselves (critic side) or return tensors for the caller to backward (gen
side).  In JAX both are pure scalar functions differentiated with
``jax.grad``; the R1/GP "double backward" is an inner ``jax.vjp`` through the
critic w.r.t. its *input images*, nested inside the outer parameter gradient
— trivially composable under jit and pjit.

Reference-bug policy (SURVEY.md §7): the reference's WGAN-GP is broken as
written (undefined ``self.device`` / ``fake_im``, gan.py:368/372 — NameError
if ever called; dead path under the default ``use_r1=True``).  Here it is
implemented *correctly* per the WGAN-GP paper semantics the reference
intended: eps-mixed images, gradient-norm penalty ``(||grad||_2 - 1)^2``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Apply = Callable[..., jax.Array]  # critic apply: (params, images) -> (N, 1)


def softplus(x: jax.Array) -> jax.Array:
    return jax.nn.softplus(x)


# -- Generator losses (reference gan.py:224-228) ----------------------------


def gen_wgan_loss(crit_fake_pred: jax.Array) -> jax.Array:
    """``-mean(D(G(z)))`` (gan.py:224-225)."""
    return -jnp.mean(crit_fake_pred)


def gen_logistic_loss(crit_fake_pred: jax.Array) -> jax.Array:
    """Non-saturating logistic ``mean(softplus(-D(G(z))))`` (gan.py:227-228;
    the reference misnames this ``get_r1_loss`` — the R1 penalty itself lives
    on the critic side)."""
    return jnp.mean(softplus(-crit_fake_pred))


def gen_path_length_penalty(
    synth_fn: Callable[[jax.Array], jax.Array],
    w: jax.Array,
    pl_ema: jax.Array,
    y_key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """StyleGAN2 path-length regularization term (Karras et al. 2020 §3.2;
    opt-in extension — the reference has no generator-side regularizer).

    ``pl_i = ||J_w^T y||_2`` per sample, estimated with one random image
    direction ``y ~ N(0, I) / sqrt(H*W)`` and one VJP through the synthesis
    network (the transpose-Jacobian product IS a backward pass — the same
    second-order machinery as R1's penalty, on the generator side).

    Returns ``(penalty, pl_mean)`` where ``penalty = mean((pl - pl_ema)^2)``
    and ``pl_mean`` feeds the caller's running-mean update of ``pl_ema``.
    The generator's output depends on its own sample's ``w`` row only, so
    the gradient of the summed projection separates per sample exactly.
    """

    def projection(w_: jax.Array) -> jax.Array:
        img = synth_fn(w_).astype(jnp.float32)
        h, wd = img.shape[1], img.shape[2]
        y = jax.random.normal(y_key, img.shape, jnp.float32) / jnp.sqrt(
            float(h * wd)
        )
        return jnp.sum(img * y)

    grads = jax.grad(projection)(w).astype(jnp.float32)
    pl = jnp.sqrt(jnp.sum(jnp.square(grads), axis=-1) + 1e-8)
    pl_mean = jnp.mean(pl)
    penalty = jnp.mean(jnp.square(pl - pl_ema))
    return penalty, pl_mean


# -- Critic losses (reference gan.py:357-412) -------------------------------


def _real_sign(real_pred: jax.Array) -> jax.Array:
    """``E[sign(D(real))]`` — the ADA overfitting heuristic r_t (Karras et
    al. 2020 §3): approaches +1 as the critic becomes confidently right on
    (its view of) the training reals, ~0 at the logistic equilibrium.
    Logged in aux; the adaptive-augmentation controller (train/steps.py)
    steers it toward ``config.ada_target``."""
    return jnp.mean(jnp.sign(real_pred.astype(jnp.float32)))


def critic_r1_loss(
    critic_fn: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    c_lambda: float,
) -> Tuple[jax.Array, dict]:
    """Logistic loss + R1 penalty (reference gan.py:393-412).

    ``softplus(-D(real)).mean() + softplus(D(fake)).mean()
      + (lambda/2) * mean(||d D(real) / d real||^2)``

    The penalty gradient is computed with one ``jax.vjp`` through the critic,
    reusing the real-image forward pass for both the prediction and the
    gradient (the reference runs autograd.grad on the same graph,
    gan.py:398-400).
    """
    real_pred, vjp_fn = jax.vjp(critic_fn, real)
    (grad_real,) = vjp_fn(jnp.ones_like(real_pred))
    grad_real = grad_real.astype(jnp.float32)
    # torch: grad.view(N, -1).norm(2, dim=1) ** 2, then mean (gan.py:401-403)
    gp = jnp.mean(jnp.sum(jnp.square(grad_real.reshape(real.shape[0], -1)), axis=1))
    fake_pred = critic_fn(fake)
    real_term = jnp.mean(softplus(-real_pred.astype(jnp.float32)))
    fake_term = jnp.mean(softplus(fake_pred.astype(jnp.float32)))
    penalty = (c_lambda / 2.0) * gp
    loss = real_term + fake_term + penalty
    aux = {
        "real_pred": jnp.mean(real_pred),
        "fake_pred": jnp.mean(fake_pred),
        "r1_penalty": penalty,
        "real_sign": _real_sign(real_pred),
    }
    return loss, aux


def critic_logistic_loss(
    critic_fn: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
) -> Tuple[jax.Array, dict]:
    """Logistic critic loss WITHOUT the R1 penalty — the skip branch of lazy
    R1 regularization (``r1_interval > 1``, an opt-in extension; the
    reference applies the penalty every iteration, gan.py:393-412).  Aux tree
    matches ``critic_r1_loss`` (r1_penalty = 0) so both can be ``lax.cond``
    branches of one compiled step.
    """
    real_pred = critic_fn(real)
    fake_pred = critic_fn(fake)
    real_term = jnp.mean(softplus(-real_pred.astype(jnp.float32)))
    fake_term = jnp.mean(softplus(fake_pred.astype(jnp.float32)))
    loss = real_term + fake_term
    aux = {
        "real_pred": jnp.mean(real_pred),
        "fake_pred": jnp.mean(fake_pred),
        "r1_penalty": jnp.float32(0.0),
        "real_sign": _real_sign(real_pred),
    }
    return loss, aux


def critic_wgan_gp_loss(
    critic_fn: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    c_lambda: float,
    eps_rng: jax.Array,
) -> Tuple[jax.Array, dict]:
    """WGAN-GP (corrected reference gan.py:357-391; see module docstring).

    ``-mean(D(real)) + mean(D(fake))
      + lambda * mean((||d D(x_hat)/d x_hat||_2 - 1)^2)``
    with ``x_hat = eps*real + (1-eps)*fake``, per-sample eps ~ U[0,1)
    (gan.py:367-372 intent).
    """
    n = real.shape[0]
    eps = jax.random.uniform(eps_rng, (n, 1, 1, 1), dtype=real.dtype)
    mixed = real * eps + (1.0 - eps) * fake
    mixed_pred, vjp_fn = jax.vjp(critic_fn, mixed)
    (grad_mixed,) = vjp_fn(jnp.ones_like(mixed_pred))
    grad_mixed = grad_mixed.astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(grad_mixed.reshape(n, -1)), axis=1) + 1e-12)
    gp = jnp.mean(jnp.square(norms - 1.0))
    real_pred = critic_fn(real)
    fake_pred = critic_fn(fake)
    loss = (
        -jnp.mean(real_pred.astype(jnp.float32))
        + jnp.mean(fake_pred.astype(jnp.float32))
        + c_lambda * gp
    )
    aux = {
        "real_pred": jnp.mean(real_pred),
        "fake_pred": jnp.mean(fake_pred),
        "gradient_penalty": c_lambda * gp,
    }
    return loss, aux
