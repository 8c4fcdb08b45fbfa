"""Latent projection: invert images into the generator's W space.

The standard StyleGAN tooling companion (editing, interpolation anchors,
model debugging) — absent from the reference, which has no W access at all
(gan.py:185 maps z inline).  Builds on the generator's style-injection
extension (models/generator.py).

TPU-native design: the ENTIRE optimization — Adam over w, synthesis, and a
multi-scale Laplacian-pyramid reconstruction loss (reusing eval/swd.py's
pyramid) — is one ``lax.scan`` inside one jitted function, compiled once
per (batch, steps, n_iters).  Measured nuance (benchmarks/RESULTS.md): in
steady state this is ~parity with a host loop of async single-step
dispatches (the dispatch queue hides the tunnel RTT as long as nothing is
read back); the scan's concrete wins are (a) the full loss trajectory
returns as one device array — a host loop pays ~25ms RTT per iteration the
moment it wants losses — and (b) a single-call API with no optimizer state
threading on the host.

No perceptual network (LPIPS needs pretrained weights; none offline): the
loss is L1 over pyramid bands plus plain L2, which recovers generated
images essentially exactly and gives sensible real-image projections.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from byogan_tpu.eval.swd import laplacian_pyramid


class ProjectResult(NamedTuple):
    w: jax.Array  # (B, style_dim) or (B, steps, style_dim) for w_plus
    image: jax.Array  # (B, H, W, 3) final reconstruction, float32 ~[-1,1]
    losses: jax.Array  # (n_iters,) mean loss trajectory, float32


def _pyramid_loss(recon: jax.Array, target, target_levels) -> jax.Array:
    """L1 over matching Laplacian bands + L2 pixels (per-batch mean)."""
    recon_levels = laplacian_pyramid(recon, min_size=min(8, recon.shape[1]))
    band = sum(
        jnp.abs(r - t).mean() for r, t in zip(recon_levels, target_levels)
    )
    return band + jnp.square(recon - target).mean()


@functools.partial(
    jax.jit, static_argnames=("gen", "steps", "n_iters", "w_plus")
)
def _project_jit(
    gen,
    params,
    target: jax.Array,
    w_init: jax.Array,
    noise_key: jax.Array,
    steps: int,
    n_iters: int,
    lr: float,
    w_plus: bool,
    alpha,
):
    tx = optax.adam(lr, b1=0.9, b2=0.999)
    opt_state = tx.init(w_init)
    target_levels = laplacian_pyramid(
        target, min_size=min(8, target.shape[1])
    )
    from byogan_tpu.core.random import synthesis_noise

    # Fixed noise for the whole optimization: the reconstruction target for
    # w, not a stochastic-texture fit.
    noise = synthesis_noise(noise_key, target.shape[0], steps)

    def synth(w):
        style = (
            [w[:, i, :] for i in range(steps)] if w_plus else w
        )
        return gen.apply(
            params, None, noise, steps=steps, alpha=alpha, style=style
        ).astype(jnp.float32)

    def loss_fn(w):
        return _pyramid_loss(synth(w), target, target_levels)

    def step(carry, _):
        w, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(w)
        updates, opt_state = tx.update(grads, opt_state, w)
        w = optax.apply_updates(w, updates)
        return (w, opt_state), loss

    (w, _), losses = jax.lax.scan(
        step, (w_init, opt_state), None, length=n_iters
    )
    return w, synth(w), losses


@functools.partial(jax.jit, static_argnames=("gen", "z_dim", "n"))
def _mean_w_jit(gen, params, z_dim: int, trunc, n: int):
    from byogan_tpu.core.random import truncated_noise

    z = truncated_noise(jax.random.PRNGKey(0x57AB1E), n, z_dim, trunc)
    return gen.apply(params, z, method="map_latent").astype(
        jnp.float32
    ).mean(axis=0)


def mean_w(
    gen, params, z_dim: int, trunc: float = 0.75, n: int = 4096
) -> jax.Array:
    """Mean mapping output over ``n`` training-distribution latents.

    THE canonical W center: fixed latent key, jitted once per (gen, z_dim,
    n) — every surface that needs a mean w (Sampler truncation_psi,
    generate --psi, byogan-mix, projection init) calls this, so they all
    agree on the center by construction.
    """
    return _mean_w_jit(gen, params, z_dim, trunc, n)


def project(
    gen,
    params,
    target: jax.Array,
    steps: int,
    z_dim: int,
    n_iters: int = 400,
    lr: float = 0.05,
    w_plus: bool = False,
    w_init: Optional[jax.Array] = None,
    noise_seed: int = 0,
    alpha: Optional[float] = None,
) -> ProjectResult:
    """Optimize W-space latents so the generator reproduces ``target``.

    ``target``: NHWC float in [-1, 1] (or uint8, converted) at stage
    ``steps``' resolution.  ``w_plus=True`` optimizes an independent w per
    stage (more expressive inversion, the usual editing choice);
    ``w_plus=False`` a single w (stays on the model's natural manifold).
    Initialization is the mean w unless ``w_init`` is given.  ``alpha``:
    the checkpoint's fade alpha, so mid-fade checkpoints are inverted
    against the blended forward they actually sample with (None = no
    blend, matching a completed stage).

    One compiled program per (batch, steps, n_iters, w_plus) — re-invoking
    with the same shapes reuses the executable.
    """
    target = jnp.asarray(target)
    if target.dtype == jnp.uint8:
        from byogan_tpu.core.grids import uint8_to_training_range

        target = uint8_to_training_range(target)
    target = target.astype(jnp.float32)
    expect = 4 * 2 ** (steps - 1)
    if target.shape[1] != expect or target.shape[2] != expect:
        raise ValueError(
            f"target is {target.shape[1]}x{target.shape[2]}, stage {steps} "
            f"needs {expect}x{expect}"
        )
    batch = target.shape[0]
    if w_init is None:
        wm = mean_w(gen, params, z_dim)
        w_init = jnp.broadcast_to(wm, (batch,) + wm.shape)
        if w_plus:
            w_init = jnp.broadcast_to(
                w_init[:, None, :], (batch, steps, wm.shape[-1])
            )
    w_init = jnp.asarray(w_init, jnp.float32)
    want = (batch, steps, None) if w_plus else (batch, None)
    if w_init.ndim != len(want) or any(
        e is not None and w_init.shape[i] != e for i, e in enumerate(want)
    ):
        raise ValueError(
            f"w_init shape {w_init.shape} does not match "
            f"{'(batch, steps, style_dim)' if w_plus else '(batch, style_dim)'}"
            f" for batch={batch}, steps={steps} — a saved 1-D w must be "
            "given a batch axis (w[None, :])"
        )
    w, image, losses = _project_jit(
        gen,
        params,
        target,
        w_init,
        jax.random.PRNGKey(noise_seed),
        steps,
        n_iters,
        lr,
        w_plus,
        None if alpha is None else jnp.float32(alpha),
    )
    return ProjectResult(w=w, image=image, losses=losses)
