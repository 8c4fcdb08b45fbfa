"""Fused jitted train/eval steps — one XLA program per compile bucket.

The reference's hot loop (train.py:132-259) interleaves many small CUDA
launches: critic repeats, generator update, eval sampling.  TPU-natively the
*entire iteration* — critic_repeats critic updates + one generator update,
including on-device latent/noise sampling and both R1 double-backwards — is
ONE jitted function with donated state, so XLA schedules/fuses everything and
no host round-trips happen inside an iteration.

Compile buckets: (stage steps, per-repeat fade flags, gen fade flag) — the
progressive analogue of the reference's dynamic-depth forward.  ``alpha`` is
recomputed on device from ``im_count`` exactly as train.py:143-146 /
198-201: ``alpha = im_count / fade_in``, switching to the no-blend variant
once alpha exceeds 1.0 (the host picks the bucket; the boundary condition
matches because ``im_count`` is deterministic).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from byogan_tpu.core.random import synthesis_noise, truncated_noise
from byogan_tpu.models import Critic, Generator
from byogan_tpu.train import losses
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import (
    TrainState,
    make_critic_optimizer,
    make_gen_optimizer,
)


def mixed_styles(
    key: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    steps: int,
    mix_prob: float,
) -> list:
    """Per-sample style-mixing crossover (StyleGAN §3.1, stage granularity).

    For each sample: with probability ``mix_prob`` draw a crossover stage
    ``t`` uniform in [1, steps) and use ``w2`` from stage ``t`` on; otherwise
    use ``w1`` everywhere (t = steps).  Stage 0 always uses ``w1``.  Returns
    ``steps`` per-stage (B, style_dim) arrays for ``Generator(style=...)``.
    """
    b = w1.shape[0]
    coin_key, t_key = jax.random.split(key)
    coin = jax.random.uniform(coin_key, (b,))
    t = jax.random.randint(t_key, (b,), 1, steps)
    t = jnp.where(coin < mix_prob, t, steps)
    return [jnp.where((i >= t)[:, None], w2, w1) for i in range(steps)]


def make_train_step(
    gen: Generator,
    critic: Critic,
    config: TrainConfig,
    steps: int,
    batch: int,
    fade_in: float,
    critic_fade: Tuple[bool, ...],
    gen_fade: bool,
    donate: bool = True,
    force_lazy: Optional[Dict[str, bool]] = None,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the fused step for one compile bucket.

    Args:
      steps: progressive stage (static; 1 = 4x4).
      batch: per-step global batch size (static shapes for XLA).
      fade_in: fade-in denominator in images (train.py:119); static per stage.
      critic_fade: per-critic-repeat fade flags (True = blend path); length
        must equal ``config.critic_repeats``.
      gen_fade: fade flag for the generator phase.
      force_lazy: FLOP-ACCOUNTING hook (bench.py) — never used by training.
        XLA's ``cost_analysis`` counts BOTH ``lax.cond`` branches of the lazy
        regularizers even though only one executes per step, which inflates
        the reported FLOPs/MFU (benchmarks/RESULTS.md).  Mapping each lazy
        feature name (``"r1"``, ``"plr"``) to True (penalized branch) or
        False (plain branch) replaces its cond with a direct call to that
        branch, yielding an exact cond-free program whose FLOPs CAN be
        counted; bench.py amortizes ``plain + (penalized - plain)/interval``.
        ``None`` (the default, and for unmentioned features) keeps the cond.
    """
    if len(critic_fade) != config.critic_repeats:
        raise ValueError("critic_fade must have one flag per critic repeat")

    gen_tx = make_gen_optimizer(config)
    critic_tx = make_critic_optimizer(config)
    use_r1 = config.use_r1
    c_lambda = config.c_lambda
    r1_interval = config.r1_interval
    if r1_interval > 1 and not use_r1:
        raise ValueError(
            "r1_interval > 1 requires use_r1=True (lazy regularization is an "
            "R1 extension; WGAN-GP's penalty IS the loss and cannot be lazy)"
        )
    ema_beta = config.ema_beta
    compute_dtype = jnp.dtype(config.compute_dtype)
    remat = config.stage_remat(steps - 1)  # per-stage override, config.py
    mix_prob = config.style_mix_prob
    # Style-mixing regularization (opt-in extension, PARITY.md): static per
    # bucket, so mix_prob == 0 (the default) emits the pre-existing
    # reference-faithful program UNTOUCHED (bit-identical trajectories).
    # Stage 1 has no crossover point — the plain path runs there even when
    # mixing is enabled.
    do_mix = mix_prob > 0.0 and steps >= 2
    # Discriminator augmentation (opt-in extension, ops/augment.py): static
    # gate, so the default emits the reference-faithful program untouched.
    # do_ada additionally adapts TrainState.aug_p toward the r_t target.
    do_aug = config.use_aug
    do_ada = config.ada_target > 0.0
    if do_ada and not use_r1:
        raise ValueError(
            "ada_target > 0 requires use_r1=True: the controller's r_t "
            "statistic E[sign(D(real))] is only calibrated for the logistic "
            "loss (WGAN critic scores have no meaningful zero).  Fixed-"
            "probability augmentation (aug_p) works with either loss."
        )
    if do_aug:
        from byogan_tpu.ops.augment import augment_batch
    # Path-length regularization (opt-in extension, losses.py): static gate,
    # so plr_weight == 0 (the default) emits the reference-faithful program
    # untouched.  Always lazy (lax.cond on the iteration counter, like lazy
    # R1) with the weight scaled by the interval, per the paper.
    do_plr = config.plr_weight > 0.0
    plr_interval = config.plr_interval
    plr_batch = max(1, batch // config.plr_batch_shrink)

    def lazy_cond(which, pred, true_fn, false_fn, operand):
        # The lazy-regularizer cond, unless bench.py's force_lazy accounting
        # hook pins this feature to one branch (docstring above).
        forced = None if force_lazy is None else force_lazy.get(which)
        if forced is None:
            return jax.lax.cond(pred, true_fn, false_fn, operand)
        return (true_fn if forced else false_fn)(operand)

    def synthesize_mixed(gp, z_key, noise, alpha):
        z1_key, z2_key, mix_key = jax.random.split(z_key, 3)
        z1 = truncated_noise(
            z1_key, batch, config.noise_size, config.noise_trunc, compute_dtype
        )
        z2 = truncated_noise(
            z2_key, batch, config.noise_size, config.noise_trunc, compute_dtype
        )
        w1 = gen.apply({"params": gp}, z1, method="map_latent")
        w2 = gen.apply({"params": gp}, z2, method="map_latent")
        styles = mixed_styles(mix_key, w1, w2, steps, mix_prob)
        return gen.apply(
            {"params": gp}, None, noise, steps=steps, alpha=alpha, style=styles
        )

    def maybe_remat(fn):
        # jax.checkpoint the whole-network apply: the backward (including the
        # R1 second-order path) recomputes activations instead of holding
        # them live — the memory lever for big-resolution stages.
        return jax.checkpoint(fn) if remat else fn

    def alpha_of(im_count: jax.Array) -> jax.Array:
        return (im_count.astype(jnp.float32) + 0.0) / fade_in

    def step(
        state: TrainState, real: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = state.rng
        im_count = state.im_count
        c_params = state.critic_params
        c_opt_state = state.critic_opt_state
        if real.dtype == jnp.uint8:
            # uint8 transport lane (data/pipeline.py device_normalize):
            # batches cross the host->device link raw (4x fewer bytes than
            # f32) and map to [-1,1] here — the same f32 expression the host
            # lane uses (pipeline._normalize), equal to float rounding (XLA
            # fuses it into an FMA: <=1 ulp vs numpy's two-op rounding) and
            # fused into the first conv's input cast.
            real = real.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        real = real.astype(compute_dtype)

        if do_aug and state.aug_p is None:
            raise ValueError(
                "augmentation is enabled (aug_p/ada_target) but TrainState "
                "carries no aug_p — create the state with the same config"
            )

        c_loss = jnp.float32(0)
        c_aux: Dict[str, jax.Array] = {}
        rt_acc = jnp.float32(0)  # per-repeat r_t readings, averaged for ADA
        for r, fade in enumerate(critic_fade):
            rng, z_key, noise_key, eps_key, aug_key = jax.random.split(rng, 5)
            alpha = alpha_of(im_count) if fade else None
            noise = synthesis_noise(noise_key, batch, steps, dtype=compute_dtype)
            if do_mix:
                fake = synthesize_mixed(state.gen_params, z_key, noise, alpha)
            else:
                z = truncated_noise(
                    z_key, batch, config.noise_size, config.noise_trunc,
                    compute_dtype,
                )
                fake = gen.apply(
                    {"params": state.gen_params}, z, noise, steps=steps,
                    alpha=alpha,
                )
            fake = jax.lax.stop_gradient(fake)  # critic sees detached fakes
            # (train.py:160)
            if do_aug:
                # Fresh independent augmentations per use (ADA: the critic
                # never sees an un-augmented image while p > 0).  The R1
                # penalty below then differentiates through D at its actual
                # (augmented) input, as in the ADA reference implementation.
                kr, kf = jax.random.split(aug_key)
                real_r = augment_batch(kr, real, state.aug_p)
                fake = augment_batch(kf, fake, state.aug_p)
            else:
                real_r = real

            def make_crit(cp):
                return maybe_remat(
                    lambda imgs: critic.apply(
                        {"params": cp}, imgs, steps=steps, alpha=alpha
                    )
                )

            def c_loss_fn(cp):
                crit = make_crit(cp)
                if use_r1:
                    return losses.critic_r1_loss(crit, real_r, fake, c_lambda)
                return losses.critic_wgan_gp_loss(
                    crit, real_r, fake, c_lambda, eps_key
                )

            if r1_interval > 1:
                # Lazy R1 (opt-in, StyleGAN2 §lazy regularization): the
                # penalty's double-backward runs only every r1_interval
                # iterations, with lambda scaled by the interval so the
                # effective regularization strength is unchanged.  Both
                # branches live in ONE compiled step (lax.cond on the
                # dynamic iteration counter — no extra jit buckets, no
                # retrace); only the taken branch executes on TPU.
                def penalized(cp):
                    return losses.critic_r1_loss(
                        make_crit(cp), real_r, fake, c_lambda * r1_interval
                    )

                def plain(cp):
                    return losses.critic_logistic_loss(
                        make_crit(cp), real_r, fake
                    )

                (c_loss, c_aux), c_grads = lazy_cond(
                    "r1",
                    state.iters % r1_interval == 0,
                    jax.value_and_grad(penalized, has_aux=True),
                    jax.value_and_grad(plain, has_aux=True),
                    c_params,
                )
            else:
                (c_loss, c_aux), c_grads = jax.value_and_grad(
                    c_loss_fn, has_aux=True
                )(c_params)
            if do_ada:
                rt_acc = rt_acc + c_aux["real_sign"]
            updates, c_opt_state = critic_tx.update(c_grads, c_opt_state, c_params)
            c_params = optax.apply_updates(c_params, updates)
            im_count = im_count + batch

        # Generator phase (train.py:193-219): fresh latents, alpha recomputed
        # after the critic repeats advanced im_count (train.py:198-201).
        rng, z_key, noise_key, g_aug_key = jax.random.split(rng, 4)
        alpha_g = alpha_of(im_count) if gen_fade else None
        z = (
            None
            if do_mix
            else truncated_noise(
                z_key, batch, config.noise_size, config.noise_trunc,
                compute_dtype,
            )
        )
        noise = synthesis_noise(noise_key, batch, steps, dtype=compute_dtype)

        def g_loss_fn(gp):
            if do_mix:
                fake = maybe_remat(
                    lambda k: synthesize_mixed(gp, k, noise, alpha_g)
                )(z_key)
            else:
                fake = maybe_remat(
                    lambda z_: gen.apply(
                        {"params": gp}, z_, noise, steps=steps, alpha=alpha_g
                    )
                )(z)
            if do_aug:
                # Differentiable: the generator receives its gradient
                # THROUGH the augmentation of its own output (the ADA
                # mechanism that makes augmented training non-leaking).
                fake = augment_batch(g_aug_key, fake, state.aug_p)
            pred = maybe_remat(
                lambda imgs: critic.apply(
                    {"params": c_params}, imgs, steps=steps, alpha=alpha_g
                )
            )(fake)
            if use_r1:
                return losses.gen_logistic_loss(pred)
            return losses.gen_wgan_loss(pred)

        pl_ema = state.pl_ema
        if do_plr:
            if pl_ema is None:
                raise ValueError(
                    "plr_weight > 0 but TrainState carries no pl_ema — "
                    "create the state with the same config"
                )
            rng, plr_z_key, plr_n_key, plr_y_key = jax.random.split(rng, 4)

            def penalized(gp):
                zp = truncated_noise(
                    plr_z_key, plr_batch, config.noise_size,
                    config.noise_trunc, compute_dtype,
                )
                w = gen.apply({"params": gp}, zp, method="map_latent")
                noise_p = synthesis_noise(
                    plr_n_key, plr_batch, steps, dtype=compute_dtype
                )

                def synth(w_):
                    return maybe_remat(
                        lambda wv: gen.apply(
                            {"params": gp}, None, noise_p, steps=steps,
                            alpha=alpha_g, style=[wv] * steps,
                        )
                    )(w_)

                pen, pl_mean = losses.gen_path_length_penalty(
                    synth, w, pl_ema, plr_y_key
                )
                # f32 on both cond branches: the penalty is f32 while the
                # bf16 main loss would otherwise make the branch output
                # dtypes diverge (lax.cond requires identical types).
                loss = g_loss_fn(gp).astype(jnp.float32) + (
                    config.plr_weight * plr_interval
                ) * pen
                # pl_ema's running-mean update belongs to the penalized
                # branch only (paper: tracked where observed); aux is not
                # differentiated (has_aux), so carrying it here is free.
                new_ema = pl_ema + config.plr_decay * (pl_mean - pl_ema)
                return loss, {
                    "pl_penalty": pen.astype(jnp.float32),
                    "pl_ema": new_ema.astype(jnp.float32),
                }

            def plain(gp):
                return g_loss_fn(gp).astype(jnp.float32), {
                    "pl_penalty": jnp.float32(0.0),
                    "pl_ema": pl_ema.astype(jnp.float32),
                }

            (g_loss, g_aux), g_grads = lazy_cond(
                "plr",
                state.iters % plr_interval == 0,
                jax.value_and_grad(penalized, has_aux=True),
                jax.value_and_grad(plain, has_aux=True),
                state.gen_params,
            )
            pl_ema = g_aux["pl_ema"]
        else:
            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.gen_params)
            g_aux = {}
        g_updates, g_opt_state = gen_tx.update(
            g_grads, state.gen_opt_state, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        # EMA shadow update (config.ema_beta > 0): pure elementwise lerp,
        # fused by XLA into the optimizer update — never trained against.
        gen_ema = state.gen_ema
        if ema_beta > 0 and gen_ema is not None:
            gen_ema = jax.tree.map(
                lambda e, p: e * ema_beta + p.astype(e.dtype) * (1.0 - ema_beta),
                gen_ema,
                gen_params,
            )

        # ADA controller (Karras et al. 2020 §3): nudge p so r_t =
        # E[sign(D(real_aug))] tracks the target; the full [0,1] traverse
        # takes ada_speed images.  The controller steers on an EMA of r_t
        # (all critic repeats averaged, then smoothed over ~1/(1-ada_rt_beta)
        # iterations) — a single minibatch's reading is +-1-quantized at
        # small batches and made p jitter (paper: r_t integrated over 4x64
        # images).  Pure scalar math on dynamic fields — no retrace.
        aug_p = state.aug_p
        rt_ema = state.rt_ema
        if do_ada:
            if rt_ema is None:
                raise ValueError(
                    "ada_target > 0 but TrainState carries no rt_ema — "
                    "create the state with the same config"
                )
            rt_iter = rt_acc / len(critic_fade)
            beta = config.ada_rt_beta
            rt_ema = beta * rt_ema + (1.0 - beta) * rt_iter
            adjust = jnp.sign(rt_ema - config.ada_target) * (
                (batch * config.critic_repeats) / float(config.ada_speed)
            )
            aug_p = jnp.clip(aug_p + adjust, 0.0, 1.0)

        new_state = state.replace(
            gen_params=gen_params,
            critic_params=c_params,
            gen_opt_state=g_opt_state,
            critic_opt_state=c_opt_state,
            rng=rng,
            iters=state.iters + 1,
            im_count=im_count,
            gen_ema=gen_ema,
            aug_p=aug_p,
            rt_ema=rt_ema,
            pl_ema=pl_ema,
        )
        metrics = {
            "c_loss": c_loss.astype(jnp.float32),
            "g_loss": g_loss.astype(jnp.float32),
            **{k: v.astype(jnp.float32) for k, v in c_aux.items()},
        }
        if do_aug:
            metrics["aug_p"] = aug_p
        if do_ada:
            metrics["rt_ema"] = rt_ema
        if do_plr:
            metrics["pl_penalty"] = g_aux["pl_penalty"]
            metrics["pl_ema"] = g_aux["pl_ema"]
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    gen: Generator,
    config: TrainConfig,
    steps: int,
    fade: bool,
) -> Callable[[Any, jax.Array, jax.Array, Optional[jax.Array]], jax.Array]:
    """Jitted eval sampling (the reference's fixed 25-noise grid forward,
    train.py:236-237).  Returns NHWC images in the generator's output range.
    """
    compute_dtype = jnp.dtype(config.compute_dtype)

    @functools.partial(jax.jit, static_argnums=())
    def eval_step(gen_params, show_z, noise_rng, alpha):
        noise = synthesis_noise(
            noise_rng, show_z.shape[0], steps, dtype=compute_dtype
        )
        return gen.apply(
            {"params": gen_params},
            show_z.astype(compute_dtype),
            noise,
            steps=steps,
            alpha=alpha if fade else None,
        ).astype(jnp.float32)

    return eval_step
