"""Training state pytree + optimizer construction.

Mirrors the reference's optimizer setup (train.py:59-77): Adam with
betas (beta_1, beta_2) for both nets; the generator's mapping network gets a
0.01x learning-rate parameter group (the StyleGAN trick, train.py:61-64).
In optax that parameter group is an ``optax.multi_transform`` keyed on the
top-level ``mapping`` module path.

Unlike the reference checkpoint (which drops optimizer state and RNG —
SURVEY.md §5 "known gaps to fix, not replicate"), TrainState carries
everything needed for *exact* resume: both param trees, both optimizer
states, the PRNG key, and the progress counters (iters, im_count, stage,
epoch).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from byogan_tpu.core.random import synthesis_noise
from byogan_tpu.models import Critic, Generator
from byogan_tpu.train.config import TrainConfig


class TrainState(struct.PyTreeNode):
    gen_params: Any
    critic_params: Any
    gen_opt_state: Any
    critic_opt_state: Any
    rng: jax.Array
    iters: jax.Array  # int32 scalar — global iteration count (train.py:86)
    im_count: jax.Array  # int32 scalar — images seen this stage (train.py:108)
    # EMA shadow of gen_params (None unless config.ema_beta > 0).  On/off is
    # fixed for a run, so the pytree structure — and thus the jit buckets —
    # never changes mid-run.
    gen_ema: Any = None
    # Augmentation probability (None unless config.use_aug) — a DYNAMIC f32
    # scalar, so the ADA controller (train/steps.py) can adapt it every
    # iteration without retracing the step.
    aug_p: Any = None
    # EMA of the ADA overfit heuristic r_t (None unless ada_target > 0) —
    # the controller's smoothed input (config.ada_rt_beta); dynamic like
    # aug_p so updating it never retraces.
    rt_ema: Any = None
    # Running mean of observed path lengths for PLR (None unless
    # config.plr_weight > 0) — the penalty's moving target `a` (StyleGAN2
    # §3.2); dynamic f32 scalar, updated only on penalized iterations.
    pl_ema: Any = None
    # host-side (static) progress bookkeeping, carried for checkpointing:
    stage: int = struct.field(pytree_node=False, default=1)
    epoch: int = struct.field(pytree_node=False, default=0)


def make_gen_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Adam with a 0.01x-LR group for the mapping network (train.py:59-70)."""
    adam = lambda lr: optax.adam(  # noqa: E731
        lr, b1=config.beta_1, b2=config.beta_2, eps=1e-8
    )
    return optax.multi_transform(
        {
            "mapping": adam(config.learning_rate * config.mapping_lr_mult),
            "main": adam(config.learning_rate),
        },
        param_labels=lambda params: jax.tree.map_with_path(
            lambda path, _: (
                "mapping" if path and getattr(path[0], "key", None) == "mapping"
                else "main"
            ),
            params,
        ),
    )


def make_critic_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Plain Adam (train.py:76-77)."""
    return optax.adam(
        config.learning_rate, b1=config.beta_1, b2=config.beta_2, eps=1e-8
    )


def create_train_state(
    config: TrainConfig,
    gen: Generator,
    critic: Critic,
    seed: Optional[int] = None,
    gen_params: Optional[Any] = None,
    critic_params: Optional[Any] = None,
) -> TrainState:
    """Initialize (or adopt converted) params and fresh optimizer states."""
    key = jax.random.PRNGKey(config.seed if seed is None else seed)
    key, gen_key, critic_key, state_key = jax.random.split(key, 4)
    # Inits are jitted: unjitted flax init dispatches thousands of tiny ops,
    # which is pathological over a remote-dispatch TPU backend.
    if gen_params is None:
        z = jnp.zeros((1, config.noise_size), jnp.float32)

        def gen_init(k):
            noise = synthesis_noise(k, 1, 1)
            return gen.init(k, z, noise, steps=1)["params"]

        gen_params = jax.jit(gen_init)(gen_key)
    if critic_params is None:
        critic_params = jax.jit(
            lambda k: critic.init(k, jnp.zeros((4, 4, 4, 3), jnp.float32), steps=1)[
                "params"
            ]
        )(critic_key)
    gen_opt_state = make_gen_optimizer(config).init(gen_params)
    critic_opt_state = make_critic_optimizer(config).init(critic_params)
    # EMA starts as a deep COPY of the generator params — distinct buffers,
    # so buffer donation in the jitted step never aliases the two trees.
    gen_ema = (
        jax.tree.map(lambda x: x.copy(), gen_params)
        if config.ema_beta > 0
        else None
    )
    return TrainState(
        gen_params=gen_params,
        critic_params=critic_params,
        gen_opt_state=gen_opt_state,
        critic_opt_state=critic_opt_state,
        rng=state_key,
        iters=jnp.int32(0),
        im_count=jnp.int32(0),
        gen_ema=gen_ema,
        aug_p=jnp.float32(config.aug_p) if config.use_aug else None,
        rt_ema=jnp.float32(0.0) if config.ada_target > 0 else None,
        pl_ema=jnp.float32(0.0) if config.plr_weight > 0 else None,
        stage=1,
        epoch=0,
    )
