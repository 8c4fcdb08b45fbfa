"""Decompose the headline train step: where do the milliseconds go?

Times, at the headline configuration (stage 6, batch 128, bf16, R1):
  - the full fused step (bench.py's number),
  - the critic phase alone (forward+R1 double-backward+update),
  - the critic phase without the R1 penalty (lazy-R1 skip branch math),
  - the generator phase alone (synthesis+critic fwd+backward+update),
  - generator synthesis forward only.
Each phase is its own jit here, so the sum carries per-dispatch overhead the
fused step does not — sum >= full is expected; the split still localizes
the cost.

Run on the chip: PYTHONPATH=. python benchmarks/bench_phases.py
"""
import time

import jax
import jax.numpy as jnp
import optax

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.core.random import synthesis_noise, truncated_noise
from byogan_tpu.models import Critic, Generator
from byogan_tpu.train import losses
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import (
    create_train_state,
    make_critic_optimizer,
    make_gen_optimizer,
)
from byogan_tpu.train.steps import make_train_step

STAGE, BATCH = 6, 128
SIZE = 4 * 2 ** (STAGE - 1)


def timeit(fn, args, iters=20):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(jnp.asarray(jax.tree.leaves(acc)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def main():
    enable_compilation_cache()
    config = TrainConfig(compute_dtype="bfloat16")
    gen = Generator(dtype=jnp.bfloat16)
    critic = Critic(dtype=jnp.bfloat16)
    state = create_train_state(config, gen, critic)
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    z = truncated_noise(key, BATCH, config.noise_size, config.noise_trunc, dt)
    noise = synthesis_noise(jax.random.PRNGKey(1), BATCH, STAGE, dtype=dt)
    real = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3), jnp.float32
    ).astype(dt)
    gp, cp = state.gen_params, state.critic_params
    c_tx, g_tx = make_critic_optimizer(config), make_gen_optimizer(config)
    c_opt = state.critic_opt_state
    g_opt = state.gen_opt_state

    @jax.jit
    def synth(gp):
        return gen.apply({"params": gp}, z, noise, steps=STAGE, alpha=None)

    fake = jax.block_until_ready(synth(gp))

    def crit_fn(cp):
        return lambda imgs: critic.apply(
            {"params": cp}, imgs, steps=STAGE, alpha=None
        )

    @jax.jit
    def critic_phase_r1(cp, c_opt):
        (loss, _), grads = jax.value_and_grad(
            lambda p: losses.critic_r1_loss(
                crit_fn(p), real, fake, config.c_lambda
            ),
            has_aux=True,
        )(cp)
        upd, c_opt = c_tx.update(grads, c_opt, cp)
        return optax.apply_updates(cp, upd), c_opt, loss

    @jax.jit
    def critic_phase_plain(cp, c_opt):
        (loss, _), grads = jax.value_and_grad(
            lambda p: losses.critic_logistic_loss(crit_fn(p), real, fake),
            has_aux=True,
        )(cp)
        upd, c_opt = c_tx.update(grads, c_opt, cp)
        return optax.apply_updates(cp, upd), c_opt, loss

    @jax.jit
    def gen_phase(gp, g_opt):
        def g_loss(p):
            f = gen.apply({"params": p}, z, noise, steps=STAGE, alpha=None)
            return losses.gen_logistic_loss(crit_fn(cp)(f))

        loss, grads = jax.value_and_grad(g_loss)(gp)
        upd, g_opt = g_tx.update(grads, g_opt, gp)
        return optax.apply_updates(gp, upd), g_opt, loss

    full = make_train_step(
        gen, critic, config, steps=STAGE, batch=BATCH, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )

    rows = [
        ("full fused step", timeit(full, (state, real))),
        ("critic phase (R1)", timeit(critic_phase_r1, (cp, c_opt))),
        ("critic phase (no penalty)", timeit(critic_phase_plain, (cp, c_opt))),
        ("gen phase (fwd+bwd+update)", timeit(gen_phase, (gp, g_opt))),
        ("gen synthesis fwd only", timeit(synth, (gp,))),
    ]
    for name, sec in rows:
        print(f"{name:>28}: {sec * 1e3:7.1f} ms  "
              f"({BATCH / sec:7.1f} img/s equiv)")


if __name__ == "__main__":
    main()
