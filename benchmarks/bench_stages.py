"""Train-step throughput at every progressive stage (RESULTS.md table)."""
import json
import os
import time

import jax
import jax.numpy as jnp

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.models import Critic, Generator
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import create_train_state
from byogan_tpu.train.steps import make_train_step


def main():
    enable_compilation_cache()
    batches = {1: 512, 2: 512, 3: 256, 4: 256, 5: 128, 6: 128, 7: 32, 8: 8}
    config = TrainConfig(compute_dtype="bfloat16")
    gen = Generator(dtype=jnp.bfloat16)
    critic = Critic(dtype=jnp.bfloat16)
    state0 = create_train_state(config, gen, critic)
    for stage in range(1, 9):
        batch = batches[stage]
        size = 4 * 2 ** (stage - 1)
        step_fn = make_train_step(
            gen, critic, config, steps=stage, batch=batch, fade_in=100.0,
            critic_fade=(False,), gen_fade=False, donate=False,
        )
        real = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3))
        state = state0
        state, m = step_fn(state, real)
        float(m["c_loss"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, m = step_fn(state, real)
        float(m["c_loss"])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "stage": stage, "px": size, "batch": batch,
            "images_per_sec": round(iters * batch / dt, 1),
            "ms_per_iter": round(dt / iters * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
