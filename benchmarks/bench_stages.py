"""Train-step throughput at every progressive stage (RESULTS.md table).

Round 2: stages 7-8 sweep batch size and remat (jax.checkpoint) — VERDICT r1
item 1: the big stages dominate real-run wall-clock and were only ever
measured at one (small) batch.  Env knobs: BENCH_ONLY="7,8" to restrict,
BENCH_ITERS (default 10).
"""
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

# (batch, remat) points per stage; first entry = best measured config
# (RESULTS.md round-3 refresh).  With the conv fusions shrinking live
# activations, stage 7's best moved to batch 128 WITH remat (263.5 img/s,
# +86% over r2's batch-64 no-remat); stage 8 stays batch 8 no-remat,
# HBM-bound at ~86% of peak.
SWEEP = {
    1: [(512, False)],
    2: [(512, False)],
    3: [(256, False)],
    4: [(256, False)],
    5: [(128, False)],
    6: [(128, False)],
    7: [(128, True), (64, False), (32, False), (64, True)],
    8: [(8, False), (16, False), (16, True), (32, True)],
}


def main():
    enable_compilation_cache()
    gen = Generator(dtype=jnp.bfloat16)
    critic = Critic(dtype=jnp.bfloat16)
    only = os.environ.get("BENCH_ONLY")
    stages = (
        [int(s) for s in only.split(",")] if only else list(range(1, 9))
    )
    iters = int(os.environ.get("BENCH_ITERS", 10))
    for stage in stages:
        size = 4 * 2 ** (stage - 1)
        for batch, remat in SWEEP[stage]:
            config = TrainConfig(compute_dtype="bfloat16", remat=remat)
            state = create_train_state(config, gen, critic)
            step_fn = make_train_step(
                gen, critic, config, steps=stage, batch=batch, fade_in=100.0,
                critic_fade=(False,), gen_fade=False, donate=True,
            )
            real = jax.random.normal(
                jax.random.PRNGKey(0), (batch, size, size, 3)
            )
            try:
                state, m = step_fn(state, real)
                float(m["c_loss"])
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, m = step_fn(state, real)
                float(m["c_loss"])
                dt = time.perf_counter() - t0
            except Exception as e:
                print(json.dumps({
                    "stage": stage, "px": size, "batch": batch,
                    "remat": remat, "error": str(e)[:160],
                }), flush=True)
                continue
            # XLA's own per-step cost — makes the roofline verdict (MXU- vs
            # HBM-bound) reproducible from this artifact.  v5e: 197 bf16
            # TFLOPS, ~819 GB/s HBM.
            flops = bytes_acc = None
            try:
                cost = step_fn.lower(state, real).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0)) or None
                bytes_acc = float(cost.get("bytes accessed", 0)) or None
            except Exception:
                pass
            sec = dt / iters
            print(json.dumps({
                "stage": stage, "px": size, "batch": batch, "remat": remat,
                "images_per_sec": round(iters * batch / dt, 1),
                "ms_per_iter": round(sec * 1e3, 1),
                "achieved_tflops": round(flops / sec / 1e12, 1) if flops else None,
                "hbm_gbps": round(bytes_acc / sec / 1e9, 1) if bytes_acc else None,
            }), flush=True)


if __name__ == "__main__":
    main()
