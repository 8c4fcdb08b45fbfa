"""Host->device batch transport: f32 lane vs uint8 device-normalize lane.

Measures the REAL-run iteration path (make_stage_loader -> device_prefetch ->
fused train step) at the big stages, where the reference-shaped f32 batch is
12-25MB per iteration and the host link (tunnel here, PCIe in production) is
the loop's transfer bound.  The uint8 lane ships 4x fewer bytes and maps to
[-1,1] inside the jitted step (train/steps.py; equal to the f32 lane to
float rounding).

Run on the chip: PYTHONPATH=. python benchmarks/bench_transport.py
Env: BENCH_T_STAGES="7,8" BENCH_T_ITERS=30
"""
import os
import time

import jax
import numpy as np

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.data.pipeline import StageDataset, device_prefetch, make_stage_loader
from byogan_tpu.data.prep import prepare_pyramid
from byogan_tpu.data.synthetic import write_synthetic_dataset
from byogan_tpu.models import Critic, Generator
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import create_train_state
from byogan_tpu.train.steps import make_train_step

# (stage, batch) — the real-run shapes of the top of the pyramid.
POINTS = {7: 32, 8: 8}


def main():
    enable_compilation_cache()
    stages = [
        int(s)
        for s in os.environ.get("BENCH_T_STAGES", "7,8").split(",")
    ]
    iters = int(os.environ.get("BENCH_T_ITERS", 30))

    root = "/tmp/bench_transport_data"
    final = 4 * 2 ** (max(stages) - 1)
    if not os.path.isdir(os.path.join(root, "prepared")):
        write_synthetic_dataset(root, n_images=64, size=final, seed=0)
        prepare_pyramid(root, 4, final)

    import jax.numpy as jnp

    gen = Generator(dtype=jnp.bfloat16)
    critic = Critic(dtype=jnp.bfloat16)
    config = TrainConfig(compute_dtype="bfloat16")

    print(f"{'stage':>5} {'batch':>5} {'MB/iter':>8} | "
          f"{'f32 img/s':>9} | {'u8 img/s':>9} | {'x':>5}")
    for stage in stages:
        batch = POINTS[stage]
        size = 4 * 2 ** (stage - 1)
        ds = StageDataset(root, stage)
        state = create_train_state(config, gen, critic)
        step_fn = make_train_step(
            gen, critic, config, steps=stage, batch=batch, fade_in=100.0,
            critic_fade=(False,), gen_fade=False, donate=False,
        )
        rates = {}
        for lane, dev_norm in (("f32", False), ("u8", True)):
            def run(n):
                loader = device_prefetch(make_stage_loader(
                    ds, batch, seed=1, epochs=None, device_normalize=dev_norm,
                ))
                st, count = state, 0
                t0 = None
                for real in loader:
                    st, m = step_fn(st, real)
                    count += 1
                    if count == 3:  # warmup/compile boundary
                        float(m["c_loss"])  # force scalar readback (tunnel)
                        t0 = time.perf_counter()
                    if count == 3 + n:
                        float(m["c_loss"])
                        return (time.perf_counter() - t0) / n
            dt = run(iters)
            rates[lane] = batch / dt
        mb = batch * size * size * 3 * 4 / 1e6
        print(f"{stage:>5} {batch:>5} {mb:>8.1f} | {rates['f32']:>9.1f} | "
              f"{rates['u8']:>9.1f} | {rates['u8'] / rates['f32']:>5.2f}")


if __name__ == "__main__":
    main()
