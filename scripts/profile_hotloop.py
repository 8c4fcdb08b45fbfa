"""Isolate the real-train-loop overhead vs the chained-dispatch bench.

bench.py measures chained step dispatches on a device-resident batch
(9.6ms/iter at 4px); the real loop (train/loop.py) measured ~5s/iter on the
tunneled TPU.  This script times the same stage-1 step under increasing
realism to find where the time goes:

  A. chained steps, device-resident real      (bench baseline)
  B. + fresh jax.device_put(host batch)/iter  (transfer cost)
  C. + metric append & stacked fetch every 10 (readback cost)
  D. full make_stage_loader + device_prefetch (loader path)
  E. D but a fresh loader every 4 iters       (per-epoch overhead)

Usage: python scripts/profile_hotloop.py [iters=40]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.data.pipeline import (
        StageDataset,
        device_prefetch,
        make_stage_loader,
    )
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import build_models
    from byogan_tpu.train.state import create_train_state
    from byogan_tpu.train.steps import make_train_step

    out_root = "benchmarks/convergence"
    data = os.path.join(out_root, "data")
    if not os.path.isdir(os.path.join(data, "prepared")):
        write_synthetic_dataset(data, n_images=256, size=32, seed=3)
        prepare_pyramid(data, 4, 32)

    config = TrainConfig(
        data=data,
        batch_progression=(64, 64, 64, 32),
        epoch_progression=(120, 120, 120, 120),
        seed=11,
    )
    gen, critic = build_models(config)
    state = create_train_state(config, gen, critic)
    batch = 64
    step_fn = make_train_step(
        gen, critic, config, steps=1, batch=batch, fade_in=240.0,
        critic_fade=(False,), gen_fade=False,
    )

    host_batch = np.random.default_rng(0).standard_normal(
        (batch, 4, 4, 3)
    ).astype(np.float32)

    def sync(m):
        return float(m["c_loss"])

    # warmup/compile
    st = state
    st, m = step_fn(st, jax.device_put(host_batch))
    sync(m)

    def timed(label, fn):
        nonlocal st
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s total, {dt / iters * 1000:.1f} ms/iter")

    # A: chained, device-resident
    dev_real = jax.device_put(host_batch)

    def run_a():
        nonlocal st
        m = None
        for _ in range(iters):
            st, m = step_fn(st, dev_real)
        sync(m)

    timed("A chained device-resident", run_a)

    # B: device_put per iter
    def run_b():
        nonlocal st
        m = None
        for _ in range(iters):
            st, m = step_fn(st, jax.device_put(host_batch))
        sync(m)

    timed("B + device_put/iter", run_b)

    # C: + metric history + stacked fetch every 10
    def run_c():
        nonlocal st
        hist = []
        for i in range(1, iters + 1):
            st, m = step_fn(st, jax.device_put(host_batch))
            hist.append(m["c_loss"])
            if i % 10 == 0:
                float(jnp.stack(hist[-10:]).mean())
        sync(m)

    timed("C + stacked fetch/10", run_c)

    # D: full loader path, one long epoch
    ds = StageDataset(data, 1)

    def run_d():
        nonlocal st
        loader = device_prefetch(
            make_stage_loader(ds, batch, seed=1, epochs=None)
        )
        m = None
        for i, real in enumerate(loader):
            if i >= iters:
                break
            st, m = step_fn(st, real)
        sync(m)

    timed("D full loader (streaming)", run_d)

    # E: fresh loader every 4 iters (per-epoch overhead like loop.py)
    def run_e():
        nonlocal st
        m = None
        done = 0
        while done < iters:
            loader = device_prefetch(
                make_stage_loader(ds, batch, seed=done, epochs=1)
            )
            for real in loader:
                st, m = step_fn(st, real)
                done += 1
                if done >= iters:
                    break
        sync(m)

    timed("E fresh loader per 4 iters", run_e)


if __name__ == "__main__":
    main()
