"""Isolate the per-iteration host-memory leak seen in long TPU train runs.

The convergence run leaked ~66MB/iteration of HOST RSS (116GB by iter 1750)
until the machine ran out of memory.  This probes the loop's components on
the real chip, printing RSS deltas:

  A. chained steps, device-resident batch
  B. + jax.device_put(host batch) per iteration
  C. + metric deque + stacked window fetch every 10

Usage: python scripts/leak_probe.py [iters=60]
"""

from __future__ import annotations

import os
import sys


def rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return -1.0


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import collections

    import jax
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import build_models
    from byogan_tpu.train.state import create_train_state
    from byogan_tpu.train.steps import make_train_step

    config = TrainConfig(
        batch_progression=(64,) * 4, epoch_progression=(120,) * 4, seed=11
    )
    gen, critic = build_models(config)
    state = create_train_state(config, gen, critic)
    batch = 64
    step_fn = make_train_step(
        gen, critic, config, steps=4, batch=batch, fade_in=480.0,
        critic_fade=(False,), gen_fade=False,
    )
    host = np.random.default_rng(0).standard_normal(
        (batch, 32, 32, 3)
    ).astype(np.float32)

    st = state
    st, m = step_fn(st, jax.device_put(host))
    float(m["c_loss"])
    print(f"post-compile RSS {rss_mb():.0f} MB", flush=True)

    def probe(label, body):
        nonlocal st
        import gc

        gc.collect()
        r0 = rss_mb()
        body()
        gc.collect()
        r1 = rss_mb()
        print(
            f"{label}: RSS {r0:.0f} -> {r1:.0f} MB "
            f"({(r1 - r0) / iters:.1f} MB/iter)",
            flush=True,
        )

    dev = jax.device_put(host)

    def a():
        nonlocal st
        m = None
        for _ in range(iters):
            st, m = step_fn(st, dev)
        float(m["c_loss"])

    def b():
        nonlocal st
        m = None
        for _ in range(iters):
            st, m = step_fn(st, jax.device_put(host))
        float(m["c_loss"])

    def c():
        nonlocal st
        hist = collections.deque(maxlen=10)
        for i in range(1, iters + 1):
            st, m = step_fn(st, jax.device_put(host))
            hist.append(m["c_loss"])
            if i % 10 == 0:
                float(jnp.stack(list(hist)).mean())

    probe("A device-resident", a)
    probe("B + device_put/iter", b)
    probe("C + window fetch", c)


if __name__ == "__main__":
    main()
