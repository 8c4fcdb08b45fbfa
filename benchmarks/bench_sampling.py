"""Sampling throughput: samples/sec at 512x512 (BASELINE.md second metric).

Full 8-stage generator, bf16, fresh noise per batch, jitted batched
synthesis.  BENCH_BATCH (default 32), BENCH_STAGE (default 8 = 512px),
BENCH_PALLAS=1 to route the fused epilogue through the Pallas kernel.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from byogan_tpu.core.random import synthesis_noise, truncated_noise
    from byogan_tpu.models import Generator

    batch = int(os.environ.get("BENCH_BATCH", 32))
    stage = int(os.environ.get("BENCH_STAGE", 8))
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    iters = int(os.environ.get("BENCH_STEPS", 20))
    size = 4 * 2 ** (stage - 1)

    gen = Generator(dtype=jnp.bfloat16, use_pallas=use_pallas)
    key = jax.random.PRNGKey(0)
    z = truncated_noise(key, batch, 512)
    noise = synthesis_noise(jax.random.PRNGKey(1), batch, stage)
    params = jax.jit(lambda k: gen.init(k, z, noise, steps=stage)["params"])(key)

    @jax.jit
    def sample(params, k):
        kz, kn = jax.random.split(k)
        zz = truncated_noise(kz, batch, 512, dtype=jnp.bfloat16)
        nn = synthesis_noise(kn, batch, stage, dtype=jnp.bfloat16)
        return gen.apply({"params": params}, zz, nn, steps=stage)

    out = sample(params, key)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        acc = sample(params, jax.random.fold_in(key, i))
    float(jnp.sum(acc))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"samples_per_sec_{size}px",
                "value": round(iters * batch / dt, 2),
                "unit": "samples/sec/chip",
                "pallas": use_pallas,
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
