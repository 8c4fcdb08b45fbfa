"""Micro-benchmark: fused epilogue Pallas kernel vs lax path on real TPU.

Timing note (axon tunnel): all timings force a scalar readback; a ~25ms RTT
is amortized over many iterations.
"""

import time

import jax
import jax.numpy as jnp

from byogan_tpu.ops.fused import noise_lrelu_adain_lax
from byogan_tpu.ops.pallas_adain import noise_lrelu_adain_pallas


def bench(fn, args, iters=50):
    out = fn(*args)
    float(jnp.sum(out))  # compile + settle
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(jnp.sum(acc))
    return (time.perf_counter() - t0) / iters


def main():
    lax_jit = jax.jit(noise_lrelu_adain_lax)
    shapes = [
        (64, 32, 32, 256),
        (64, 64, 64, 128),
        (64, 128, 128, 64),
        (8, 256, 256, 32),
    ]
    for shape in shapes:
        n, h, w, c = shape
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.bfloat16)
        noise = jax.random.normal(key, (n, h, w, 1), jnp.bfloat16)
        nw = jnp.ones((c,), jnp.float32) * 0.1
        gamma = jnp.ones((n, c), jnp.bfloat16)
        beta = jnp.zeros((n, c), jnp.bfloat16)
        args = (x, noise, nw, gamma, beta)
        t_lax = bench(lax_jit, args)
        t_pl = bench(noise_lrelu_adain_pallas, args)
        gb = 2 * x.size * x.dtype.itemsize / 1e9
        print(
            f"{shape}: lax {t_lax*1e6:.0f}us ({gb/t_lax:.0f} GB/s) "
            f"pallas {t_pl*1e6:.0f}us ({gb/t_pl:.0f} GB/s) "
            f"speedup {t_lax/t_pl:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
