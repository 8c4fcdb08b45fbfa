"""Fused upsample2x->conv3x3 (subpixel phase conv) vs the unfused pair, TPU.

Measures the generator's conv1 shapes for the 128px headline configuration
(batch 128, stages 2-6 upsample before conv1) plus the 256/512px tails.
Both directions: forward only (serving) and forward+backward wrt (x, w, b)
(the training path — the fused form also shrinks the backward's reads since
the upsampled slab never exists).

Run on the chip: PYTHONPATH=. python benchmarks/bench_upconv.py
"""
import time

import jax
import jax.numpy as jnp

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.core.resize import upsample2x_bilinear
from byogan_tpu.models.layers import (
    equalized_conv_apply,
    equalized_upsample2x_conv_apply,
)

SCALE = 0.068  # sqrt(2/fan_in)-ish; constant so both paths fold identically


def unfused(x, w, b):
    return equalized_conv_apply(upsample2x_bilinear(x), w, b, SCALE, padding=1)


def fused(x, w, b):
    return equalized_upsample2x_conv_apply(x, w, b, SCALE)


def train_fn(op):
    def loss(x, w, b):
        return op(x, w, b).astype(jnp.float32).sum()

    return jax.grad(loss, argnums=(0, 1, 2))


def bench(fn, args, iters=30):
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
    # (batch, low-res H/W, cin, cout): generator conv1 shapes at the stage
    # batch sizes of bench_stages.py.
    shapes = [
        (128, 4, 512, 512),   # stage 2 @128-batch headline regime
        (128, 8, 512, 512),   # stage 3
        (128, 16, 512, 256),  # stage 4
        (128, 32, 256, 128),  # stage 5
        (128, 64, 128, 64),   # stage 6 (headline)
        (32, 128, 64, 32),    # stage 7
        (8, 256, 32, 16),     # stage 8
    ]
    f_fwd, u_fwd = jax.jit(fused), jax.jit(unfused)
    f_tr, u_tr = jax.jit(train_fn(fused)), jax.jit(train_fn(unfused))
    print(f"{'shape':>24} | {'fwd lax':>9} {'fwd fused':>9} {'x':>5} | "
          f"{'tr lax':>9} {'tr fused':>9} {'x':>5}")
    for n, h, cin, cout in shapes:
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(k[0], (n, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(k[1], (3, 3, cin, cout), jnp.float32)
        b = jax.random.normal(k[2], (cout,), jnp.float32) * 0.1
        args = (x, w, b)
        tu, tf = bench(u_fwd, args), bench(f_fwd, args)
        tut, tft = bench(u_tr, args), bench(f_tr, args)
        print(
            f"{str((n, h, h, cin)) + '->' + str(cout):>24} | "
            f"{tu * 1e6:8.0f}us {tf * 1e6:8.0f}us {tu / tf:5.2f} | "
            f"{tut * 1e6:8.0f}us {tft * 1e6:8.0f}us {tut / tft:5.2f}"
        )


if __name__ == "__main__":
    main()
