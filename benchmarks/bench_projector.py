"""Projector throughput on the chip: single-program scan vs per-iteration
dispatch.

Quantifies the design claim in projector.py — that folding the whole Adam
loop into one ``lax.scan`` program matters on the tunneled TPU — by timing
the same optimization (identical math, identical iteration count) two ways:

  * scan:     ONE jitted call containing all n_iters steps;
  * dispatch: a jitted single-step called n_iters times from the host
              (the conventional PyTorch-style projector loop).

Timing via scalar readback (block_until_ready does not wait on the
tunneled backend — CLAUDE.md).

Usage: python benchmarks/bench_projector.py [n_iters] [batch] [steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import optax

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.core.random import synthesis_noise
from byogan_tpu.models import Generator
from byogan_tpu.projector import _pyramid_loss, project
from byogan_tpu.eval.swd import laplacian_pyramid


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 6  # 128px
    enable_compilation_cache()

    gen = Generator()
    z = jax.random.normal(jax.random.PRNGKey(0), (batch, 512))
    noise = synthesis_noise(jax.random.PRNGKey(1), batch, steps)
    params = {
        "params": gen.init(jax.random.PRNGKey(2), z, noise, steps=steps)[
            "params"
        ]
    }
    target = jnp.asarray(
        gen.apply(params, z, noise, steps=steps), jnp.float32
    )

    # --- scan variant (the shipped projector) ---
    t0 = time.perf_counter()
    result = project(
        gen, params, target, steps=steps, z_dim=512, n_iters=n_iters
    )
    first = float(result.losses[-1])  # readback = sync
    compile_plus_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    result = project(
        gen, params, target, steps=steps, z_dim=512, n_iters=n_iters,
        noise_seed=0,
    )
    _ = float(result.losses[-1])
    scan_s = time.perf_counter() - t0

    # --- per-iteration dispatch variant (identical math) ---
    tx = optax.adam(0.05)
    target_levels = laplacian_pyramid(target, min_size=8)

    def loss_fn(w):
        img = gen.apply(
            params, None, noise, steps=steps, style=w
        ).astype(jnp.float32)
        return _pyramid_loss(img, target, target_levels)

    @jax.jit
    def one_step(w, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(w)
        updates, opt_state = tx.update(grads, opt_state, w)
        return optax.apply_updates(w, updates), opt_state, loss

    from byogan_tpu.projector import mean_w

    w = jnp.broadcast_to(
        mean_w(gen, params, 512), (batch, 512)
    ).astype(jnp.float32)
    opt_state = tx.init(w)
    w, opt_state, loss = one_step(w, opt_state)  # compile
    _ = float(loss)
    t0 = time.perf_counter()
    for _i in range(n_iters):
        w, opt_state, loss = one_step(w, opt_state)
    _ = float(loss)  # sync once at the end (flatters the dispatch variant:
    # a real loop reading losses per-iteration pays ~25ms RTT each)
    dispatch_s = time.perf_counter() - t0

    px = 4 * 2 ** (steps - 1)
    print(
        f"projector {batch}x{px}px, {n_iters} iters: "
        f"scan {scan_s:.2f}s ({n_iters / scan_s:.0f} it/s), "
        f"per-iter dispatch {dispatch_s:.2f}s "
        f"({n_iters / dispatch_s:.0f} it/s), "
        f"speedup {dispatch_s / scan_s:.2f}x "
        f"(scan compile+run first call: {compile_plus_run:.1f}s, "
        f"final loss {first:.4f})"
    )


if __name__ == "__main__":
    main()
