"""Fused conv3x3+epilogue kernel vs XLA conv + lax epilogue, real TPU.

Round 2: batched-grid kernel (nb samples per program) + custom_vjp — so the
decision metric is both the forward AND the full forward+backward (the
training path, where the custom backward avoids recomputing the conv).
"""
import time

import jax
import jax.numpy as jnp

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.ops.fused import noise_lrelu_adain_lax
from byogan_tpu.ops.pallas_styleconv import (
    _pick_nb,
    styleconv,
    styleconv_pallas,
)


def lax_path(x, weight, bias, noise, nw, gamma, beta):
    out = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    out = out + bias.astype(x.dtype)
    return noise_lrelu_adain_lax(out, noise, nw, gamma, beta)


def _train_fn(op):
    """Forward+backward wrt everything a training step differentiates."""

    def loss(x, weight, bias, noise, nw, gamma, beta):
        return op(x, weight, bias, noise, nw, gamma, beta).astype(
            jnp.float32
        ).sum()

    return jax.grad(loss, argnums=(0, 1, 2, 4, 5, 6))


def bench(fn, args, iters=30):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).sum())
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(jnp.asarray(jax.tree.leaves(acc)[0]).sum())
    return (time.perf_counter() - t0) / iters


def main():
    enable_compilation_cache()
    shapes = [
        (64, 8, 8, 512, 512),
        (64, 16, 16, 512, 512),
        (64, 32, 32, 512, 256),
        (64, 32, 32, 256, 256),
        (64, 64, 64, 256, 128),
        (64, 64, 64, 128, 128),
    ]
    pl_fwd = jax.jit(styleconv_pallas)
    lax_fwd = jax.jit(lax_path)
    pl_train = jax.jit(_train_fn(styleconv))
    lax_train = jax.jit(_train_fn(lax_path))
    for n, h, w, cin, cout in shapes:
        k = jax.random.split(jax.random.PRNGKey(0), 7)
        x = jax.random.normal(k[0], (n, h, w, cin), jnp.bfloat16)
        weight = (jax.random.normal(k[1], (3, 3, cin, cout), jnp.bfloat16) * 0.05)
        bias = jax.random.normal(k[2], (cout,), jnp.float32) * 0.1
        noise = jax.random.normal(k[3], (n, h, w, 1), jnp.bfloat16)
        nw = jax.random.normal(k[4], (cout,), jnp.float32) * 0.1
        gamma = 1 + 0.1 * jax.random.normal(k[5], (n, cout), jnp.float32)
        beta = 0.1 * jax.random.normal(k[6], (n, cout), jnp.float32)
        args = (x, weight, bias, noise, nw, gamma, beta)
        nb = _pick_nb(n, h, w, cin, cout, 2, False)
        try:
            t_pl = bench(pl_fwd, args)
            t_pl_tr = bench(pl_train, args)
        except Exception as e:
            print(f"({n},{h},{w},{cin}->{cout}): pallas FAILED: {str(e)[:120]}",
                  flush=True)
            continue
        t_lax = bench(lax_fwd, args)
        t_lax_tr = bench(lax_train, args)
        tflops = 2 * n * h * w * 9 * cin * cout / 1e12
        print(
            f"({n},{h},{w},{cin}->{cout}) nb={nb}: "
            f"fwd lax {t_lax*1e6:.0f}us ({tflops/t_lax:.1f} TF) "
            f"pallas {t_pl*1e6:.0f}us ({tflops/t_pl:.1f} TF) "
            f"{t_lax/t_pl:.2f}x | train lax {t_lax_tr*1e6:.0f}us "
            f"pallas {t_pl_tr*1e6:.0f}us {t_lax_tr/t_pl_tr:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
