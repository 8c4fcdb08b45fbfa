"""Fused synthesis epilogue: noise-inject -> LeakyReLU -> AdaIN.

This is the per-conv epilogue of every generator stage (reference
gan.py:89-98: inject_noise -> LeakyReLU(0.2) -> AdaIN) — the hottest
elementwise+reduction chain in the model.  Two implementations:

  * ``noise_lrelu_adain_lax`` — pure lax; XLA fuses it into the producing
    conv.  Always available, used for gradients of the epilogue-only path.
    (The TRAINING-capable Pallas fusion lives in ops/pallas_styleconv.py:
    ``styleconv`` fuses the producing conv too and carries a custom_vjp.)
  * ``noise_lrelu_adain_pallas`` — single-pass Pallas TPU kernel: one HBM
    read of the conv output, statistics in VMEM, one HBM write.  Requires
    the (H*W, C) slab of one sample to fit VMEM; the dispatcher falls back
    to lax above that.

Dispatch via ``noise_lrelu_adain(..., use_pallas=...)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """LeakyReLU(0.2) — the reference's sole activation (gan.py:86 etc)."""
    return jnp.where(x >= 0, x, negative_slope * x)


def noise_lrelu_adain_lax(
    x: jax.Array,
    noise: jax.Array,
    noise_w: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-8,
) -> jax.Array:
    """Reference-exact epilogue.  x: (N,H,W,C); noise: (N,H,W,1);
    noise_w: (C,); gamma/beta: (N,C)."""
    h = x + noise_w.astype(x.dtype) * noise.astype(x.dtype)
    h = leaky_relu(h)
    h32 = h.astype(jnp.float32)
    mean = h32.mean(axis=(1, 2), keepdims=True)
    var = jnp.square(h32 - mean).mean(axis=(1, 2), keepdims=True)
    norm = ((h32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return gamma[:, None, None, :].astype(x.dtype) * norm + beta[
        :, None, None, :
    ].astype(x.dtype)


def pallas_supported(shape, dtype) -> bool:
    """Shapes where the single-pass kernel beats XLA's fusion.

    Measured on v5e (benchmarks/bench_pallas.py, bf16):
      (64,32,32,256)  1.30x    (64,64,64,128)  1.75x
      (64,128,128,64) 0.38x    (256px+ slabs)  compile/VMEM trouble
    The per-sample whole-slab strategy wins while the (H*W, C) slab is small
    enough to live in VMEM with headroom (<= 64x64 spatial); above that XLA's
    tiled reduction is faster and the dispatcher falls back to lax.  A
    spatially-tiled two-pass kernel for big slabs is future work.
    """
    del dtype
    n, h, w, c = shape
    return h * w <= 4096 and c >= 8


def noise_lrelu_adain(
    x: jax.Array,
    noise: jax.Array,
    noise_w: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-8,
    use_pallas: bool = False,
) -> jax.Array:
    if use_pallas and pallas_supported(x.shape, x.dtype):
        from byogan_tpu.ops.pallas_adain import noise_lrelu_adain_pallas

        return noise_lrelu_adain_pallas(x, noise, noise_w, gamma, beta, eps)
    return noise_lrelu_adain_lax(x, noise, noise_w, gamma, beta, eps)
