"""Pallas TPU kernel: fused noise-inject + LeakyReLU + instance-norm affine.

One grid program per batch sample.  The sample's (H*W, C) slab is staged in
VMEM once; the VPU does noise-add + LeakyReLU, computes the per-channel
mean/variance over the spatial axis in float32, and applies
``gamma * (h - mu) * rsqrt(var + eps) + beta`` — a single HBM read and a
single HBM write instead of the read-reduce-read-write pattern a
non-fused lowering would take (BASELINE.json north-star kernel).

Gradients: forward-only — the training path uses the lax epilogue (see
ops/fused.py); this kernel serves inference/serving and as the template for
the custom-VJP training kernel (future round).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, noise_ref, w_ref, gamma_ref, beta_ref, out_ref, *, eps):
    # Blocks (one grid program per sample): x (1, HW, C), noise (1, HW, 1),
    # w (1, C) full array, gamma/beta (1, 1, C) — per-sample rows arrive as
    # their own blocks because Mosaic requires sublane indices to be
    # 8-aligned, which a dynamic gamma_ref[i] row read cannot prove.
    x = x_ref[0]  # (HW, C)
    noise = noise_ref[0]  # (HW, 1)
    w = w_ref[0]  # (C,)
    h = x + w[None, :].astype(x.dtype) * noise.astype(x.dtype)
    # LeakyReLU(0.2) as max(h, 0.2h) — identical for slope < 1, and avoids a
    # bf16 compare Mosaic's VPU lowering rejects.
    h = jnp.maximum(h, jnp.asarray(0.2, h.dtype) * h)
    # One-pass statistics (sum / sum-of-squares) and a single fused affine:
    #   out = (gamma*inv) * h + (beta - gamma*inv*mean)
    # keeps VMEM to {x, h, out} + (1,C) rows — a centered-buffer formulation
    # blows the scoped-vmem budget at 128px slabs.
    h32 = h.astype(jnp.float32)
    hw = h32.shape[0]
    s1 = jnp.sum(h32, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(h32 * h32, axis=0, keepdims=True)
    mean = s1 / hw
    var = jnp.maximum(s2 / hw - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gamma = gamma_ref[0].astype(jnp.float32)  # (1, C)
    beta = beta_ref[0].astype(jnp.float32)  # (1, C)
    scale = gamma * inv
    shift = beta - scale * mean
    out_ref[0] = (scale * h32 + shift).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def noise_lrelu_adain_pallas(
    x: jax.Array,
    noise: jax.Array,
    noise_w: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-8,
) -> jax.Array:
    """x: (N,H,W,C); noise: (N,H,W,1); noise_w: (C,); gamma/beta: (N,C)."""
    n, h, w, c = x.shape
    hw = h * w
    x2 = x.reshape(n, hw, c)
    noise2 = noise.reshape(n, hw, 1)
    w2 = noise_w.reshape(1, c)
    gamma3 = gamma.reshape(n, 1, c)
    beta3 = beta.reshape(n, 1, c)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w: full (1, C)
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=9 * n * hw * c,
            bytes_accessed=2 * n * hw * c * x.dtype.itemsize,
            transcendentals=n * c,  # rsqrt
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x2, noise2, w2, gamma3, beta3)
    return out.reshape(n, h, w, c)
