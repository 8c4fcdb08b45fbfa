"""Pallas TPU kernel: fused 3x3 conv + noise-inject + LeakyReLU + AdaIN.

The full synthesis conv of a generator stage (reference gan.py:89-98) in ONE
kernel.  Rationale (benchmarks/RESULTS.md): fusing only the epilogue loses
end-to-end because the custom-call boundary stops XLA from fusing the
epilogue into the conv — so fuse the conv itself.  Per sample:

  * the input slab (H+2, W+2, Cin) is zero-padded in VMEM;
  * the 3x3 conv runs as 9 shifted (H*W, Cin) @ (Cin, Cout) MXU matmuls
    accumulated in float32 (im2col-free);
  * bias + noise + LeakyReLU + instance-norm + style affine run on the VPU
    while the slab is still resident;
  * one HBM read of x, one HBM write of the result — XLA's lowering writes
    the conv output and re-reads it twice for the norm (4 touches).

Applicable while one sample's slabs fit VMEM (<= 64x64 spatial at these
channel widths — same regime where the epilogue kernel measured 1.3-1.75x).
Forward-only (training uses the lax path; serving/sampling kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, noise_ref, nw_ref, gamma_ref, beta_ref,
            out_ref, xpad_ref, acc_ref, *, eps):
    h, w, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = out_ref.shape[2]

    # Zero-pad the sample into scratch (H+2, W+2, Cin).
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[1 : h + 1, 1 : w + 1, :] = x_ref[0]

    # 9 shifted MXU matmuls accumulated in f32.
    acc = jnp.zeros((h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xpad_ref[dy : dy + h, dx : dx + w, :].reshape(h * w, cin)
            tap = w_ref[dy, dx]  # (Cin, Cout)
            acc += jnp.dot(patch, tap, preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    # Epilogue (all f32 in VMEM): bias + noise + lrelu + instnorm + affine.
    bias = b_ref[0].astype(jnp.float32)[None, :]
    nw = nw_ref[0].astype(jnp.float32)[None, :]
    noise = noise_ref[0].reshape(h * w, 1).astype(jnp.float32)
    hv = acc_ref[:] + bias + nw * noise
    hv = jnp.maximum(hv, 0.2 * hv)
    hw = h * w
    s1 = jnp.sum(hv, axis=0, keepdims=True)
    s2 = jnp.sum(hv * hv, axis=0, keepdims=True)
    mean = s1 / hw
    var = jnp.maximum(s2 / hw - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gamma = gamma_ref[0].astype(jnp.float32)
    beta = beta_ref[0].astype(jnp.float32)
    scale = gamma * inv
    shift = beta - scale * mean
    out_ref[0] = (scale * hv + shift).astype(out_ref.dtype)


def styleconv_supported(shape, cin: int, cout: int) -> bool:
    """One sample's padded slab + f32 accumulator must fit VMEM comfortably."""
    n, h, w, _ = shape
    pad_bytes = (h + 2) * (w + 2) * cin * 4  # scratch kept f32-ish budget
    acc_bytes = h * w * cout * 4
    return h * w <= 4096 and pad_bytes + acc_bytes <= 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("eps",))
def styleconv_pallas(
    x: jax.Array,       # (N, H, W, Cin) — post-upsample input
    weight: jax.Array,  # (3, 3, Cin, Cout) — ALREADY equalized-scaled
    bias: jax.Array,    # (Cout,)
    noise: jax.Array,   # (N, H, W, 1)
    noise_w: jax.Array, # (Cout,)
    gamma: jax.Array,   # (N, Cout)
    beta: jax.Array,    # (N, Cout)
    eps: float = 1e-8,
) -> jax.Array:
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, h * w, cout), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight (3,3,Cin,Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, Cout)
            pl.BlockSpec((1, h * w, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # noise_w (1, Cout)
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, cin), x.dtype),
            pltpu.VMEM((h * w, cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * cin * cout,
            bytes_accessed=n * h * w * (cin + cout) * x.dtype.itemsize,
            transcendentals=n * cout,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        x,
        weight,
        bias.reshape(1, cout),
        noise.reshape(n, h * w, 1),
        noise_w.reshape(1, cout),
        gamma.reshape(n, 1, cout),
        beta.reshape(n, 1, cout),
    )
    return out.reshape(n, h, w, cout)
