"""Pallas TPU kernel: fused 3x3 conv + noise-inject + LeakyReLU + AdaIN.

The full synthesis conv of a generator stage (reference gan.py:89-98) in ONE
kernel.  Rationale (benchmarks/RESULTS.md): fusing only the epilogue loses
end-to-end because the custom-call boundary stops XLA from fusing the
epilogue into the conv — so fuse the conv itself.

Round-2 design (the round-1 kernel was one-sample-per-program and lost on
most shapes because M = H*W rows starved the MXU at small resolutions):

  * **batched grid**: each program processes ``nb`` samples; the 3x3 conv
    runs as 9 shifted ``(nb*H*W, Cin) @ (Cin, Cout)`` MXU matmuls accumulated
    in float32 — M scales with nb, so 8x8 stages feed the systolic array
    2048 rows instead of 64.  ``nb`` is chosen per shape to keep resident
    VMEM under budget (``_pick_nb``).
  * bias + noise + LeakyReLU + per-sample instance-norm + style affine run
    on the VPU while the slab is resident: one HBM read of x, one write of
    the result.
  * **training-capable**: ``styleconv`` is a ``jax.custom_vjp`` — the
    forward is this kernel (emitting the pre-norm activations + per-sample
    mean/inv as residuals), the backward is closed-form lax (instance-norm
    backward + XLA's own transposed convs via ``jax.vjp`` of the conv), so
    no forward recompute is needed.

Gating stays measurement-driven: ``styleconv_supported`` limits to shapes
where the slab strategy fits VMEM; callers flip it on only where the bench
shows a win (benchmarks/bench_styleconv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024

# Tests flip this to run the identical dispatch path through the Pallas
# interpreter on CPU (tests/test_pallas_ops.py).
_INTERPRET = False


def _kernel(x_ref, w_ref, b_ref, noise_ref, nw_ref, gamma_ref, beta_ref,
            *refs, eps, nb, emit_hv):
    if emit_hv:
        out_ref, hv_ref, xpad_ref = refs
    else:
        (out_ref, xpad_ref) = refs
    h = x_ref.shape[1]
    w = x_ref.shape[2]
    cin = x_ref.shape[3]
    cout = out_ref.shape[2]
    hw = h * w

    # Zero-pad each sample into scratch (nb, H+2, W+2, Cin).
    xpad_ref[:] = jnp.zeros_like(xpad_ref)
    xpad_ref[:, 1 : h + 1, 1 : w + 1, :] = x_ref[:]

    # 9 shifted MXU matmuls accumulated in f32; M = nb*H*W.
    acc = jnp.zeros((nb * hw, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xpad_ref[:, dy : dy + h, dx : dx + w, :].reshape(
                nb * hw, cin
            )
            acc += jnp.dot(
                patch, w_ref[dy, dx], preferred_element_type=jnp.float32
            )

    # Epilogue (f32 in VMEM): bias + noise + lrelu + per-sample instnorm +
    # style affine.
    bias = b_ref[0].astype(jnp.float32)[None, :]
    nw = nw_ref[0].astype(jnp.float32)[None, :]
    noise = noise_ref[:].reshape(nb * hw, 1).astype(jnp.float32)
    hv = acc + bias + nw * noise
    hv = jnp.maximum(hv, 0.2 * hv)
    hv3 = hv.reshape(nb, hw, cout)
    mean = hv3.sum(axis=1) / hw                      # (nb, Cout)
    var = jnp.maximum((hv3 * hv3).sum(axis=1) / hw - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                   # (nb, Cout)
    gamma = gamma_ref[:, 0].astype(jnp.float32)      # (nb, Cout)
    beta = beta_ref[:, 0].astype(jnp.float32)
    scale = gamma * inv
    shift = beta - scale * mean
    out = scale[:, None, :] * hv3 + shift[:, None, :]
    out_ref[:] = out.astype(out_ref.dtype)
    if emit_hv:
        # Residual for the custom_vjp backward.  mean/inv are deliberately
        # NOT emitted: (nb, Cout) output blocks violate Mosaic's 8-sublane
        # rule when nb < 8, and the backward recomputes them from hv in two
        # cheap f32 reductions anyway.
        hv_ref[:] = hv3.astype(hv_ref.dtype)


def _pick_nb(n: int, h: int, w: int, cin: int, cout: int, itemsize: int,
             emit_hv: bool) -> int:
    """Largest power-of-2 samples-per-program under the VMEM budget.

    Targets MXU-efficient M = nb*H*W while keeping x block + padded scratch
    + f32 accumulator + outputs resident.
    """
    hw = h * w
    weights = 9 * cin * cout * itemsize
    best = 0
    nb = 1
    while nb <= n:
        if n % nb == 0:
            per = nb * (
                (h + 2) * (w + 2) * cin * itemsize   # padded scratch
                + hw * cin * itemsize                # x block
                + hw * cout * 4                      # f32 accumulator value
                + hw * cout * itemsize * (2 if emit_hv else 1)  # out (+hv)
                + hw * itemsize                      # noise
            )
            if weights + per <= _VMEM_BUDGET:
                best = nb
            elif best:
                break
        nb *= 2
    return best


def styleconv_supported(shape, cin: int, cout: int,
                        itemsize: int = 2, for_training: bool = False) -> bool:
    """True when at least one sample fits the slab strategy's VMEM budget."""
    n, h, w, _ = shape
    return _pick_nb(n, h, w, cin, cout, itemsize, for_training) >= 1


def styleconv_profitable(shape, cin: int, cout: int,
                         for_training: bool = False) -> bool:
    """Measured dispatch gate (v5e, benchmarks/styleconv_r2 in RESULTS.md).

    Training (fwd+bwd): the kernel never beats XLA (0.76-1.00x across all six
    model shapes) — always False.  Forward-only: wins at 8x8 (1.10x, nb=16)
    and 64x64 (1.15-1.20x); 16x16/32x32 are parity-to-slightly-negative, so
    they stay on the lax path.
    """
    if for_training:
        return False
    _, h, w, _ = shape
    hw = h * w
    return hw <= 64 or hw >= 4096


def _call_kernel(x, weight, bias, noise, noise_w, gamma, beta, eps, emit_hv):
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    hw = h * w
    nb = _pick_nb(n, h, w, cin, cout, x.dtype.itemsize, emit_hv)
    if nb < 1:
        raise ValueError(f"styleconv_pallas: shape {x.shape} exceeds VMEM")
    out_shapes = [jax.ShapeDtypeStruct((n, hw, cout), x.dtype)]
    out_specs = [
        pl.BlockSpec((nb, hw, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if emit_hv:
        out_shapes += [
            jax.ShapeDtypeStruct((n, hw, cout), x.dtype),
        ]
        out_specs += [
            pl.BlockSpec((nb, hw, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    res = pl.pallas_call(
        functools.partial(_kernel, eps=eps, nb=nb, emit_hv=emit_hv),
        out_shape=out_shapes,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight (3,3,Cin,Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, Cout)
            pl.BlockSpec((nb, hw, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # noise_w (1, Cout)
            pl.BlockSpec((nb, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((nb, h + 2, w + 2, cin), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hw * 9 * cin * cout,
            bytes_accessed=n * hw * (cin + cout) * x.dtype.itemsize,
            transcendentals=n * cout,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(
        x,
        weight,
        bias.reshape(1, cout),
        noise.reshape(n, hw, 1),
        noise_w.reshape(1, cout),
        gamma.reshape(n, 1, cout),
        beta.reshape(n, 1, cout),
    )
    return res


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
    """Inference-path fused styleconv (single output).  Callers are expected
    to be inside jit (the model apply always is)."""
    n, h, w, _ = x.shape
    (out,) = _call_kernel(
        x, weight, bias, noise, noise_w, gamma, beta, eps, emit_hv=False
    )
    return out.reshape(n, h, w, weight.shape[-1])


# ---------------------------------------------------------------------------
# Training path: custom_vjp with a closed-form lax backward (no recompute).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def styleconv(x, weight, bias, noise, noise_w, gamma, beta, eps=1e-8):
    """Differentiable fused styleconv.  Same contract as styleconv_pallas."""
    return styleconv_pallas(x, weight, bias, noise, noise_w, gamma, beta,
                            eps=eps)


def _styleconv_fwd(x, weight, bias, noise, noise_w, gamma, beta, eps):
    n, h, w, _ = x.shape
    cout = weight.shape[-1]
    out, hv = _call_kernel(
        x, weight, bias, noise, noise_w, gamma, beta, eps, emit_hv=True
    )
    res = (x, weight, noise, noise_w, gamma, hv)
    return out.reshape(n, h, w, cout), res


def _styleconv_bwd(eps, res, dy):
    """Closed-form backward from saved residuals.

    Instance-norm backward + LeakyReLU mask recovered from the sign of the
    saved pre-norm activations (LeakyReLU preserves sign), then XLA's own
    transposed convolutions via jax.vjp of the linear conv (the primal
    output is dead code and DCE'd).  The per-sample mean/inv are recomputed
    from the saved hv (two f32 reductions) rather than emitted by the kernel.
    """
    x, weight, noise, noise_w, gamma, hv = res
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    hw = h * w

    dy3 = dy.reshape(n, hw, cout).astype(jnp.float32)
    hv3 = hv.astype(jnp.float32)                      # (n, hw, cout)
    mean = hv3.mean(axis=1)                           # (n, cout)
    var = jnp.maximum((hv3 * hv3).mean(axis=1) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    hhat = (hv3 - mean[:, None, :]) * inv[:, None, :]

    dgamma = (dy3 * hhat).sum(axis=1).astype(gamma.dtype)   # (n, cout)
    dbeta = dy3.sum(axis=1).astype(gamma.dtype)

    g32 = gamma.astype(jnp.float32)
    dyg = dy3 * g32[:, None, :]
    dhv = inv[:, None, :] * (
        dyg
        - dyg.mean(axis=1, keepdims=True)
        - hhat * (dyg * hhat).mean(axis=1, keepdims=True)
    )
    dpre = jnp.where(hv3 >= 0, dhv, 0.2 * dhv)        # (n, hw, cout) f32

    dbias = dpre.sum(axis=(0, 1)).astype(noise_w.dtype)
    noise_flat = noise.reshape(n, hw, 1).astype(jnp.float32)
    dnoise_w = (dpre * noise_flat).sum(axis=(0, 1)).astype(noise_w.dtype)
    dnoise = (
        (dpre * noise_w.astype(jnp.float32)[None, None, :]).sum(
            axis=2, keepdims=True
        )
    ).reshape(n, h, w, 1).astype(noise.dtype)

    dpre_img = dpre.reshape(n, h, w, cout).astype(x.dtype)

    def conv_only(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=xx.dtype,
        )

    _, conv_vjp = jax.vjp(conv_only, x, weight)
    dx, dweight = conv_vjp(dpre_img)
    return dx, dweight, dbias, dnoise, dnoise_w, dgamma, dbeta


styleconv.defvjp(_styleconv_fwd, _styleconv_bwd)
