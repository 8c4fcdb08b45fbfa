"""Pallas kernel correctness vs the lax reference path (interpret mode on
CPU; the same kernels compile natively on TPU — exercised by bench/serving).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.ops.fused import noise_lrelu_adain_lax, pallas_supported


def _pallas_interpret(x, noise, w, gamma, beta, eps=1e-8):
    """Run the TPU kernel in interpreter mode (no TPU needed)."""
    from byogan_tpu.ops import pallas_adain as pa
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, wd, c = x.shape
    hw = h * wd
    out = pl.pallas_call(
        functools.partial(pa._kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hw, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec(),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        interpret=True,
    )(x.reshape(n, hw, c), noise.reshape(n, hw, 1), w.reshape(1, c),
      gamma.reshape(n, 1, c), beta.reshape(n, 1, c))
    return out.reshape(n, h, wd, c)


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (3, 4, 4, 32)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_adain_kernel_matches_lax(shape, dtype):
    n, h, w, c = shape
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.normal(k1, shape, dtype)
    noise = jax.random.normal(k2, (n, h, w, 1), dtype)
    nw = jax.random.normal(k3, (c,), jnp.float32) * 0.1
    gamma = 1.0 + 0.1 * jax.random.normal(k4, (n, c), jnp.float32)
    beta = 0.1 * jax.random.normal(k5, (n, c), jnp.float32)

    want = noise_lrelu_adain_lax(x, noise, nw, gamma.astype(dtype), beta.astype(dtype))
    got = _pallas_interpret(x, noise, nw, gamma.astype(dtype), beta.astype(dtype))
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )


def test_pallas_supported_gate():
    assert pallas_supported((4, 64, 64, 128), jnp.bfloat16)
    assert pallas_supported((64, 32, 32, 256), jnp.bfloat16)
    # measured-loss / VMEM-trouble shapes fall back to lax
    assert not pallas_supported((64, 128, 128, 64), jnp.bfloat16)
    assert not pallas_supported((1, 512, 512, 16), jnp.float32)


def test_generator_with_pallas_flag_matches(monkeypatch):
    """use_pallas=True generator output == lax generator (interpret mode)."""
    from byogan_tpu.ops import fused
    from byogan_tpu.core.random import synthesis_noise, truncated_noise
    from byogan_tpu.models import Generator

    # route the pallas dispatch through interpret mode on CPU
    def fake_pallas(x, noise, w, gamma, beta, eps=1e-8):
        return _pallas_interpret(x, noise, w, gamma, beta, eps)

    import byogan_tpu.ops.pallas_adain as pa
    from byogan_tpu.ops import pallas_styleconv as sc

    monkeypatch.setattr(pa, "noise_lrelu_adain_pallas", fake_pallas)
    monkeypatch.setattr(sc, "_INTERPRET", True)  # fused conv path, stage 2

    channels = ((32, 32), (32, 16))
    key = jax.random.PRNGKey(1)
    z = truncated_noise(key, 2, 16)
    noise = synthesis_noise(key, 2, 2)
    gen_lax = Generator(channels=channels, style_dim=16, mapping_depth=2)
    gen_pl = Generator(
        channels=channels, style_dim=16, mapping_depth=2, use_pallas=True
    )
    params = gen_lax.init(key, z, noise, steps=2)
    a = gen_lax.apply(params, z, noise, steps=2)
    b = gen_pl.apply(params, z, noise, steps=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def _styleconv_inputs(n=4, h=8, w=8, cin=16, cout=24, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    return dict(
        x=jax.random.normal(ks[0], (n, h, w, cin)),
        weight=jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.1,
        bias=jax.random.normal(ks[2], (cout,)) * 0.1,
        noise=jax.random.normal(ks[3], (n, h, w, 1)),
        noise_w=jax.random.normal(ks[4], (cout,)) * 0.1,
        gamma=1 + 0.1 * jax.random.normal(ks[5], (n, cout)),
        beta=0.1 * jax.random.normal(ks[6], (n, cout)),
    )


def _styleconv_lax(x, weight, bias, noise, noise_w, gamma, beta):
    conv = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return noise_lrelu_adain_lax(conv + bias, noise, noise_w, gamma, beta)


def test_styleconv_kernel_matches_lax_composition(monkeypatch):
    """Batched-grid fused conv3x3+epilogue vs conv + lax epilogue, through
    the module's own dispatch (interpret mode; nb>1 exercises batching)."""
    from byogan_tpu.ops import pallas_styleconv as sc

    monkeypatch.setattr(sc, "_INTERPRET", True)
    ins = _styleconv_inputs()
    want = _styleconv_lax(**ins)
    got = sc.styleconv_pallas(**ins)
    # precondition: the picked block really batches multiple samples
    assert sc._pick_nb(4, 8, 8, 16, 24, 4, False) > 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_styleconv_custom_vjp_matches_lax_grads(monkeypatch):
    """The custom_vjp backward (closed-form from kernel residuals) equals
    jax.grad of the lax composition for EVERY argument."""
    from byogan_tpu.ops import pallas_styleconv as sc

    monkeypatch.setattr(sc, "_INTERPRET", True)
    ins = _styleconv_inputs(seed=2)
    args = tuple(
        ins[k]
        for k in ("x", "weight", "bias", "noise", "noise_w", "gamma", "beta")
    )

    def loss_lax(*a):
        out = _styleconv_lax(*a)
        return (out * jnp.cos(out)).sum()  # nontrivial cotangent

    def loss_pl(*a):
        out = sc.styleconv(*a)
        return (out * jnp.cos(out)).sum()

    want = jax.grad(loss_lax, argnums=tuple(range(7)))(*args)
    got = jax.grad(loss_pl, argnums=tuple(range(7)))(*args)
    for name, w_, g_ in zip(
        ("x", "weight", "bias", "noise", "noise_w", "gamma", "beta"),
        want, got,
    ):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w_), atol=2e-4, rtol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )
