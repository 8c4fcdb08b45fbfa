"""Isolate the augmentation pipeline's on-chip cost (VERDICT r4 #3).

BENCH_AUG_P=0.2 measured a 31% headline regression (586.8 -> 403.4
img/s at stage 6, batch 128) with step FLOPs essentially unchanged —
the cost is memory/lowering, not arithmetic.  This microbench times
``augment_batch`` alone at the headline shape, then each transform in
isolation, to find the pathological op (suspect: the per-sample
``vmap(dynamic_slice)`` translation, which XLA lowers as a serialized
gather chain on TPU).

Run on the chip:  PYTHONPATH=. python benchmarks/bench_augment.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.ops import augment

N, H, W, C = 128, 128, 128, 3


def timeit(fn, *args, iters=50):
    out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(jnp.asarray(acc).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(1), (N, H, W, C), jnp.float32, -1, 1
    ).astype(jnp.bfloat16)

    rows = {}

    full = jax.jit(lambda k, x: augment.augment_batch(k, x, 0.2))
    rows["augment_batch_full"] = {
        "ms": round(timeit(full, key, imgs) * 1e3, 3)
    }

    # Each transform alone, via the internal pipeline pieces: rebuild
    # minimal closures matching augment_batch's per-transform code.
    def flip_only(k, x):
        gate = augment._gate(k, N, 0.2)[:, None, None, None]
        return jnp.where(gate, x[:, :, ::-1, :], x)

    def translate_only(k, x):
        n, h, w, c = x.shape
        pad = max(h // 8, 1)
        k_tg, k_ty, k_tx = jax.random.split(k, 3)
        t_on = augment._gate(k_tg, n, 0.2)
        ty = jnp.where(t_on, jax.random.randint(k_ty, (n,), -pad, pad + 1), 0)
        tx = jnp.where(t_on, jax.random.randint(k_tx, (n,), -pad, pad + 1), 0)
        padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        def shift_one(img, oy, ox):
            return jax.lax.dynamic_slice(
                img, (pad + oy, pad + ox, 0), (h, w, c)
            )

        return jax.vmap(shift_one)(padded, ty, tx)

    def translate_gather(k, x):
        n, h, w, c = x.shape
        pad = max(h // 8, 1)
        k_tg, k_ty, k_tx = jax.random.split(k, 3)
        t_on = augment._gate(k_tg, n, 0.2)
        ty = jnp.where(t_on, jax.random.randint(k_ty, (n,), -pad, pad + 1), 0)
        tx = jnp.where(t_on, jax.random.randint(k_tx, (n,), -pad, pad + 1), 0)
        padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        rows_ix = (pad + ty)[:, None] + jnp.arange(h)[None, :]  # (n, h)
        cols_ix = (pad + tx)[:, None] + jnp.arange(w)[None, :]  # (n, w)
        out = jnp.take_along_axis(
            padded, rows_ix[:, :, None, None], axis=1
        )
        return jnp.take_along_axis(out, cols_ix[:, None, :, None], axis=2)

    def brightness_contrast_saturation(k, x):
        kb, kc, ks, kg1, kg2, kg3 = jax.random.split(k, 6)
        b = jax.random.normal(kb, (N, 1, 1, 1)) * augment._BRIGHTNESS_STD
        b = jnp.where(augment._gate(kg1, N, 0.2)[:, None, None, None], b, 0.0)
        x = x + b.astype(x.dtype)
        s = jnp.exp2(jax.random.normal(kc, (N, 1, 1, 1)) * augment._CONTRAST_LOG2_STD)
        s = jnp.where(augment._gate(kg2, N, 0.2)[:, None, None, None], s, 1.0)
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        x = (x - mean) * s.astype(x.dtype) + mean
        s = jnp.exp2(jax.random.normal(ks, (N, 1, 1, 1)) * augment._SATURATION_LOG2_STD)
        s = jnp.where(augment._gate(kg3, N, 0.2)[:, None, None, None], s, 1.0)
        luma = x.mean(axis=3, keepdims=True)
        return (x - luma) * s.astype(x.dtype) + luma

    def cutout_only(k, x):
        n, h, w, c = x.shape
        half = max(h // 4, 1)
        kg, ky, kx = jax.random.split(k, 3)
        cy = jax.random.randint(ky, (n,), 0, h)[:, None, None]
        cx = jax.random.randint(kx, (n,), 0, w)[:, None, None]
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        keep = (jnp.abs(yy - cy) >= half) | (jnp.abs(xx - cx) >= half)
        keep = keep | ~augment._gate(kg, n, 0.2)[:, None, None]
        return x * keep[..., None].astype(x.dtype)

    for name, fn in [
        ("flip", flip_only),
        ("translate_vmap_dynslice", translate_only),
        ("translate_take_along_axis", translate_gather),
        ("brightness_contrast_saturation", brightness_contrast_saturation),
        ("cutout", cutout_only),
    ]:
        rows[name] = {"ms": round(timeit(jax.jit(fn), key, imgs) * 1e3, 3)}

    # Equivalence of the two translation lowerings (same keys -> same draw).
    a = jax.jit(translate_only)(key, imgs)
    b = jax.jit(translate_gather)(key, imgs)
    rows["translate_variants_equal"] = bool(jnp.array_equal(a, b))

    # The backward is where the headline cost lives: the gen phase
    # backprops THROUGH the augmentation of its own output, so each
    # transform's transpose runs once per step.  vmap(dynamic_slice)
    # transposes to per-sample dynamic_update_slice (scatter).
    def grad_of(fn):
        g = jax.grad(
            lambda x, k: jnp.sum(fn(k, x).astype(jnp.float32))
        )
        return jax.jit(lambda k, x: g(x, k))

    for name, fn in [
        ("augment_batch_full", full),
        ("translate_vmap_dynslice", translate_only),
        ("translate_take_along_axis", translate_gather),
        ("flip", flip_only),
        ("brightness_contrast_saturation", brightness_contrast_saturation),
        ("cutout", cutout_only),
    ]:
        rows[name + "_bwd"] = {
            "ms": round(timeit(grad_of(fn), key, imgs) * 1e3, 3)
        }

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
