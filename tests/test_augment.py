"""Tests for discriminator augmentation (ops/augment.py) and the ADA
controller wiring in the fused train step (opt-in extension — the reference
has no critic-input augmentation; PARITY.md "opt-in extensions")."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.ops.augment import augment_batch
from tests.conftest import build, small_config


def _imgs(n=8, hw=16, seed=0):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (n, hw, hw, 3), minval=-1.0, maxval=1.0
    )


def test_p_zero_is_identity():
    imgs = _imgs()
    out = augment_batch(jax.random.PRNGKey(1), imgs, 0.0)
    # Exact for flip/translate/cutout; contrast/saturation multiply by 1.0
    # around a subtracted mean, so identity holds to float32 rounding.
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)


def test_same_key_is_deterministic():
    imgs = _imgs()
    a = augment_batch(jax.random.PRNGKey(2), imgs, 0.7)
    b = augment_batch(jax.random.PRNGKey(2), imgs, 0.7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_p_one_transforms_and_preserves_shape_dtype():
    imgs = _imgs().astype(jnp.bfloat16)
    out = augment_batch(jax.random.PRNGKey(3), imgs, 1.0)
    assert out.shape == imgs.shape and out.dtype == imgs.dtype
    arr = np.asarray(out, np.float32)
    assert np.isfinite(arr).all()
    assert np.abs(arr - np.asarray(imgs, np.float32)).max() > 0.05
    # cutout at p=1 zeroes a half-size square in every image
    assert (np.abs(arr) < 1e-6).mean() > 0.03


def test_translation_gather_matches_slice_form():
    """The translation is lowered as take_along_axis gathers because the
    vmap(dynamic_slice) form transposes to a per-sample scatter TPU
    serializes (41.9 ms vs 2.4 ms backward at the headline shape,
    benchmarks/bench_augment.py).  Pin the gather form exactly equal to
    the naive slice form for every (ty, tx) offset combination."""
    n, h, w, c = 9, 8, 8, 2
    pad = max(h // 8, 1)
    imgs = jax.random.uniform(jax.random.PRNGKey(7), (n, h, w, c))
    ty = jnp.array([-1, -1, -1, 0, 0, 0, 1, 1, 1])
    tx = jnp.array([-1, 0, 1, -1, 0, 1, -1, 0, 1])
    padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    rows_ix = (pad + ty)[:, None] + jnp.arange(h)[None, :]
    cols_ix = (pad + tx)[:, None] + jnp.arange(w)[None, :]
    got = jnp.take_along_axis(padded, rows_ix[:, :, None, None], axis=1)
    got = jnp.take_along_axis(got, cols_ix[:, None, :, None], axis=2)

    want = jax.vmap(
        lambda img, oy, ox: jax.lax.dynamic_slice(
            img, (pad + oy, pad + ox, 0), (h, w, c)
        )
    )(padded, ty, tx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # The adjoints agree too (backward correctness of the gather form).
    def total(form, x):
        p = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        if form == "gather":
            o = jnp.take_along_axis(p, rows_ix[:, :, None, None], axis=1)
            o = jnp.take_along_axis(o, cols_ix[:, None, :, None], axis=2)
        else:
            o = jax.vmap(
                lambda img, oy, ox: jax.lax.dynamic_slice(
                    img, (pad + oy, pad + ox, 0), (h, w, c)
                )
            )(p, ty, tx)
        return jnp.sum(o * jnp.cos(o))

    g_gather = np.asarray(jax.grad(lambda x: total("gather", x))(imgs))
    g_slice = np.asarray(jax.grad(lambda x: total("slice", x))(imgs))
    np.testing.assert_allclose(g_gather, g_slice, atol=1e-6)


def test_differentiable_wrt_images():
    """Generator gradients must flow through the augmentation (the ADA
    mechanism: G is trained through D(aug(G(z))))."""
    imgs = _imgs(n=4, hw=8)

    def total(x):
        return jnp.sum(augment_batch(jax.random.PRNGKey(4), x, 0.9) ** 2)

    g = np.asarray(jax.grad(total)(imgs))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_stage1_shapes_work():
    """4px images (stage 1): translation pad and cutout still shape-legal."""
    imgs = _imgs(n=4, hw=4)
    out = augment_batch(jax.random.PRNGKey(5), imgs, 1.0)
    assert out.shape == imgs.shape
    assert np.isfinite(np.asarray(out)).all()


def _run_steps(config, n_iters=6, batch=4, steps=2, seed=9):
    from byogan_tpu.train.steps import make_train_step

    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config,
        steps=steps, batch=batch, fade_in=1e9,
        critic_fade=(True,) * config.critic_repeats, gen_fade=True,
        donate=False,
    )
    real = jax.random.uniform(
        jax.random.PRNGKey(seed), (batch, 8, 8, 3), minval=-1.0, maxval=1.0
    )
    metrics = None
    for _ in range(n_iters):
        state, metrics = step_fn(state, real)
    return state, metrics


def test_ada_controller_adapts_p():
    """With ada_target ~0 the controller must move p off its initial value
    (r_t = E[sign(D(real))] is never exactly the target), staying in [0, 1];
    aug_p and r_t are exposed in the step metrics."""
    config = small_config(ada_target=0.6, ada_speed=80, aug_p=0.5)
    state, metrics = _run_steps(config)
    p = float(state.aug_p)
    assert 0.0 <= p <= 1.0
    assert p != pytest.approx(0.5)  # moved: |adjust| = 4/80 per iteration
    assert float(metrics["aug_p"]) == pytest.approx(p)
    assert -1.0 <= float(metrics["real_sign"]) <= 1.0
    assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])


def test_fixed_aug_p_stays_constant():
    """DiffAugment mode (aug_p > 0, ada_target = 0): p is applied but never
    adapted."""
    config = small_config(aug_p=0.4)
    state, metrics = _run_steps(config)
    assert float(state.aug_p) == pytest.approx(0.4)
    assert float(metrics["aug_p"]) == pytest.approx(0.4)


def test_aug_off_carries_no_state():
    config = small_config()
    _, _, state = build(config)
    assert state.aug_p is None


def test_ada_requires_r1():
    from byogan_tpu.train.steps import make_train_step

    config = small_config(use_r1=False, ada_target=0.6)
    gen, critic, state = build(config)
    with pytest.raises(ValueError, match="ada_target"):
        make_train_step(
            gen, critic, config, steps=1, batch=4, fade_in=100.0,
            critic_fade=(True,), gen_fade=True,
        )


def test_wgan_with_fixed_aug_p_runs():
    """Fixed-probability augmentation composes with the WGAN-GP loss (only
    the ADAPTIVE controller is logistic-only)."""
    config = small_config(use_r1=False, aug_p=0.3)
    state, metrics = _run_steps(config, n_iters=2)
    assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
    assert float(state.aug_p) == pytest.approx(0.3)


@pytest.mark.slow
def test_checkpoint_roundtrip_preserves_aug_p(tmp_path):
    from byogan_tpu.train.checkpoint import (
        load_checkpoint,
        restore_train_state,
        save_checkpoint,
    )

    config = small_config(ada_target=0.6, ada_speed=80, aug_p=0.5)
    state, _ = _run_steps(config, n_iters=3)
    adapted = float(state.aug_p)
    path = save_checkpoint(str(tmp_path), state, None, name="ADA")

    # template from the same config adopts the checkpoint's adapted p
    _, _, fresh = build(config)
    restored, _ = restore_train_state(path, fresh)
    assert float(restored.aug_p) == pytest.approx(adapted)

    # augmentation-off run ignores the stored p entirely
    _, _, plain = build(small_config())
    restored_plain, _ = restore_train_state(path, plain)
    assert restored_plain.aug_p is None

    # template-free load surfaces the scalar for tooling
    loaded = load_checkpoint(path)
    assert float(np.asarray(loaded["aug_p"])) == pytest.approx(adapted)


def test_resume_from_pre_ada_checkpoint_seeds_config_p(tmp_path):
    from byogan_tpu.train.checkpoint import restore_train_state, save_checkpoint

    plain_config = small_config()
    plain_state = build(plain_config)[2]
    path = save_checkpoint(str(tmp_path), plain_state, None, name="PLAIN")

    config = small_config(ada_target=0.6, aug_p=0.25)
    _, _, template = build(config)
    restored, _ = restore_train_state(path, template)
    assert float(restored.aug_p) == pytest.approx(0.25)


def test_sharded_state_replicates_aug_p():
    from byogan_tpu.parallel.mesh import make_mesh, shard_train_state

    config = small_config(aug_p=0.5)
    _, _, state = build(config)
    mesh = make_mesh(data=len(jax.devices()))
    sharded = shard_train_state(state, mesh)
    assert sharded.aug_p.sharding.is_fully_replicated
    assert float(sharded.aug_p) == pytest.approx(0.5)


def test_full_recipe_composes_with_ada():
    """EVERY training extension stacked in ONE compiled step — lazy R1
    (lax.cond) + style mixing + remat + EMA + adaptive augmentation: finite
    losses, the penalty fires only on schedule, p adapts, EMA present."""
    config = small_config(
        r1_interval=2, style_mix_prob=1.0, remat=True, ema_beta=0.99,
        ada_target=0.6, ada_speed=80, aug_p=0.5,
    )
    from byogan_tpu.train.steps import make_train_step

    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config, steps=2, batch=4, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )
    real = jax.random.normal(jax.random.PRNGKey(11), (4, 8, 8, 3))
    penalties, ps = [], []
    for _ in range(4):
        state, metrics = step_fn(state, real)
        assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
        penalties.append(float(metrics["r1_penalty"]))
        ps.append(float(metrics["aug_p"]))
    assert penalties[0] != 0.0 and penalties[2] != 0.0
    assert penalties[1] == 0.0 and penalties[3] == 0.0
    # The controller moved p: the first post-adjust value is deterministic
    # (|adjust| = batch*repeats/ada_speed != 0; the sign can flip later, so
    # the FINAL p may legitimately land back on 0.5).
    assert ps[0] != pytest.approx(0.5)
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert state.gen_ema is not None


def test_ini_keys_parse():
    from byogan_tpu.train.config import config_from_mapping

    cfg = config_from_mapping(
        {"aug_p": "0.2", "ada_target": "0.6", "ada_speed": "100000"}
    )
    assert cfg.aug_p == pytest.approx(0.2)
    assert cfg.ada_target == pytest.approx(0.6)
    assert cfg.ada_speed == 100000
    assert cfg.use_aug
    assert not config_from_mapping({}).use_aug


def test_ada_rt_ema_smooths_controller_input():
    """The controller steers on an EMA of r_t (ada_rt_beta), which follows
    the per-iteration readings: after n iterations from rt_ema=0 the EMA
    equals the beta-weighted average of the observed per-iteration means
    (verified against a host-side replay of the recursion)."""
    config = small_config(
        ada_target=0.6, ada_speed=80, aug_p=0.5, ada_rt_beta=0.8,
        critic_repeats=2,
    )
    gen, critic, state = build(config)
    assert float(state.rt_ema) == 0.0
    from byogan_tpu.train.steps import make_train_step

    step_fn = make_train_step(
        gen, critic, config, steps=2, batch=4, fade_in=1e9,
        critic_fade=(True, True), gen_fade=True, donate=False,
    )
    real = jax.random.uniform(
        jax.random.PRNGKey(3), (4, 8, 8, 3), minval=-1.0, maxval=1.0
    )
    ema_host = 0.0
    for _ in range(5):
        state, metrics = step_fn(state, real)
        # real_sign in metrics is the LAST repeat's reading; rt_ema uses the
        # repeat average, so only check the bounds + evolution invariants.
        ema_host = float(metrics["rt_ema"])
        assert -1.0 <= ema_host <= 1.0
    assert float(state.rt_ema) == pytest.approx(ema_host)
    # EMA from 0 with beta=0.8: |rt_ema| <= (1 - 0.8^5) * max|rt| < 0.68
    assert abs(ema_host) <= 1 - 0.8 ** 5 + 1e-6


@pytest.mark.slow
def test_ada_rt_ema_checkpoint_roundtrip(tmp_path):
    """rt_ema rides checkpoints; pre-EMA ADA checkpoints (no rt_ema key)
    restore with the template's fresh 0.0."""
    from byogan_tpu.train.checkpoint import restore_train_state, save_checkpoint

    config = small_config(ada_target=0.6, ada_speed=80, aug_p=0.5)
    state, _ = _run_steps(config)
    path = save_checkpoint(str(tmp_path), state, alpha=None)
    _, _, template = build(config)
    restored, _ = restore_train_state(path, template)
    assert float(restored.rt_ema) == pytest.approx(float(state.rt_ema))
    assert float(restored.aug_p) == pytest.approx(float(state.aug_p))
