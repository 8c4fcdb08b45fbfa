"""Tests for the fused train step: both losses, fade/no-fade, state advance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.models import Critic, Generator
from byogan_tpu.train.state import make_gen_optimizer
from byogan_tpu.train.steps import make_eval_step, make_train_step
from tests.conftest import (
    SMALL_CRITIC_BLOCKS,
    SMALL_CRITIC_FROM_RGB,
    SMALL_GEN_CHANNELS,
    build,
    small_config,
    small_critic,
    small_generator,
)


@pytest.mark.parametrize("use_r1", [True, False])
@pytest.mark.parametrize("fade", [True, False])
def test_train_step_runs_and_updates(use_r1, fade):
    config = small_config(use_r1=use_r1)
    gen, critic, state = build(config)
    steps, batch = 2, 4
    step_fn = make_train_step(
        gen, critic, config,
        steps=steps, batch=batch, fade_in=100.0,
        critic_fade=(fade,), gen_fade=fade, donate=False,
    )
    real = jax.random.normal(jax.random.PRNGKey(9), (batch, 8, 8, 3))
    g0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.gen_params)

    metrics = None
    for _ in range(2):
        state, metrics = step_fn(state, real)

    assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
    assert int(state.iters) == 2
    assert int(state.im_count) == 2 * batch * config.critic_repeats
    # generator params moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.gen_params, g0
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_critic_repeats_advances_im_count():
    config = small_config(critic_repeats=3)
    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config,
        steps=1, batch=4, fade_in=50.0,
        critic_fade=(True, True, True), gen_fade=True, donate=False,
    )
    real = jnp.zeros((4, 4, 4, 3))
    state, _ = step_fn(state, real)
    assert int(state.im_count) == 12


def test_mapping_lr_group_is_smaller():
    """Mapping net must update ~100x slower than synthesis (train.py:61-64)."""
    config = small_config()
    gen, critic, state = build(config)
    tx = make_gen_optimizer(config)
    grads = jax.tree.map(jnp.ones_like, state.gen_params)
    updates, _ = tx.update(grads, state.gen_opt_state, state.gen_params)
    map_update = float(
        jnp.abs(updates["mapping"]["dense0"]["weight"]).max()
    )
    main_update = float(jnp.abs(updates["stages_0"]["conv1"]["const"]).max())
    assert map_update == pytest.approx(main_update * config.mapping_lr_mult, rel=1e-3)


def test_eval_step_shapes():
    config = small_config()
    gen, critic, state = build(config)
    eval_fn = make_eval_step(gen, config, steps=3, fade=True)
    z = jax.random.normal(jax.random.PRNGKey(0), (25, 32))
    imgs = eval_fn(state.gen_params, z, jax.random.PRNGKey(1), jnp.float32(0.5))
    assert imgs.shape == (25, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_r1_penalty_matches_torch_reference_gradients():
    """R1 critic gradients via nested vjp equal torch autograd numbers."""
    torch = pytest.importorskip("torch")
    import sys

    from tests.conftest import REFERENCE_DIR, reference_available

    if not reference_available():
        pytest.skip("reference unavailable")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import gan

    from byogan_tpu.compat.torch_ckpt import critic_params_from_torch
    from byogan_tpu.train.losses import critic_r1_loss

    torch.manual_seed(0)
    ref_critic = gan.Critic()
    params = critic_params_from_torch(ref_critic.state_dict())
    critic = Critic()

    batch, steps, lam = 4, 2, 10.0
    real_t = torch.randn(batch, 3, 8, 8, requires_grad=True)
    fake_t = torch.randn(batch, 3, 8, 8)

    # torch oracle (mirrors gan.py:393-412 math without the .backward side
    # effect)
    real_pred = ref_critic(real_t, 2, None)
    fake_pred = ref_critic(fake_t, 2, None)
    grad_real = torch.autograd.grad(real_pred.sum(), real_t, create_graph=True)[0]
    gp = (grad_real.view(batch, -1).norm(2, dim=1) ** 2).mean()
    want = (
        torch.nn.functional.softplus(-real_pred).mean()
        + torch.nn.functional.softplus(fake_pred).mean()
        + lam / 2 * gp
    ).item()

    real_j = jnp.asarray(real_t.detach().numpy().transpose(0, 2, 3, 1))
    fake_j = jnp.asarray(fake_t.numpy().transpose(0, 2, 3, 1))
    crit_fn = lambda imgs: critic.apply(  # noqa: E731
        {"params": params}, imgs, steps=2, alpha=None
    )
    got, _ = critic_r1_loss(crit_fn, real_j, fake_j, lam)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


@pytest.mark.slow
def test_donated_step_matches_undonated():
    """Buffer donation must not change results (SURVEY §5: guard donated-
    buffer reuse) — run the same sequence with and without donation."""
    config = small_config()
    gen, critic, state_a = build(config)
    _, _, state_b = build(config)  # identical init (same seed)
    real = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 3))
    kwargs = dict(steps=1, batch=4, fade_in=50.0, critic_fade=(True,), gen_fade=True)
    donated = make_train_step(gen, critic, config, donate=True, **kwargs)
    plain = make_train_step(gen, critic, config, donate=False, **kwargs)
    for _ in range(3):
        state_a, m_a = donated(state_a, real)
        state_b, m_b = plain(state_b, real)
    np.testing.assert_allclose(float(m_a["c_loss"]), float(m_b["c_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_a["g_loss"]), float(m_b["g_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.gen_params), jax.tree.leaves(state_b.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_lazy_r1_penalizes_every_nth_iteration():
    """r1_interval=N: the penalty fires only when iters % N == 0, and the
    penalized iteration is numerically identical to an eager step whose
    lambda is scaled by N (the StyleGAN2 lazy-regularization contract)."""
    n = 4
    config = small_config(r1_interval=n)
    gen, critic, state = build(config)
    kwargs = dict(steps=1, batch=4, fade_in=50.0, critic_fade=(False,),
                  gen_fade=False, donate=False)
    step_fn = make_train_step(gen, critic, config, **kwargs)
    real = jax.random.normal(jax.random.PRNGKey(7), (4, 4, 4, 3))

    # Oracle for the first (penalized) iteration: eager R1 with lambda*N.
    eager_cfg = small_config(c_lambda=config.c_lambda * n)
    _, _, state_e = build(eager_cfg)  # same seed -> identical init
    eager_fn = make_train_step(gen, critic, eager_cfg, **kwargs)
    state_e, m_e = eager_fn(state_e, real)

    penalties = []
    for i in range(2 * n):
        state, metrics = step_fn(state, real)
        assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
        penalties.append(float(metrics["r1_penalty"]))
        if i == 0:
            np.testing.assert_allclose(
                float(metrics["c_loss"]), float(m_e["c_loss"]), rtol=1e-6
            )
            for a, b in zip(
                jax.tree.leaves(state.critic_params),
                jax.tree.leaves(state_e.critic_params),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
                )
    assert penalties[0] != 0.0 and penalties[n] != 0.0
    assert all(p == 0.0 for i, p in enumerate(penalties) if i % n != 0)


@pytest.mark.slow
def test_force_lazy_matches_cond_and_deflates_flops():
    """The force_lazy FLOP-accounting hook (bench.py's honest-MFU path):
    pinning a lazy feature to a branch must reproduce the cond program's
    numerics exactly at iterations where the cond takes that branch, and
    the amortized count plain + (penalized - plain)/interval must sit
    strictly below XLA's both-branch cond count (the inflation VERDICT r4
    weak #3 is about)."""
    config = small_config(r1_interval=2, plr_weight=2.0, plr_interval=2)
    gen, critic, state = build(config)
    kwargs = dict(steps=2, batch=4, fade_in=50.0, critic_fade=(False,),
                  gen_fade=False, donate=False)
    real = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 3))

    fn_cond = make_train_step(gen, critic, config, **kwargs)
    fn_pen = make_train_step(
        gen, critic, config, **kwargs,
        force_lazy={"r1": True, "plr": True},
    )
    fn_plain = make_train_step(
        gen, critic, config, **kwargs,
        force_lazy={"r1": False, "plr": False},
    )

    def assert_same(sa, sb):
        # Tight allclose, not bitwise: the cond's out-of-line branch and
        # the inlined forced-branch program are the same math, but XLA may
        # fuse/contract differently across the cond boundary on future
        # jaxlib versions; the contract is semantic equivalence.
        for a, b in zip(
            jax.tree.leaves(sa.gen_params) + jax.tree.leaves(sa.critic_params),
            jax.tree.leaves(sb.gen_params) + jax.tree.leaves(sb.critic_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-6, atol=1e-7,
            )

    # iters=0 -> both conds take the penalized branch.
    assert_same(fn_cond(state, real)[0], fn_pen(state, real)[0])
    # iters=1 -> both conds take the plain branch.
    state1 = state.replace(iters=jnp.int32(1))
    assert_same(fn_cond(state1, real)[0], fn_plain(state1, real)[0])

    def flops(fn):
        cost = fn.lower(state, real).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])

    try:
        counted, pen, plain = flops(fn_cond), flops(fn_pen), flops(fn_plain)
    except Exception:
        pytest.skip("backend reports no cost analysis")
    assert plain < pen, "penalized branch must cost more than plain"
    amortized = plain + (pen - plain) / 2
    assert amortized < counted, (
        f"amortized {amortized} should deflate the both-branch cond count "
        f"{counted}"
    )


def test_lazy_r1_requires_use_r1():
    config = small_config(use_r1=False, r1_interval=2)
    gen, critic, state = build(config)
    with pytest.raises(ValueError, match="r1_interval"):
        make_train_step(
            gen, critic, config, steps=1, batch=4, fade_in=50.0,
            critic_fade=(False,), gen_fade=False, donate=False,
        )


def test_mixed_styles_crossover_structure():
    """mixed_styles: stage 0 is always w1; each mixed sample switches to w2
    at one stage boundary t in [1, steps) and stays there; mix_prob=0 is
    all-w1."""
    from byogan_tpu.train.steps import mixed_styles

    steps, b, d = 5, 64, 8
    w1 = jnp.zeros((b, d))
    w2 = jnp.ones((b, d))
    styles = mixed_styles(jax.random.PRNGKey(3), w1, w2, steps, 1.0)
    assert len(styles) == steps
    mat = np.stack([np.asarray(s)[:, 0] for s in styles], axis=1)  # (B, steps)
    assert (mat[:, 0] == 0).all()  # stage 0 always w1
    # monotone 0 -> 1 per sample (one crossover, never back)
    assert (np.diff(mat, axis=1) >= 0).all()
    t = mat.argmax(axis=1)  # first stage using w2 (0 if never)
    mixed = mat[:, -1] == 1
    assert mixed.all()  # mix_prob=1: every sample crosses over by the end
    assert ((t >= 1) & (t < steps)).all()
    assert len(np.unique(t)) > 1  # crossover point varies across the batch

    plain = mixed_styles(jax.random.PRNGKey(3), w1, w2, steps, 0.0)
    assert all((np.asarray(s) == 0).all() for s in plain)


def test_style_mixing_step_trains_and_moves_mapping():
    """style_mix_prob=1 runs the mixed synthesis path in both phases: losses
    finite and the mapping net still receives gradients (it is exercised
    only through map_latent in the mixed program)."""
    config = small_config(style_mix_prob=1.0)
    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config, steps=2, batch=4, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )
    real = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
    m0 = jax.tree.map(
        lambda x: np.asarray(x).copy(), state.gen_params["mapping"]
    )
    for _ in range(2):
        state, metrics = step_fn(state, real)
    assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.gen_params["mapping"], m0,
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_style_mixing_noop_at_stage1_matches_plain():
    """Stage 1 has no crossover point: with mixing enabled the emitted
    program is the untouched plain path — trajectories are bit-identical."""
    config_mix = small_config(style_mix_prob=1.0)
    config_plain = small_config()
    real = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 3))
    results = []
    for config in (config_mix, config_plain):
        gen, critic, state = build(config)
        step_fn = make_train_step(
            gen, critic, config, steps=1, batch=4, fade_in=50.0,
            critic_fade=(False,), gen_fade=False, donate=False,
        )
        state, metrics = step_fn(state, real)
        results.append((state, metrics))
    (s_a, m_a), (s_b, m_b) = results
    assert float(m_a["c_loss"]) == float(m_b["c_loss"])
    assert float(m_a["g_loss"]) == float(m_b["g_loss"])
    for a, b in zip(jax.tree.leaves(s_a.gen_params), jax.tree.leaves(s_b.gen_params)):
        assert (np.asarray(a) == np.asarray(b)).all()


@pytest.mark.slow
def test_uint8_transport_lane_matches_f32():
    """Feeding the step raw uint8 (device-side normalize) reproduces the f32
    host-normalized step to float rounding (XLA fuses the normalize into an
    FMA — a <=1-ulp input difference vs numpy's two-op rounding; measured
    c_loss delta ~1e-7 relative)."""
    config = small_config()
    real_u8 = np.asarray(
        jax.random.randint(jax.random.PRNGKey(4), (4, 8, 8, 3), 0, 256),
        np.uint8,
    )
    real_f32 = real_u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    results = []
    for real in (jnp.asarray(real_u8), jnp.asarray(real_f32)):
        gen, critic, state = build(config)
        step_fn = make_train_step(
            gen, critic, config, steps=2, batch=4, fade_in=100.0,
            critic_fade=(True,), gen_fade=True, donate=False,
        )
        state, metrics = step_fn(state, real)
        results.append((state, metrics))
    (s_a, m_a), (s_b, m_b) = results
    np.testing.assert_allclose(
        float(m_a["c_loss"]), float(m_b["c_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_a["g_loss"]), float(m_b["g_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(s_a.critic_params), jax.tree.leaves(s_b.critic_params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_lazy_r1_composes_with_style_mixing():
    """Both step extensions in ONE compiled program: the lax.cond'd lazy R1
    branches around the mixed synthesis; finite losses, penalty fires on the
    scheduled iteration only."""
    config = small_config(r1_interval=2, style_mix_prob=1.0)
    gen, critic, state = build(config)
    step_fn = make_train_step(
        gen, critic, config, steps=2, batch=4, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )
    real = jax.random.normal(jax.random.PRNGKey(6), (4, 8, 8, 3))
    penalties = []
    for _ in range(4):
        state, metrics = step_fn(state, real)
        assert np.isfinite(metrics["c_loss"]) and np.isfinite(metrics["g_loss"])
        penalties.append(float(metrics["r1_penalty"]))
    assert penalties[0] != 0.0 and penalties[2] != 0.0
    assert penalties[1] == 0.0 and penalties[3] == 0.0


@pytest.mark.parametrize("mix", [0.0, 1.0])
@pytest.mark.slow
def test_remat_matches_no_remat(mix):
    """jax.checkpoint is semantics-preserving: the remat step equals the
    plain step (same seed, same batch) — with and without style mixing
    closed over the rematerialized apply."""
    real = jax.random.normal(jax.random.PRNGKey(8), (4, 8, 8, 3))
    results = []
    for remat in (False, True):
        config = small_config(remat=remat, style_mix_prob=mix)
        gen, critic, state = build(config)
        step_fn = make_train_step(
            gen, critic, config, steps=2, batch=4, fade_in=100.0,
            critic_fade=(True,), gen_fade=True, donate=False,
        )
        state, metrics = step_fn(state, real)
        results.append((state, metrics))
    (s_a, m_a), (s_b, m_b) = results
    np.testing.assert_allclose(
        float(m_a["c_loss"]), float(m_b["c_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_a["g_loss"]), float(m_b["g_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(s_a.gen_params), jax.tree.leaves(s_b.gen_params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.slow
def test_per_stage_remat_selects_by_stage():
    """remat_progression picks the stage's flag: the stage-2 step built with
    (False, True) remat equals the globally-remat'd stage-2 step bitwise-
    equivalently (remat is semantics-preserving, so equality to the plain
    step is the observable; here we just assert both variants run and agree)."""
    real = jax.random.normal(jax.random.PRNGKey(12), (4, 8, 8, 3))
    results = []
    for kw in (dict(remat=True), dict(remat_progression=(False, True, False))):
        config = small_config(**kw)
        gen, critic, state = build(config)
        step_fn = make_train_step(
            gen, critic, config, steps=2, batch=4, fade_in=100.0,
            critic_fade=(False,), gen_fade=False, donate=False,
        )
        state, metrics = step_fn(state, real)
        results.append((state, metrics))
    (s_a, m_a), (s_b, m_b) = results
    np.testing.assert_allclose(
        float(m_a["c_loss"]), float(m_b["c_loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(s_a.gen_params), jax.tree.leaves(s_b.gen_params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
