"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from byogan_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_train_state,
    sharding_for_leaf,
    tree_shardings,
)
from byogan_tpu.train.steps import make_train_step
from tests.conftest import build, small_config


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=3)


def test_tp_sharding_rules():
    mesh = make_mesh(data=4, model=2)
    s = sharding_for_leaf("mapping/dense0/weight", (512, 512), mesh)
    assert s.spec == P(None, "model")
    s = sharding_for_leaf("stages_1/conv1/conv/weight", (3, 3, 512, 512), mesh)
    assert s.spec == P(None, None, None, "model")
    # narrow features stay replicated
    s = sharding_for_leaf("to_rgbs_0/weight", (1, 1, 512, 3), mesh)
    assert s.spec == P()
    # data-parallel-only mesh: everything replicated
    mesh1 = make_mesh(data=8, model=1)
    s = sharding_for_leaf("mapping/dense0/weight", (512, 512), mesh1)
    assert s.spec == P()


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_sharded_train_step_runs(data, model):
    """Full fused train step executes under a real mesh (DP and DP+TP)."""
    config = small_config()
    gen, critic, state = build(config)
    mesh = make_mesh(data=data, model=model)
    state = shard_train_state(state, mesh)

    batch = 8  # divisible by data axis
    step_fn = make_train_step(
        gen, critic, config,
        steps=2, batch=batch, fade_in=100.0,
        critic_fade=(True,), gen_fade=True, donate=False,
    )
    real = shard_batch(
        jnp.asarray(np.random.default_rng(0).normal(size=(batch, 8, 8, 3)),
                    jnp.float32),
        mesh,
    )
    state2, metrics = step_fn(state, real)
    assert np.isfinite(float(metrics["c_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    # params remain sharded per the rules after the update
    want = tree_shardings(state.gen_params, mesh)
    got_specs = jax.tree.map(lambda x: x.sharding.spec, state2.gen_params)
    want_specs = jax.tree.map(lambda s: s.spec, want)
    assert got_specs == want_specs


@pytest.mark.parametrize(
    "critic_fade,gen_fade", [((False,), False), ((True,), True)]
)
def test_dp_tp_matches_single_device(critic_fade, gen_fade):
    """DP=4 x TP=2 must compute the SAME losses and updated params as a
    single device — with tp_min_features lowered so the small model's
    64/32-wide weights are genuinely sharded over the model axis (a wrong
    TP resharding that perturbs values fails this test).  Covers both the
    fade and no-fade compile buckets.  EMA is enabled so the sharded
    shadow-update path is covered by the same equivalence check."""
    config = small_config(ema_beta=0.5)
    gen, critic, state = build(config)
    mesh = make_mesh(data=4, model=2)
    tp_min = 32

    batch = 8
    real = jnp.asarray(
        np.random.default_rng(2).normal(size=(batch, 8, 8, 3)), jnp.float32
    )
    step_fn = make_train_step(
        gen, critic, config,
        steps=2, batch=batch, fade_in=100.0,
        critic_fade=critic_fade, gen_fade=gen_fade, donate=False,
    )
    s_single, m_single = step_fn(state, real)

    state_sharded = shard_train_state(state, mesh, tp_min_features=tp_min)
    # the lowered threshold must actually shard something over "model"
    shardings = tree_shardings(state.gen_params, mesh, tp_min_features=tp_min)
    assert any(
        "model" in str(s.spec) for s in jax.tree.leaves(shardings)
    ), "test precondition: no TP-sharded leaves"
    s_sharded, m_sharded = step_fn(state_sharded, shard_batch(real, mesh))

    np.testing.assert_allclose(
        float(m_single["c_loss"]), float(m_sharded["c_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(m_single["g_loss"]), float(m_sharded["g_loss"]), rtol=2e-5
    )
    # Tolerance note: sharded collectives reassociate float sums, and Adam's
    # m/sqrt(v) amplifies that for near-zero second moments at step 1 —
    # observed worst case 4e-4 relative on 1/18432 elements.  A WRONG
    # resharding corrupts a large fraction of elements by O(1), far outside
    # this band.
    for net in ("gen_params", "critic_params", "gen_ema"):
        for a, b in zip(
            jax.tree.leaves(getattr(s_single, net)),
            jax.tree.leaves(getattr(s_sharded, net)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
            )


def test_dp_matches_single_device():
    """The sharded step computes the same update as the unsharded step."""
    config = small_config()
    gen, critic, state = build(config)
    mesh = make_mesh(data=8, model=1)

    batch = 8
    real = jnp.asarray(
        np.random.default_rng(1).normal(size=(batch, 4, 4, 3)), jnp.float32
    )
    step_fn = make_train_step(
        gen, critic, config,
        steps=1, batch=batch, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )
    _, m_single = step_fn(state, real)

    state_sharded = shard_train_state(state, mesh)
    _, m_sharded = step_fn(state_sharded, shard_batch(real, mesh))
    np.testing.assert_allclose(
        float(m_single["c_loss"]), float(m_sharded["c_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_single["g_loss"]), float(m_sharded["g_loss"]), rtol=1e-5
    )
