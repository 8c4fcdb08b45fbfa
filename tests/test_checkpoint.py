"""Checkpoint save/restore: exact resume, latest discovery, torch interop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.train.checkpoint import (
    checkpoint_name,
    latest_checkpoint,
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
)
from byogan_tpu.train.state import create_train_state
from tests.conftest import build, small_config


def test_save_and_exact_restore(tmp_path):
    config = small_config()
    gen, critic, state = build(config)
    state = state.replace(iters=jnp.int32(42), im_count=jnp.int32(17), stage=2, epoch=3)
    path = save_checkpoint(str(tmp_path), state, alpha=0.35)
    assert path.endswith(checkpoint_name(42))

    _, _, template = build(config)
    restored, alpha = restore_train_state(path, template)
    assert alpha == pytest.approx(0.35)
    assert int(restored.iters) == 42
    assert int(restored.im_count) == 17
    assert restored.stage == 2 and restored.epoch == 3
    for a, b in zip(
        jax.tree.leaves(state.gen_params), jax.tree.leaves(restored.gen_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored exactly (the reference drops it, SURVEY.md §5)
    for a, b in zip(
        jax.tree.leaves(state.gen_opt_state),
        jax.tree.leaves(restored.gen_opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.rng), np.asarray(restored.rng))


def test_latest_checkpoint(tmp_path):
    config = small_config()
    gen, critic, state = build(config)
    for it in (10, 200, 30):
        save_checkpoint(str(tmp_path), state.replace(iters=jnp.int32(it)), None)
    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("chk-200")
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_latest_checkpoint_prefers_final(tmp_path):
    """After a completed run, auto-resume must pick FINAL (train.py:271),
    not the last periodic chk-N — FINAL carries the latest (or equal)
    iteration count by construction."""
    config = small_config()
    gen, critic, state = build(config)
    save_checkpoint(str(tmp_path), state.replace(iters=jnp.int32(100)), 0.5)
    save_checkpoint(
        str(tmp_path), state.replace(iters=jnp.int32(100)), None, name="FINAL"
    )
    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("FINAL")
    # a periodic checkpoint NEWER than FINAL (fresh run in an old dir) wins
    save_checkpoint(str(tmp_path), state.replace(iters=jnp.int32(150)), 0.2)
    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("chk-150")


def test_alpha_none_round_trip(tmp_path):
    config = small_config()
    gen, critic, state = build(config)
    path = save_checkpoint(str(tmp_path), state, alpha=None, name="FINAL")
    loaded = load_checkpoint(path)
    assert loaded["alpha"] is None


def test_torch_checkpoint_interop(tmp_path):
    """Full-size export -> reference-format .pth -> reload round trip."""
    torch = pytest.importorskip("torch")
    from byogan_tpu.models import Critic, Generator
    from byogan_tpu.train.checkpoint import export_torch_checkpoint
    from byogan_tpu.train.config import TrainConfig

    config = TrainConfig(compute_dtype="float32")
    gen, critic = Generator(), Critic()
    state = create_train_state(config, gen, critic)
    state = state.replace(iters=jnp.int32(7), stage=2)
    pth = str(tmp_path / "chk-7.pth")
    export_torch_checkpoint(pth, state, alpha=0.5)

    save = torch.load(pth, weights_only=False)
    assert save["step"] == 2 and save["iter"] == 7 and save["alpha"] == 0.5
    assert any(k.startswith("module.") for k in save["gen"])

    loaded = load_checkpoint(pth)  # sniffs .pth file
    for a, b in zip(
        jax.tree.leaves(state.gen_params), jax.tree.leaves(loaded["gen_params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_missing_checkpoint_paths_raise_clearly(tmp_path):
    """A typo'd path must say 'checkpoint not found', not crash opening a
    byogan_meta.json that never existed (VERDICT r2 weak #3)."""
    with pytest.raises(FileNotFoundError, match="checkpoint not found"):
        load_checkpoint(str(tmp_path / "no-such-dir"))
    with pytest.raises(FileNotFoundError, match="checkpoint not found"):
        load_checkpoint(str(tmp_path / "no-such-file.pth"))
    # An existing directory that is NOT one of our checkpoints: distinct
    # message naming the missing meta file.
    (tmp_path / "random_dir").mkdir()
    with pytest.raises(FileNotFoundError, match="not a byogan_tpu checkpoint"):
        load_checkpoint(str(tmp_path / "random_dir"))


def test_prune_checkpoints_keeps_newest_and_final(tmp_path):
    """Rotation removes only the OLDEST periodic chk-* dirs: the newest
    `keep`, FINAL, and partial (meta-less) dirs all survive."""
    from byogan_tpu.train.checkpoint import prune_checkpoints

    config = small_config()
    gen, critic, state = build(config)
    for it in (10, 20, 30, 40):
        save_checkpoint(str(tmp_path), state.replace(iters=jnp.int32(it)), None)
    save_checkpoint(
        str(tmp_path), state.replace(iters=jnp.int32(40)), None, name="FINAL"
    )
    os.makedirs(tmp_path / "chk-5")  # aborted save: no meta -> untouched
    removed = prune_checkpoints(str(tmp_path), keep=2)
    assert sorted(os.path.basename(p) for p in removed) == ["chk-10", "chk-20"]
    left = sorted(e for e in os.listdir(tmp_path) if e != "chk-5")
    assert left == ["FINAL", "chk-30", "chk-40"]
    assert (tmp_path / "chk-5").exists()
    # keep=0 (the default, reference behavior) is a no-op
    assert prune_checkpoints(str(tmp_path), keep=0) == []
    # resumable: the survivor loads
    assert load_checkpoint(str(tmp_path / "chk-40"))["iter"] == 40


@pytest.mark.slow
def test_train_loop_rotates_checkpoints(tmp_path):
    """max_checkpoints=1 in the real loop: at most one periodic checkpoint
    on disk at the end, plus FINAL."""
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.train.loop import train

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_images=8, size=8, seed=0)
    prepare_pyramid(data, 4, 8)
    config = small_config(
        data=data,
        batch_progression=(4, 4),
        epoch_progression=(2, 2),
        checkpoint_step=2,
        display_step=100,
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
        max_checkpoints=1,
    )
    train(config)
    entries = sorted(os.listdir(tmp_path / "ck"))
    periodic = [e for e in entries if e.startswith("chk-")]
    assert len(periodic) == 1, entries
    assert "FINAL" in entries


def test_resume_config_guard(tmp_path):
    """Resuming with changed trajectory knobs raises; the unchanged config
    resumes exactly as before; allow_config_mismatch downgrades to warning;
    pre-guard checkpoints (no snapshot) load unchecked."""
    config = small_config(critic_repeats=2)
    gen, critic, state = build(config)
    path = save_checkpoint(
        str(tmp_path), state, alpha=0.5, train_config=config
    )

    # unchanged config: loads fine
    _, _, template = build(config)
    restored, alpha = restore_train_state(path, template, config=config)
    assert alpha == pytest.approx(0.5)

    # changed critic_repeats: the batch-exact resume position would be
    # silently wrong -> hard error naming the knob
    changed = small_config(critic_repeats=1)
    _, _, template2 = build(changed)
    with pytest.raises(ValueError, match="critic_repeats"):
        restore_train_state(path, template2, config=changed)

    # explicit override: warns and proceeds
    restored2, _ = restore_train_state(
        path, template2, config=changed, allow_config_mismatch=True
    )
    assert int(restored2.iters) == int(state.iters)

    # checkpoint without a snapshot (pre-guard format): unchecked
    old = save_checkpoint(str(tmp_path), state, alpha=None, name="old")
    restore_train_state(old, template2, config=changed)


@pytest.mark.slow
def test_train_loop_resume_guard_end_to_end(tmp_path):
    """The real train() path refuses a -c resume under a changed seed."""
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.train.loop import train

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_images=8, size=8, seed=0)
    prepare_pyramid(data, 4, 8)
    kw = dict(
        data=data,
        batch_progression=(4, 4),
        epoch_progression=(1, 1),
        checkpoint_step=100,
        display_step=100,
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
    )
    train(small_config(**kw), max_iters=2)
    ckpt = latest_checkpoint(str(tmp_path / "ck"))
    assert ckpt is not None
    with pytest.raises(ValueError, match="seed"):
        train(small_config(seed=123, **kw), checkpoint=ckpt, max_iters=3)
    # the matching config resumes, and --force-resume semantics proceed
    train(small_config(**kw), checkpoint=ckpt, max_iters=3)
    train(
        small_config(seed=123, **kw), checkpoint=ckpt, max_iters=3,
        allow_config_mismatch=True,
    )
