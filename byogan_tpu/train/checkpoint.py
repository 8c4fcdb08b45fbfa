"""Atomic checkpoint save/restore with reference-compatible logical fields.

The reference saves ``{gen, critic, iter, im_count, step, epoch, alpha}``
(train.py:248-259) and loses optimizer state, RNG state, and intra-stage
alpha on resume (train.py:90-108 — SURVEY.md §5 lists these as gaps to fix,
not replicate).  Our native format is an orbax directory per checkpoint
carrying the FULL TrainState (params, optimizer states, PRNG key, counters)
so resume is exact; the reference's logical fields are stored alongside in
``meta`` for CLI parity (generate_samples.py:50-57 reads ``step``/``alpha``).

Interop:
  * ``load_checkpoint`` accepts either our orbax directory or a reference
    ``.pth`` (sniffed by extension/type), so users can resume from torch
    checkpoints directly.
  * ``export_torch_checkpoint`` writes a real ``.pth`` the reference CLIs can
    load (module.-prefixed DataParallel keys).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

from byogan_tpu.train.state import TrainState

_META_NAME = "byogan_meta.json"
_ORBAX_CKPT = None

#: Config knobs that determine the training TRAJECTORY — the batch-exact
#: resume reconstructs the epoch/batch position and RNG stream from these
#: (loop.py derives iters_done from im_count // (batch * critic_repeats));
#: resuming under a different value of any of them silently lands on the
#: wrong batch / a misaligned RNG stream instead of erroring.  Recorded in
#: byogan_meta.json at save time and validated on restore.  The reference
#: has the same hole (train.py:90-100) — ours must not.
_TRAJECTORY_KEYS = (
    "batch_progression",
    "epoch_progression",
    "critic_repeats",
    "fade_percentage",
    "seed",
    "noise_trunc",
    "use_r1",
    "r1_interval",
    "style_mix_prob",
    "aug_p",
    "ada_target",
    "ada_speed",
    "plr_weight",
    "plr_interval",
    "compute_dtype",
)


def trajectory_snapshot(config) -> Dict[str, Any]:
    """JSON-safe snapshot of the trajectory-affecting config knobs."""
    snap = {}
    for key in _TRAJECTORY_KEYS:
        value = getattr(config, key)
        snap[key] = list(value) if isinstance(value, tuple) else value
    return snap


def check_resume_config(
    meta: Dict[str, Any], config, allow_mismatch: bool = False
) -> None:
    """Error (or warn, with ``allow_mismatch``) when the resuming config's
    trajectory knobs differ from the ones the checkpoint was trained with.

    Checkpoints written before this guard carry no snapshot — those load
    unchecked (there is nothing to compare against).
    """
    saved = meta.get("train_config")
    if saved is None or config is None:
        return
    current = trajectory_snapshot(config)
    mismatched = [
        f"  {k}: checkpoint={saved[k]!r} vs config={current[k]!r}"
        for k in _TRAJECTORY_KEYS
        if k in saved and saved[k] != current[k]
    ]
    if not mismatched:
        return
    detail = (
        "resume config mismatch — these knobs steer the batch-exact resume "
        "position and RNG stream, so the resumed trajectory would silently "
        "diverge:\n" + "\n".join(mismatched)
    )
    if allow_mismatch:
        print(f"WARNING: {detail}\n(continuing: mismatch explicitly allowed)")
        return
    raise ValueError(
        detail + "\n(resume with the original config, or pass "
        "--force-resume / allow_config_mismatch=True to accept a divergent "
        "trajectory)"
    )


def _checkpointer():
    global _ORBAX_CKPT
    if _ORBAX_CKPT is None:
        import orbax.checkpoint as ocp

        _ORBAX_CKPT = ocp.PyTreeCheckpointer()
    return _ORBAX_CKPT


def checkpoint_name(iters: int) -> str:
    """Reference naming: ``chk-{iters}`` (train.py:258)."""
    return f"chk-{iters}"


def save_checkpoint(
    directory: str,
    state: TrainState,
    alpha: Optional[float],
    name: Optional[str] = None,
    model_spec=None,
    train_config=None,
) -> str:
    """Atomically save the full TrainState + reference-compatible meta.

    ``alpha`` is the reference's saved fade value (None once past fade —
    train.py:256, train.py:271 saves None at FINAL).

    Multi-host: EVERY process must call this together (train/loop.py does —
    the call sites are deliberately NOT process-gated).  orbax coordinates
    the write (each process persists only the shards it can address; with
    our replicated/DP params the primary writes once), and process 0 alone
    writes the meta json; a cross-process barrier after the meta guarantees
    no process races ahead of a complete checkpoint (e.g. into
    prune_checkpoints or a final exit).
    """
    os.makedirs(directory, exist_ok=True)
    name = name or checkpoint_name(int(state.iters))
    path = os.path.abspath(os.path.join(directory, name))
    multiprocess = jax.process_count() > 1
    is_primary = jax.process_index() == 0
    tree = {
        "gen_params": state.gen_params,
        "critic_params": state.critic_params,
        "gen_opt_state": state.gen_opt_state,
        "critic_opt_state": state.critic_opt_state,
        "rng": state.rng,
        "iters": state.iters,
        "im_count": state.im_count,
    }
    if state.gen_ema is not None:
        tree["gen_ema"] = state.gen_ema
    if state.aug_p is not None:
        tree["aug_p"] = state.aug_p
    if state.rt_ema is not None:
        tree["rt_ema"] = state.rt_ema
    if state.pl_ema is not None:
        tree["pl_ema"] = state.pl_ema
    _checkpointer().save(path, tree, force=True)  # orbax write is atomic
    meta = {
        "iter": int(state.iters),
        "im_count": int(state.im_count),
        "step": int(state.stage),
        "epoch": int(state.epoch),
        "alpha": None if alpha is None else float(alpha),
        "format": "byogan_tpu.v1",
        "model": model_spec.to_dict() if model_spec is not None else None,
        "ema": state.gen_ema is not None,
        "ada": state.aug_p is not None,
        "ada_rt": state.rt_ema is not None,
        "plr": state.pl_ema is not None,
        "train_config": (
            trajectory_snapshot(train_config)
            if train_config is not None
            else None
        ),
    }
    meta_path = os.path.join(path, _META_NAME)
    if not multiprocess or is_primary:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
    if multiprocess:
        from jax.experimental import multihost_utils

        # No process proceeds (prune/resume/exit) before the checkpoint —
        # orbax tree AND meta — is complete on disk.
        multihost_utils.sync_global_devices(f"byogan_ckpt:{name}")
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Newest checkpoint dir by iteration number (auto-resume support).

    Considers both periodic ``chk-{iters}`` dirs and the ``FINAL`` dir
    (train.py:258 vs train.py:271) — after a completed run, auto-resume must
    pick FINAL, not the last periodic save.  Ties go to FINAL (it is written
    after the periodic checkpoint at the same iteration).
    """
    if not os.path.isdir(directory):
        return None
    best, best_iter = None, -1
    for entry in os.listdir(directory):
        m = re.fullmatch(r"chk-(\d+)", entry)
        full = os.path.join(directory, entry)
        if (
            m
            and os.path.isdir(full)
            and int(m.group(1)) > best_iter
            # A dir without meta is a save that was aborted between the
            # orbax write and the meta write (e.g. a second preemption
            # signal) — skip it so auto-resume falls back instead of
            # crashing on the missing byogan_meta.json.
            and os.path.exists(os.path.join(full, _META_NAME))
        ):
            best, best_iter = full, int(m.group(1))
    final = os.path.join(directory, "FINAL")
    if os.path.isdir(final):
        try:
            with open(os.path.join(final, _META_NAME)) as f:
                if json.load(f)["iter"] >= best_iter:
                    return final
        except (OSError, KeyError, ValueError):
            pass  # partial/foreign FINAL dir: fall back to periodic
    return best


def prune_checkpoints(directory: str, keep: int) -> list:
    """Remove the oldest periodic ``chk-{iters}`` dirs beyond ``keep``.

    Opt-in rotation (config.max_checkpoints) for long runs: a full-depth
    checkpoint is ~1.5GB, and the reference's keep-everything behavior
    (train.py:247-259) fills a disk in a few hours of 512px training.
    ``FINAL`` and aborted partial saves (no meta) are never touched; the
    newest ``keep`` periodic checkpoints survive.  Returns removed paths.
    """
    if keep <= 0 or not os.path.isdir(directory):
        return []
    periodic = []
    for entry in os.listdir(directory):
        m = re.fullmatch(r"chk-(\d+)", entry)
        full = os.path.join(directory, entry)
        if (
            m
            and os.path.isdir(full)
            and os.path.exists(os.path.join(full, _META_NAME))
        ):
            periodic.append((int(m.group(1)), full))
    periodic.sort()
    removed = []
    for _, path in periodic[: max(0, len(periodic) - keep)]:
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def _is_torch_checkpoint(path: str) -> bool:
    return os.path.isfile(path)  # .pth files; ours are directories


def load_checkpoint(
    path: str, template_state: Optional[TrainState] = None
) -> Dict[str, Any]:
    """Load ours (orbax dir) or a reference ``.pth`` (file).

    Returns dict: gen_params, critic_params, iter, im_count, step, epoch,
    alpha, plus (native format only) gen_opt_state / critic_opt_state / rng.
    """
    if _is_torch_checkpoint(path):
        from byogan_tpu.compat.torch_ckpt import load_torch_checkpoint

        return load_torch_checkpoint(path)

    # A typo'd path must say "checkpoint not found", not die opening a
    # missing byogan_meta.json inside a directory that never existed.
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"checkpoint not found: {path} (expected a byogan_tpu checkpoint "
            "directory or a reference .pth file)"
        )
    meta_path = os.path.join(path, _META_NAME)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{path} is a directory but not a byogan_tpu checkpoint "
            f"(missing {_META_NAME})"
        )

    # Meta first: whether the saved tree carries an EMA branch decides the
    # restore template's structure (orbax requires an exact match).
    with open(meta_path) as f:
        meta = json.load(f)
    has_ema = bool(meta.get("ema", False))
    has_ada = bool(meta.get("ada", False))
    has_ada_rt = bool(meta.get("ada_rt", False))
    has_plr = bool(meta.get("plr", False))

    template = None
    if template_state is not None:
        template = {
            "gen_params": template_state.gen_params,
            "critic_params": template_state.critic_params,
            "gen_opt_state": template_state.gen_opt_state,
            "critic_opt_state": template_state.critic_opt_state,
            "rng": template_state.rng,
            "iters": template_state.iters,
            "im_count": template_state.im_count,
        }
        if has_ema:
            template["gen_ema"] = (
                template_state.gen_ema
                if template_state.gen_ema is not None
                else template_state.gen_params
            )
        if has_ada:
            template["aug_p"] = (
                template_state.aug_p
                if template_state.aug_p is not None
                else np.float32(0.0)
            )
        if has_ada_rt:
            template["rt_ema"] = (
                template_state.rt_ema
                if template_state.rt_ema is not None
                else np.float32(0.0)
            )
        if has_plr:
            template["pl_ema"] = (
                template_state.pl_ema
                if template_state.pl_ema is not None
                else np.float32(0.0)
            )
    if template is not None:
        # Restore as HOST numpy INTO the template's structure (optax
        # namedtuples etc. come from the template; values from disk).
        # Restoring to the template's device arrays instead would make
        # orbax deserialize the SAVED shardings — which reference the
        # writing run's topology and fail across process counts (e.g. a
        # 2-process-written checkpoint resumed single-process, or a
        # TPU-written one on CPU).  Device placement happens downstream
        # (shard_train_state / the first jitted step).
        import orbax.checkpoint as ocp

        tree = _checkpointer().restore(
            os.path.abspath(path),
            item=template,
            restore_args=jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
            ),
        )
    else:
        # No template (sampling/eval surfaces): restore as HOST numpy
        # arrays, not with the saved device shardings — a checkpoint
        # written on the TPU must load on a CPU-only process (and vice
        # versa); orbax otherwise fails on the foreign topology.
        import orbax.checkpoint as ocp

        ckptr = _checkpointer()
        meta_tree = ckptr.metadata(os.path.abspath(path)).item_metadata.tree
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
        )
        tree = ckptr.restore(os.path.abspath(path), restore_args=restore_args)
    return {
        "gen_params": tree["gen_params"],
        "critic_params": tree["critic_params"],
        "gen_opt_state": tree.get("gen_opt_state"),
        "critic_opt_state": tree.get("critic_opt_state"),
        "rng": tree.get("rng"),
        "gen_ema": tree.get("gen_ema"),
        "aug_p": tree.get("aug_p"),
        "rt_ema": tree.get("rt_ema"),
        "pl_ema": tree.get("pl_ema"),
        "iter": meta["iter"],
        "im_count": meta["im_count"],
        "step": meta["step"],
        "epoch": meta["epoch"],
        "alpha": meta["alpha"],
        "model": meta.get("model"),
        "train_config": meta.get("train_config"),
    }


def restore_train_state(
    path: str,
    template_state: TrainState,
    config=None,
    allow_config_mismatch: bool = False,
) -> tuple[TrainState, Optional[float]]:
    """Exact resume: full state for ours; params-only (fresh opt) for .pth —
    mirroring what the reference CAN restore (train.py:90-100) while our
    native format restores everything.

    When ``config`` is given and the checkpoint recorded a trajectory
    snapshot, a mismatch in any trajectory-affecting knob raises (or warns,
    with ``allow_config_mismatch``) — see ``check_resume_config``.
    """
    import jax.numpy as jnp

    loaded = load_checkpoint(path, template_state)
    check_resume_config(
        {"train_config": loaded.get("train_config")},
        config,
        allow_mismatch=allow_config_mismatch,
    )
    gen_ema = template_state.gen_ema
    if gen_ema is not None:
        # EMA-enabled run: adopt the checkpoint's shadow, or (resuming from
        # a pre-EMA/.pth checkpoint) seed it from the loaded generator.
        gen_ema = loaded.get("gen_ema")
        if gen_ema is None:
            import jax

            gen_ema = jax.tree.map(lambda x: jnp.asarray(x).copy(),
                                   loaded["gen_params"])
    aug_p = template_state.aug_p
    if aug_p is not None and loaded.get("aug_p") is not None:
        # Augmentation-enabled run resuming an ADA checkpoint: continue at
        # the adapted probability.  Resuming from a pre-ADA/.pth checkpoint
        # keeps the template's config-seeded initial p instead.
        aug_p = jnp.float32(np.asarray(loaded["aug_p"]))
    rt_ema = template_state.rt_ema
    if rt_ema is not None and loaded.get("rt_ema") is not None:
        # Continue the controller's smoothed r_t; checkpoints written before
        # the EMA existed keep the template's 0.0 (it re-converges within
        # ~1/(1-ada_rt_beta) iterations).
        rt_ema = jnp.float32(np.asarray(loaded["rt_ema"]))
    pl_ema = template_state.pl_ema
    if pl_ema is not None and loaded.get("pl_ema") is not None:
        # Continue PLR's running path-length mean; checkpoints written
        # before PLR existed keep the template's 0.0 (the paper's init —
        # it re-tracks within ~1/plr_decay penalized iterations).
        pl_ema = jnp.float32(np.asarray(loaded["pl_ema"]))
    state = template_state.replace(
        gen_params=loaded["gen_params"],
        critic_params=loaded["critic_params"],
        gen_ema=gen_ema,
        aug_p=aug_p,
        rt_ema=rt_ema,
        pl_ema=pl_ema,
        iters=jnp.int32(loaded["iter"]),
        im_count=jnp.int32(loaded["im_count"]),
        stage=loaded["step"],
        epoch=loaded["epoch"],
    )
    if loaded.get("gen_opt_state") is not None:
        state = state.replace(
            gen_opt_state=loaded["gen_opt_state"],
            critic_opt_state=loaded["critic_opt_state"],
            rng=loaded["rng"],
        )
    return state, loaded["alpha"]


def export_torch_checkpoint(
    path: str, state: TrainState, alpha: Optional[float]
) -> None:
    """Write a reference-loadable ``.pth`` (torch at the compat boundary only).

    Keys/layout match train.py:248-259 with DataParallel ``module.``
    prefixes so generate_samples.py:48-52 can consume it directly.
    """
    import torch

    from byogan_tpu.compat.torch_ckpt import (
        critic_params_to_torch,
        generator_params_to_torch,
    )

    # np.array(copy=True): np.asarray on a jax array yields a NON-writable
    # view, and torch.from_numpy on it warns (and would alias device memory
    # semantics torch doesn't honor).  Copy before handing to torch.
    gen_sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in generator_params_to_torch(
            jax.tree.map(np.asarray, state.gen_params)
        ).items()
    }
    critic_sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in critic_params_to_torch(
            jax.tree.map(np.asarray, state.critic_params)
        ).items()
    }
    torch.save(
        {
            "gen": gen_sd,
            "critic": critic_sd,
            "iter": int(state.iters),
            "im_count": int(state.im_count),
            "step": int(state.stage),
            "epoch": int(state.epoch),
            "alpha": None if alpha is None else float(alpha),
        },
        path,
    )
