"""Progressive-growing training orchestration (reference train.py:15-275).

Host-side control (stage/epoch/fade scheduling, IO, checkpoints) around the
fused device step.  Structural differences from the reference, all
TPU-motivated and documented:

  * ONE jitted step per (stage, fade-flags) bucket replaces the reference's
    per-op dispatch; latents/noise are sampled on device.
  * The fixed 25-sample eval grid is generated only when it is about to be
    saved (every ``display_step``) — the reference runs that 25-sample
    forward EVERY iteration and throws it away (train.py:236-237).
    Observable artifacts (``output/s-{iters}.png``) are identical.
  * The trailing ragged batch of each epoch is dropped for static shapes
    (see data/pipeline.py docstring).
  * Checkpoints carry optimizer + RNG state for exact resume; the
    reference's resume loses both and restarts alpha (SURVEY.md §5).

Fade-in parity note: the reference computes
``fade_in = fade_percentage * step_epochs * len(dataloader)`` — a *batch*
count — but divides an *image* count by it (train.py:119, 143).  Faithfully
replicated (it is load-bearing for training dynamics): alpha ramps
``batch_size``-times faster than the percentage suggests.
"""

from __future__ import annotations

import contextlib
import os
import signal
import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from byogan_tpu.core.grids import display_image
from byogan_tpu.core.random import truncated_noise
from byogan_tpu.data.pipeline import (
    batches_per_epoch,
    device_prefetch,
    make_stage_loader,
    open_stage_dataset,
)
from byogan_tpu.models import Critic, Generator
from byogan_tpu.train.checkpoint import (
    checkpoint_name,
    prune_checkpoints,
    restore_train_state,
    save_checkpoint,
)
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.metrics import MetricsLogger
from byogan_tpu.train.state import TrainState, create_train_state
from byogan_tpu.train.steps import make_eval_step, make_train_step


def _model_dtype(config: TrainConfig):
    return None if config.compute_dtype == "float32" else jnp.dtype(
        config.compute_dtype
    )


def model_spec(config: TrainConfig) -> "ModelSpec":
    from byogan_tpu.models.factory import ModelSpec

    return ModelSpec(
        num_stages=max(config.num_stages, 1),
        channel_divisor=config.channel_divisor,
        mapping_depth=config.mapping_depth,
    )


def build_models(config: TrainConfig) -> Tuple[Generator, Critic]:
    from byogan_tpu.models.factory import build_critic, build_generator

    dtype = _model_dtype(config)
    spec = model_spec(config)
    # The training generator always uses the lax path: the Pallas epilogue is
    # forward-only and measured slower end-to-end than XLA fusion here
    # (benchmarks/RESULTS.md); inference surfaces opt in via
    # serve.Sampler(use_pallas=...) / the CLIs' --pallas flag.
    return (
        build_generator(spec, dtype=dtype, use_pallas=False),
        build_critic(spec, dtype=dtype),
    )


@contextlib.contextmanager
def _graceful_stop():
    """SIGTERM/SIGINT -> checkpoint-and-exit at the next iteration boundary.

    Preemption safety (§5 failure recovery): on preemptible TPU capacity
    the scheduler SIGTERMs the process; instead of dying mid-epoch and
    losing everything since the last periodic checkpoint, the train loop
    finishes the in-flight iteration, saves, and returns cleanly (resume is
    batch-exact from that point).  A second signal aborts immediately.
    Handlers are installed only in the main thread and always restored.
    """
    stop_requested: list = []
    if threading.current_thread() is not threading.main_thread():
        yield stop_requested  # signals can't be bound here; no-op
        return

    def _request(signum, frame):
        if stop_requested:
            raise KeyboardInterrupt  # second signal: abort now
        stop_requested.append(signum)
        print(
            f"received signal {signum}: saving a checkpoint and exiting at "
            "the next iteration boundary (send again to abort immediately)"
        )

    prev = {
        sig: signal.signal(sig, _request)
        for sig in (signal.SIGTERM, signal.SIGINT)
    }
    try:
        yield stop_requested
    finally:
        for sig, handler in prev.items():
            signal.signal(sig, handler)


def train(
    config: TrainConfig,
    checkpoint: Optional[str] = None,
    max_iters: Optional[int] = None,
    mesh=None,
    allow_config_mismatch: bool = False,
) -> TrainState:
    """Run the full progressive schedule (reference train.py:15 entrypoint).

    ``checkpoint`` may be our orbax dir or a reference ``.pth``.
    ``max_iters`` caps total iterations (tests/benchmarks).
    ``mesh``: optional jax.sharding.Mesh for multi-chip; see parallel/.
    ``allow_config_mismatch`` downgrades the resume trajectory-config guard
    (checkpoint.check_resume_config) from error to warning.
    SIGTERM/SIGINT checkpoint-and-exit cleanly (``_graceful_stop``).
    """
    with _graceful_stop() as stop_requested:
        return _train(
            config, checkpoint, max_iters, mesh, stop_requested,
            allow_config_mismatch,
        )


def _train(
    config: TrainConfig,
    checkpoint: Optional[str],
    max_iters: Optional[int],
    mesh,
    stop_requested: list,
    allow_config_mismatch: bool = False,
) -> TrainState:
    if config.data is None:
        raise ValueError("config.data must point at a prepared dataset")
    if not os.path.exists(os.path.join(config.data, "prepared")):
        raise OSError("Did not detect prepared dataset!")

    gen, critic = build_models(config)
    spec = model_spec(config)
    state = create_train_state(config, gen, critic)

    os.makedirs(config.checkpoint_dir, exist_ok=True)
    os.makedirs(config.output_dir, exist_ok=True)

    alpha_saved: Optional[float] = None
    last_stage = None
    if checkpoint is not None:
        state, alpha_saved = restore_train_state(
            checkpoint, state, config=config,
            allow_config_mismatch=allow_config_mismatch,
        )
        last_stage = state.stage

    if mesh is None and (config.data_axis > 1 or config.model_axis > 1):
        from byogan_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=config.data_axis, model=config.model_axis)
    if mesh is not None:
        from byogan_tpu.parallel.mesh import shard_train_state

        data_size = mesh.shape.get("data", 1)
        bad = [
            (i + 1, b)
            for i, b in enumerate(config.batch_progression[: config.num_stages])
            if b % data_size != 0
        ]
        if bad:
            raise ValueError(
                f"batch_progression entries {bad} (stage, batch) are not "
                f"divisible by the data-parallel axis ({data_size}); fix the "
                "config now rather than crashing mid-run at that stage"
            )
        state = shard_train_state(state, mesh)
        if jax.process_index() == 0:
            print(f"mesh: {dict(mesh.shape)}")

    # Multi-host IO discipline: DEVICE work (train/eval/SWD steps) is SPMD —
    # every process must execute it — but HOST artifacts must be written
    # exactly once.  Sample grids, metrics.jsonl, and checkpoint pruning are
    # gated to process 0; checkpoint saves are coordinated (all processes
    # call orbax together — required for sharded leaves — and process 0
    # writes the meta; see checkpoint.save_checkpoint).
    is_primary = jax.process_index() == 0

    # Fixed noise grid to visualize progress (train.py:83: 25 z's, trunc .75).
    show_z = truncated_noise(
        jax.random.PRNGKey(config.seed + 7),
        config.show_noise_count,
        config.noise_size,
        config.show_noise_trunc,
    )

    logger = MetricsLogger(
        config.refresh_stat_step,
        jsonl_path=(
            os.path.join(config.output_dir, "metrics.jsonl")
            if is_primary
            else None  # non-primary: no jsonl append, no console spam
        ),
        print_fn=print if is_primary else (lambda *a, **k: None),
    )

    step_cache: Dict[tuple, object] = {}
    eval_cache: Dict[tuple, object] = {}
    total_iters = int(state.iters)
    alpha_for_ckpt: Optional[float] = alpha_saved
    cur_epoch = int(state.epoch)  # host-side mirror; see NOTE in epoch loop

    # Rolling loss windows — persistent across epoch/stage boundaries like
    # the reference's whole-run history lists (train.py:87-88, sliced to the
    # last refresh_stat_step entries at readout, train.py:223-229), so every
    # readout after warmup averages exactly k iterations.  deque(maxlen=k)
    # keeps only the window's device scalars alive.
    from collections import deque

    k = config.refresh_stat_step
    c_hist: deque = deque(maxlen=k)
    g_hist: deque = deque(maxlen=k)

    # Pipelined metric readout: the window mean is DISPATCHED at its window
    # boundary but fetched one window later, when it is long since computed —
    # a synchronous float() right after dispatch costs a full pipeline drain
    # (~190ms on the tunneled backend, measured in scripts/profile_hotloop.py)
    # per window.  Log content is identical, just emitted one window late.
    pending_log: Optional[tuple] = None

    def flush_pending() -> None:
        nonlocal pending_log
        if pending_log is not None:
            it0, ep0, st0, b0, cm, gm, ex = pending_log
            logger.log_step(
                it0, float(cm), float(gm), ep0, st0, b0,
                extra=(
                    {k: round(float(v), 4) for k, v in ex.items()}
                    if ex else None
                ),
            )
            pending_log = None

    def stop_save(epoch: int) -> TrainState:
        """Checkpoint-and-return at an iteration boundary (preemption stop
        or max_iters).  Reads the CURRENT state/alpha via closure."""
        flush_pending()
        logger.close()
        st = state.replace(epoch=epoch)
        path = save_checkpoint(
            config.checkpoint_dir, st, alpha_for_ckpt, model_spec=spec,
            train_config=config,
        )
        if stop_requested:
            print(f"preemption checkpoint saved: {path}")
        return st

    for index in range(config.num_stages):
        steps = index + 1
        if last_stage is not None and steps < last_stage:
            continue
        # Earlier stages' eval artifacts are dead weight from here on: the
        # SWD real-image cache in particular holds eval_images float32
        # frames per stage on device (~800MB at stage 8 with 256 images) —
        # without eviction a full 512px run with eval_step > 0 accumulates
        # every stage's cache and bleeds HBM.
        _evict_stage_cache(eval_cache, steps)
        batch = config.stage_batch(index)
        stage_epochs = config.stage_epochs(index)

        dataset = open_stage_dataset(config.data, steps)
        n_batches = batches_per_epoch(len(dataset), batch)
        if n_batches == 0:
            raise ValueError(
                f"stage {steps}: dataset ({len(dataset)}) smaller than batch "
                f"({batch})"
            )
        # Reference fade-in span (train.py:119) — see module docstring.
        fade_in = config.fade_percentage * stage_epochs * n_batches

        resume_mid_stage = last_stage is not None and steps == last_stage
        if not resume_mid_stage:
            zero = jnp.int32(0)  # train.py:108
            if mesh is not None:
                # Keep the counter on the GLOBAL mesh: a process-local zero
                # inside an otherwise global-sharded state is a cross-mesh
                # jit error on multi-host runs.
                from jax.sharding import NamedSharding, PartitionSpec

                zero = jax.device_put(
                    np.int32(0), NamedSharding(mesh, PartitionSpec())
                )
            state = state.replace(im_count=zero)
        state = state.replace(stage=steps)
        # im_count is tracked host-side (it advances deterministically by
        # critic_repeats*batch per iteration) so the hot loop never blocks on
        # a device readback; one fetch only when resuming mid-stage.
        host_im_count = int(state.im_count) if resume_mid_stage else 0
        # Batch-exact resume: the loader is deterministic given its seed, so
        # the epoch AND intra-epoch position derive from im_count; the
        # resumed epoch replays its RNG draws and skips already-trained
        # batches.  (The reference re-runs the whole interrupted epoch,
        # train.py:125-128 — ours continues bit-identically to the
        # uninterrupted run; tests/test_train_loop.py.)
        iters_done = host_im_count // (batch * config.critic_repeats)
        resume_epoch = iters_done // n_batches if resume_mid_stage else 0
        resume_skip = iters_done % n_batches if resume_mid_stage else 0

        if is_primary:
            print(f"STARTING STEP #{steps}")

        for epoch in range(stage_epochs):
            if resume_mid_stage and epoch < resume_epoch:
                continue
            # NOTE: epoch is deliberately NOT folded into `state` here —
            # TrainState.epoch is a STATIC pytree field, so changing it
            # per epoch would force a full re-trace + XLA recompile of the
            # step every epoch (measured: ~1.5s and a ~65MB leaked
            # executable per epoch).  It is folded in only at save time.
            cur_epoch = epoch

            # Multi-host: every host seeds the same global shuffle but decodes
            # only its own row slice of each batch (per-host data sharding);
            # the slices assemble into one global array in device_prefetch.
            n_proc = jax.process_count() if mesh is not None else 1
            loader = make_stage_loader(
                dataset,
                batch,
                seed=config.seed * 100003 + steps * 1009 + epoch,
                workers=config.num_workers,
                process_index=jax.process_index() if n_proc > 1 else 0,
                process_count=n_proc,
                skip_batches=(
                    resume_skip
                    if resume_mid_stage and epoch == resume_epoch
                    else 0
                ),
                # uint8 transport: batches cross the host->device link raw
                # and normalize inside the jitted step (equal to the f32
                # lane to float rounding, tested) — 4x fewer bytes over the
                # link, the transfer share of real-run iteration cost at
                # the big stages.
                device_normalize=True,
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                batch_sharding = NamedSharding(
                    mesh, PartitionSpec("data", None, None, None)
                )
            else:
                batch_sharding = None
            loader = device_prefetch(
                loader, sharding=batch_sharding, process_count=n_proc
            )
            for real in loader:
                # Check the stop flag BEFORE building/dispatching the next
                # step: a signal landing at a stage boundary or fade-bucket
                # flip must not wait out a fresh multi-minute XLA compile —
                # the scheduler's kill grace would expire first.  State here
                # is at an iteration boundary, so the save is batch-exact.
                if stop_requested:
                    return stop_save(epoch)
                repeats = config.critic_repeats
                critic_fade = tuple(
                    (host_im_count + r * batch) / fade_in <= 1.0
                    for r in range(repeats)
                )
                gen_fade = (host_im_count + repeats * batch) / fade_in <= 1.0

                key = (steps, batch, critic_fade, gen_fade)
                if key not in step_cache:
                    step_cache[key] = make_train_step(
                        gen,
                        critic,
                        config,
                        steps=steps,
                        batch=batch,
                        fade_in=fade_in,
                        critic_fade=critic_fade,
                        gen_fade=gen_fade,
                    )
                state, metrics = step_cache[key](state, real)

                # Host-side mirrors of the device counters — no readbacks in
                # the hot loop (a scalar fetch costs ~25ms on the tunneled
                # backend; see CLAUDE.md).
                total_iters += 1
                host_im_count += repeats * batch
                gen_alpha = host_im_count / fade_in
                alpha_for_ckpt = None if gen_alpha > 1.0 else gen_alpha

                # Metrics stay on device; fetched (one stacked transfer) only
                # at the reference's refresh cadence (train.py:223-234).
                c_hist.append(metrics["c_loss"])
                g_hist.append(metrics["g_loss"])
                if total_iters % k == 0:
                    flush_pending()
                    # Overfit observability: r_t = E[sign(D(real))] (the ADA
                    # heuristic — drifts to +1 as the critic memorizes the
                    # training set) rides along in the window fetch, plus
                    # the current augmentation probability when ADA is on.
                    # One or two extra scalars; training is untouched.
                    extras = {}
                    if "real_sign" in metrics:  # logistic losses only
                        extras["rt"] = metrics["real_sign"]
                    if config.use_aug:
                        extras["aug_p"] = metrics["aug_p"]
                    if "rt_ema" in metrics:  # ADA controller's smoothed r_t
                        extras["rt_ema"] = metrics["rt_ema"]
                    if "pl_ema" in metrics:  # PLR running path-length mean
                        extras["pl_ema"] = metrics["pl_ema"]
                    if "pl_penalty" in metrics:
                        # 0.0 on non-penalized iterations (the plain cond
                        # branch) — engagement checks should read pl_ema,
                        # which persists between penalized steps.
                        extras["pl_penalty"] = metrics["pl_penalty"]
                    pending_log = (
                        total_iters, epoch, steps, batch,
                        jnp.stack(list(c_hist)).mean(),
                        jnp.stack(list(g_hist)).mean(),
                        extras,
                    )

                if total_iters > 0 and total_iters % config.display_step == 0:
                    _save_sample_grid(
                        gen, config, state, show_z, steps, gen_fade,
                        alpha_for_ckpt, total_iters, eval_cache,
                        write=is_primary,
                    )
                if (
                    config.eval_step > 0
                    and total_iters % config.eval_step == 0
                ):
                    _log_swd_eval(
                        gen, config, state, dataset, steps, gen_fade,
                        alpha_for_ckpt, total_iters, eval_cache, logger,
                    )
                if total_iters > 0 and total_iters % config.checkpoint_step == 0:
                    save_checkpoint(
                        config.checkpoint_dir, state.replace(epoch=epoch),
                        alpha_for_ckpt, model_spec=spec, train_config=config,
                    )
                    if config.max_checkpoints > 0 and is_primary:
                        # Opt-in rotation: prune AFTER the new save landed,
                        # so a crash mid-save never leaves fewer than
                        # max_checkpoints resumable periodic checkpoints.
                        # Process 0 only (the save itself barriers, so no
                        # process is still reading the pruned dirs).
                        prune_checkpoints(
                            config.checkpoint_dir, config.max_checkpoints
                        )
                if stop_requested or (
                    max_iters is not None and total_iters >= max_iters
                ):
                    return stop_save(epoch)
        last_stage = None

    state = state.replace(epoch=cur_epoch)
    # Final artifacts (train.py:261-275): sample grid + FINAL checkpoint with
    # alpha=None.  A stop request arriving after the last iteration skips
    # the grid (it may need a fresh (stage, no-fade) compile) and goes
    # straight to the FINAL save.
    if not stop_requested:
        _save_sample_grid(
            gen, config, state, show_z, state.stage, False, None,
            total_iters, eval_cache, filename="s-final", write=is_primary,
        )
    save_checkpoint(
        config.checkpoint_dir, state, None, name="FINAL", model_spec=spec,
        train_config=config,
    )
    flush_pending()
    logger.close()
    if is_primary:
        print("TRAINING IS FINISHED - MODEL SAVED!")
    return state


def _evict_stage_cache(eval_cache: Dict[tuple, object], steps: int) -> None:
    """Drop eval-cache entries belonging to stages other than ``steps``.

    Keys are ``(steps, fade)`` (sample-grid step fns),
    ``("swd_real", steps)`` (cached real frames — the HBM-heavy one), and
    ``("swd_synth", steps, fade, n)`` (jitted synth fns).  The stage lives
    at key[0] for int-keyed entries and key[1] for string-tagged ones.
    """
    for key in list(eval_cache):
        key_steps = key[1] if isinstance(key[0], str) else key[0]
        if key_steps != steps:
            del eval_cache[key]


def _save_sample_grid(
    gen: Generator,
    config: TrainConfig,
    state: TrainState,
    show_z: jax.Array,
    steps: int,
    fade: bool,
    alpha: Optional[float],
    iters: int,
    eval_cache: Dict[tuple, object],
    filename: Optional[str] = None,
    write: bool = True,
) -> None:
    """Reference display path (train.py:238-245): clamp to [0,1], 5x5 grid,
    matplotlib title 'Iteration {iters}', file ``output/s-{iters}.png``.

    Multi-host: the synthesis forward is SPMD (params live on the global
    mesh — every process must execute it) but only process 0 passes
    ``write=True`` and encodes the PNG.  The small host-side inputs
    (show_z, rng key, alpha) cross into the jit as numpy, which jax treats
    as the same-on-every-process replicated value.
    """
    key = (steps, fade)
    if key not in eval_cache:
        eval_cache[key] = make_eval_step(gen, config, steps=steps, fade=fade)
    examples = eval_cache[key](
        state.gen_params,
        np.asarray(show_z),
        np.asarray(
            jax.random.fold_in(jax.random.PRNGKey(config.seed + 13), iters)
        ),
        np.float32(0.0 if alpha is None else alpha),
    )
    # Replicated output: every process holds the full value; only the
    # primary encodes.
    if not write:
        return
    imgs = np.clip(np.asarray(examples), 0.0, 1.0)
    display_image(
        imgs,
        num_display=config.show_noise_count,
        save_to_disk=True,
        save_dir=config.output_dir,
        filename=filename or f"s-{iters}",
        title=f"Iteration {iters}",
    )


def _log_swd_eval(
    gen: Generator,
    config: TrainConfig,
    state: TrainState,
    dataset,
    steps: int,
    fade: bool,
    alpha: Optional[float],
    iters: int,
    eval_cache: Dict[tuple, object],
    logger: MetricsLogger,
) -> None:
    """Periodic SWD readout (``eval_step > 0``; TPU-native extension).

    Scores ``eval_images`` fresh samples against the first ``eval_images``
    real images of the current stage with eval/swd.py, at the stage's
    current fade alpha (same semantics as the sample grid).  When the EMA
    shadow is enabled, scores it too (``swd_ema``) — that is what sampling
    surfaces serve.  Each record also carries the MS-SSIM mode-collapse
    readout (eval/msssim.py): ``msssim`` / ``msssim_ema`` are the generated
    set's pairwise diversity (→1.0 on collapse), ``msssim_real`` the real
    set's anchor on the same corpus.  Results land in metrics.jsonl as
    ``{"kind": "eval"}`` records; with ``eval_step = 0`` (default) none of
    this runs.

    Multi-host: the synthesis forward is SPMD (global params — all
    processes execute it); its replicated output is then pulled to HOST
    numpy, so the SWD scoring itself runs process-locally against the
    process's own (identical) real-image cache — no cross-process
    collectives, identical scores everywhere.  The logger writes on
    process 0 only (its jsonl handle exists only there).
    """
    from byogan_tpu.eval.msssim import msssim_diversity
    from byogan_tpu.eval.swd import sliced_wasserstein_distance

    n = min(config.eval_images, len(dataset))
    rkey = ("swd_real", steps)
    if rkey not in eval_cache:
        from byogan_tpu.core.grids import uint8_to_training_range

        # Seeded random subset WITHOUT replacement (not the first n items):
        # on corpora with correlated ordering (consecutive frames,
        # class-sorted) a prefix slice biases both the SWD reference set and
        # the MS-SSIM real anchor relative to the shuffled CLI path
        # (ADVICE r4).  Seeded by config.seed, so every process draws the
        # identical cache (multi-host invariant above).
        idx_rng = np.random.default_rng(config.seed + 8191)
        idx = np.sort(idx_rng.choice(len(dataset), size=n, replace=False))
        u8 = dataset.get_batch_uint8(idx)
        # Upload the raw uint8 and convert ON DEVICE (uint8_to_training_range
        # has a jnp branch) — 4x fewer tunnel bytes, same rule as the
        # training batch lane (CLAUDE.md / pipeline.device_normalize).
        eval_cache[rkey] = uint8_to_training_range(jnp.asarray(u8))
    real = eval_cache[rkey]

    skey = ("swd_synth", steps, fade, n)
    if skey not in eval_cache:
        compute_dtype = jnp.dtype(config.compute_dtype)

        @jax.jit
        def synth(gen_params, key, alpha_arr):
            from byogan_tpu.core.random import synthesis_noise

            kz, kn = jax.random.split(key)
            # The TRAINING latent distribution (truncated at noise_trunc,
            # steps.py / reference train.py:139) — scoring with wider z
            # would probe latents the model never trained on.
            z = truncated_noise(
                kz, n, config.noise_size, config.noise_trunc, compute_dtype
            )
            noise = synthesis_noise(kn, n, steps, dtype=compute_dtype)
            return gen.apply(
                {"params": gen_params}, z, noise, steps=steps,
                alpha=alpha_arr if fade else None,
            ).astype(jnp.float32)

        eval_cache[skey] = synth
    synth = eval_cache[skey]

    synth_key = np.asarray(jax.random.fold_in(
        jax.random.PRNGKey(config.seed + 131071), iters
    ))
    alpha_arr = np.float32(0.0 if alpha is None else alpha)
    swd_key = jax.random.fold_in(
        jax.random.PRNGKey(config.seed + 524287), iters
    )
    min_size = min(16, 4 * 2 ** (steps - 1))
    targets = [("swd", state.gen_params)]
    if state.gen_ema is not None:
        targets.append(("swd_ema", state.gen_ema))
    values = {}
    for name, params in targets:
        fake = synth(params, synth_key, alpha_arr)
        if jax.process_count() > 1:
            # Host hop: the synth output is replicated (every process holds
            # the full value); scoring on numpy keeps the SWD local to each
            # process.  Single-process runs skip it — at 512px the hop moved
            # ~200MB to the host and back TWICE (SWD + MS-SSIM re-upload)
            # per eval over the tunnel; on-device scoring feeds the jitted
            # SWD/MS-SSIM directly.
            fake = np.asarray(fake)
        per_level = sliced_wasserstein_distance(
            real, fake, swd_key, patches_per_image=64, min_size=min_size
        )
        values[name] = round(per_level[0], 3)
        if n >= 2:  # mode-collapse readout (eval/msssim.py): →1.0 on collapse
            div = msssim_diversity(fake)
            values["msssim" + name[len("swd"):]] = round(float(div), 4)
    if n >= 2:
        mkey = ("msssim_real", steps)
        if mkey not in eval_cache:  # the healthy anchor, once per stage
            eval_cache[mkey] = round(float(msssim_diversity(real)), 4)
        values["msssim_real"] = eval_cache[mkey]
    logger.log_eval(iters, steps, values)
