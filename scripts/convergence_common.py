"""Shared skeleton for the convergence-proof scripts.

Every on-chip/CPU training proof (scripts/tpu_convergence.py,
tpu_convergence_hires.py, tpu_full_schedule.py, wgan_gp_convergence.py)
drives the same pipeline — synthetic corpus -> prep pyramid -> production
``train()`` -> learning-signal verification -> summary.json/curves.png —
and differs only in the schedule, the out_root, and which extra assertions
apply.  This module is the single definition of that pipeline; the scripts
are thin parameterizations.  (The reference has no analogue: its "proof"
was watching tqdm, train.py:231-234.)

Verification stages (all previously triplicated across the scripts):
  * every metrics.jsonl loss/SWD record finite;
  * optional: in-stage SWD improvement for stages >= ``swd_stage_min``
    (best later reading beats the stage's first — fade buckets included);
  * generated channel statistics move toward the data distribution and away
    from a fresh-init generator's (apples-to-apples through the same
    checkpoint export path);
  * no mode collapse (per-image spatial std).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional


def channel_stats(imgs):
    """Per-channel mean and mean per-image spatial std of NHWC [0,1] floats."""
    import numpy as np

    means = imgs.mean(axis=(0, 1, 2))
    spatial_std = imgs.std(axis=(1, 2)).mean()
    return means, float(spatial_std)


def generated_stats(checkpoint: str, n: int = 64):
    """Channel stats of n generated samples mapped to [0,1].

    The generator models the training distribution in [-1,1] (pipeline
    normalization), so outputs are mapped (x+1)/2 before comparing with the
    [0,1] real pixels — the Sampler's raw-save uint8 path would crush the
    negative half to black (reference save parity) and bias the stats.
    """
    import jax
    import numpy as np

    from byogan_tpu.core.random import synthesis_noise, truncated_noise
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(checkpoint)
    gen = build_generator(ModelSpec.from_dict(save.get("model")))
    kz, kn = jax.random.split(jax.random.PRNGKey(123))
    z = truncated_noise(kz, n, z_dim_from_params(save["gen_params"]), 0.75)
    noise = synthesis_noise(kn, n, save["step"])
    x = gen.apply(
        {"params": save["gen_params"]}, z, noise, steps=save["step"],
        alpha=None,
    )
    x01 = np.clip((np.asarray(x, np.float32) + 1.0) / 2.0, 0.0, 1.0)
    return channel_stats(x01)


def prepare_data(
    out_root: str, n_images: int, size: int, seed: int,
    structured: bool = False,
) -> str:
    """Synthetic corpus + prep pyramid under out_root/data (idempotent).

    ``structured=True`` uses the face-like parameterized-geometry corpus
    (data/synthetic.write_structured_dataset) whose consistent layout makes
    high-resolution structure actually learnable."""
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import (
        write_structured_dataset,
        write_synthetic_dataset,
    )

    data = os.path.join(out_root, "data")
    if not os.path.isdir(os.path.join(data, "prepared")):
        writer = write_structured_dataset if structured else write_synthetic_dataset
        writer(data, n_images=n_images, size=size, seed=seed)
        prepare_pyramid(data, 4, size)
    return data


def write_compare_grids(
    out_root: str,
    data: str,
    n_stages: int,
    checkpoint: str,
    n: int = 25,
    use_ema: bool = True,
    truncation: float = 0.75,
) -> dict:
    """Side-by-side visual evidence: a 5x5 grid of REAL corpus images next
    to a 5x5 grid of (EMA) generator samples from ``checkpoint``, both
    rendered through the same [0,1] mapping (generated [-1,1] output mapped
    (x+1)/2 — NOT the reference's raw-range save that crushes the negative
    half).  Writes real_grid.png, gen_grid.png, compare.png to out_root.
    """
    import jax
    import numpy as np

    from byogan_tpu.core.grids import make_grid, save_image
    from byogan_tpu.core.random import synthesis_noise, truncated_noise
    from byogan_tpu.data.pipeline import StageDataset
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.train.checkpoint import load_checkpoint

    side = int(np.sqrt(n))
    ds = StageDataset(data, n_stages)
    real = ds.get_batch_uint8(np.arange(min(n, len(ds.files))))
    real01 = real.astype(np.float32) / 255.0

    save = load_checkpoint(checkpoint)
    params = save["gen_params"]
    used_ema = False
    if use_ema and save.get("gen_ema") is not None:
        params, used_ema = save["gen_ema"], True
    gen = build_generator(ModelSpec.from_dict(save.get("model")))
    kz, kn = jax.random.split(jax.random.PRNGKey(777))
    z = truncated_noise(kz, n, z_dim_from_params(params), truncation)
    noise = synthesis_noise(kn, n, save["step"])
    x = gen.apply(
        {"params": params}, z, noise, steps=save["step"], alpha=None
    )
    gen01 = np.clip((np.asarray(x, np.float32) + 1.0) / 2.0, 0.0, 1.0)

    real_grid = make_grid(real01, nrow=side)
    gen_grid = make_grid(gen01, nrow=side)
    save_image(real_grid, os.path.join(out_root, "real_grid.png"))
    save_image(gen_grid, os.path.join(out_root, "gen_grid.png"))
    # one combined frame: real | white gutter | generated
    gutter = np.ones((real_grid.shape[0], 8, 3), np.float32)
    save_image(
        np.concatenate([real_grid, gutter, gen_grid], axis=1),
        os.path.join(out_root, "compare.png"),
    )
    return {"ema": used_ema, "n": int(real01.shape[0])}


def resolve_run_state(out_root: str, allow_resume: bool):
    """(verify_only, resume_from) for a proof run under out_root.

    BYOGAN_CONV_VERIFY_ONLY=1 with a finished run present re-verifies without
    retraining.  With ``allow_resume``, a preempted attempt (its SIGTERM
    handler saved a checkpoint before exiting) continues from the newest
    checkpoint — the same latest_checkpoint() path byogan-train
    --auto-resume uses.  Otherwise stale checkpoints/output are wiped.
    """
    final = os.path.join(out_root, "checkpoints", "FINAL")
    verify_only = (
        os.environ.get("BYOGAN_CONV_VERIFY_ONLY") == "1"
        and os.path.isdir(final)
    )
    resume_from = None
    if not verify_only:
        if allow_resume and not os.path.isdir(final):
            from byogan_tpu.train.checkpoint import latest_checkpoint

            resume_from = latest_checkpoint(
                os.path.join(out_root, "checkpoints")
            )
        if resume_from:
            print(f"auto-resuming preempted run from {resume_from}")
        else:
            for stale in ("checkpoints", "output"):
                shutil.rmtree(
                    os.path.join(out_root, stale), ignore_errors=True
                )
    return verify_only, resume_from


def run_and_verify(
    out_root: str,
    config,
    n_stages: int,
    *,
    verify_only: bool = False,
    resume_from: Optional[str] = None,
    summary_head: Optional[dict] = None,
    include_first_loss: bool = False,
    expect_evals: bool = True,
    swd_stage_min: Optional[int] = None,
    swd_min_drop: float = 0.0,
    swd_min_evals: int = 3,
    require_final_stage: bool = False,
    plot_title: Optional[str] = None,
    pass_message: str = "CONVERGENCE RUN PASSED",
) -> dict:
    """Train (unless verify_only), verify the learning signal, write
    summary.json (+ curves.png when ``plot_title``), return the summary.

    ``summary_head``: keys placed before the shared summary fields (e.g.
    {"schedule": ...} or {"loss": "wgan-gp"}).  ``swd_stage_min``: assert the
    SWD improves WITHIN every stage >= this (and record the per-stage
    first/best readings).  ``swd_min_drop``: required FRACTIONAL in-stage
    improvement ((first-best)/first) for those stages — 0.0 keeps the old
    best<first check, which at a noisy eval cadence can pass on jitter
    alone (VERDICT r3 weak #4); the structured proof demands a real margin.
    ``swd_min_evals``: minimum SWD readings per asserted stage.
    ``require_final_stage``: assert the run reached stage ``n_stages``.
    """
    import numpy as np

    from byogan_tpu.data.pipeline import StageDataset
    from byogan_tpu.train.loop import train

    t0 = time.time()
    if not verify_only:
        train(config, checkpoint=resume_from)
        wall = time.time() - t0
    else:  # keep the original training wall time from the existing summary
        try:
            with open(os.path.join(out_root, "summary.json")) as f:
                wall = json.load(f)["wall_seconds"]
        except (OSError, KeyError, ValueError):
            wall = 0.0

    # ---- verify the run learned ----
    from byogan_tpu.train.metrics import read_metrics

    metrics_path = os.path.join(config.output_dir, "metrics.jsonl")
    all_records = read_metrics(metrics_path)
    metrics = [r for r in all_records if "c_loss" in r]
    evals = [r for r in all_records if r.get("kind") == "eval"]
    assert metrics, "no metrics logged"
    for rec in metrics:
        assert np.isfinite(rec["c_loss"]) and np.isfinite(rec["g_loss"]), rec
    if expect_evals:
        assert evals, "eval_step was set but no eval records were logged"
        for rec in evals:
            assert np.isfinite(rec["swd"]), rec
            if "swd_ema" in rec:  # only present when the run carries an EMA
                assert np.isfinite(rec["swd_ema"]), rec
    if require_final_stage:
        assert metrics[-1]["stage"] == n_stages, (
            f"did not reach stage {n_stages}"
        )

    hires_improvement = None
    if swd_stage_min is not None:
        swd_by_stage = {}
        for rec in evals:
            swd_by_stage.setdefault(rec["stage"], []).append(rec)
        hires_improvement = {}
        for stage in sorted(swd_by_stage):
            if stage < swd_stage_min:
                continue
            recs = swd_by_stage[stage]
            assert len(recs) >= swd_min_evals, (
                f"stage {stage}: only {len(recs)} SWD readings "
                f"(need >= {swd_min_evals})"
            )
            first = min(recs[0]["swd"], recs[0].get("swd_ema", recs[0]["swd"]))
            best = min(
                min(r["swd"], r.get("swd_ema", r["swd"])) for r in recs[1:]
            )
            drop = (first - best) / first if first > 0 else 0.0
            hires_improvement[stage] = {
                "first": round(first, 2),
                "best_later": round(best, 2),
                "drop_frac": round(drop, 4),
                "n_evals": len(recs),
            }
            assert best < first, (
                f"stage {stage} SWD never improved within the stage: "
                f"first={first} best_later={best}"
            )
            assert drop >= swd_min_drop, (
                f"stage {stage} SWD dropped only {drop:.1%} in-stage "
                f"(required >= {swd_min_drop:.0%}): first={first} "
                f"best_later={best}"
            )

    ds = StageDataset(config.data, n_stages)
    n_real = min(64, len(ds.files))  # small-corpus demos have < 64 images
    real = ds.get_batch_uint8(np.arange(n_real)).astype(np.float32) / 255.0
    real_means, real_sstd = channel_stats(real)

    final = os.path.join(config.checkpoint_dir, "FINAL")
    trained_means, trained_sstd = generated_stats(final)

    # Fresh-init baseline: export an untrained checkpoint through the same
    # path so the comparison is apples-to-apples.
    from byogan_tpu.models.factory import build_critic, build_generator
    from byogan_tpu.train.checkpoint import save_checkpoint
    from byogan_tpu.train.loop import model_spec
    from byogan_tpu.train.state import create_train_state

    spec = model_spec(config)
    fresh_state = create_train_state(
        config, build_generator(spec), build_critic(spec)
    ).replace(stage=n_stages)
    fresh_dir = save_checkpoint(
        os.path.join(out_root, "fresh"), fresh_state, None, name="INIT",
        model_spec=spec,
    )
    fresh_means, fresh_sstd = generated_stats(fresh_dir)

    trained_err = float(np.abs(trained_means - real_means).mean())
    fresh_err = float(np.abs(fresh_means - real_means).mean())

    summary = dict(summary_head or {})
    summary["iters"] = metrics[-1]["iter"]
    summary["wall_seconds"] = round(wall, 1)
    summary["final_stage"] = metrics[-1]["stage"]
    if include_first_loss:
        summary["c_loss_first"] = metrics[0]["c_loss"]
    summary.update({
        "c_loss_last": metrics[-1]["c_loss"],
        "g_loss_last": metrics[-1]["g_loss"],
        "real_channel_means": [round(float(v), 4) for v in real_means],
        "trained_channel_means": [round(float(v), 4) for v in trained_means],
        "fresh_channel_means": [round(float(v), 4) for v in fresh_means],
        "trained_channel_mean_err": round(trained_err, 4),
        "fresh_channel_mean_err": round(fresh_err, 4),
        "real_spatial_std": round(real_sstd, 4),
        "trained_spatial_std": round(trained_sstd, 4),
        "fresh_spatial_std": round(fresh_sstd, 4),
    })
    if hires_improvement is not None:
        summary["hires_swd_improvement"] = hires_improvement
    if expect_evals:
        summary["swd_trajectory"] = evals
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "swd_trajectory"}))

    if plot_title is not None:
        # Curves artifact: losses + SWD trajectory in one PNG (byogan-plot).
        try:
            from byogan_tpu.cli.plot import main as plot_main

            plot_main([
                metrics_path, "-o", os.path.join(out_root, "curves.png"),
                "--title", plot_title,
            ])
        except (Exception, SystemExit) as e:  # plotting must never fail the
            # proof (plot_main exits via SystemExit on a missing file, which
            # plain `except Exception` would NOT catch)
            print(f"curves.png skipped: {e}")

    assert trained_err < fresh_err, (
        f"training did not move generated stats toward the data: "
        f"trained_err={trained_err} vs fresh_err={fresh_err}"
    )
    assert trained_sstd > 0.03, (
        f"mode collapse to near-constant images (spatial std {trained_sstd})"
    )
    shutil.rmtree(os.path.join(out_root, "fresh"), ignore_errors=True)
    print(pass_message)
    return summary
