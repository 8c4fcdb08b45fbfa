"""Run the FULL 8-stage progressive schedule (4px -> 512px) to completion.

The reference's author was "unable to run my program to completion" on the
hardware they had (reference README.md:70) — the qualitative 512px faces
grid came from a partial run.  This script drives THIS framework's
production ``train()`` through the entire 8-stage schedule on one TPU chip:
every stage's fade + stable buckets, periodic SWD evals, EMA shadow,
checkpoints, sample grids up to 512px — and asserts the model is learning
within every stage >= 5 (64px+), exactly like the hires proof
(scripts/tpu_convergence_hires.py) but to the top of the pyramid.

Budget: a 256-image synthetic corpus, ~2.4k iterations, dominated by the
512px stage; compute fits in minutes on the chip (see per-record img/s in
metrics.jsonl) with compiles amortised by the persistent cache.

Artifacts land in benchmarks/full_schedule/ (metrics.jsonl, s-*.png up to
512px, summary.json, curves.png).

Usage:  python scripts/tpu_full_schedule.py [out_root]
Env:    BYOGAN_CONV_VERIFY_ONLY=1 re-verifies an existing finished run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_convergence import channel_stats, generated_stats  # noqa: E402

N_STAGES = 8
FINAL_SIZE = 4 * 2 ** (N_STAGES - 1)  # 512


def main() -> None:
    out_root = (
        sys.argv[1] if len(sys.argv) > 1 else "benchmarks/full_schedule"
    )
    os.makedirs(out_root, exist_ok=True)

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from byogan_tpu.data.pipeline import StageDataset
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import train

    data = os.path.join(out_root, "data")
    if not os.path.isdir(os.path.join(data, "prepared")):
        write_synthetic_dataset(data, n_images=256, size=FINAL_SIZE, seed=5)
        prepare_pyramid(data, 4, FINAL_SIZE)
    verify_only = os.environ.get("BYOGAN_CONV_VERIFY_ONLY") == "1" and (
        os.path.isdir(os.path.join(out_root, "checkpoints", "FINAL"))
    )
    resume_from = None
    if not verify_only:
        from byogan_tpu.train.checkpoint import latest_checkpoint

        if not os.path.isdir(os.path.join(out_root, "checkpoints", "FINAL")):
            resume_from = latest_checkpoint(os.path.join(out_root, "checkpoints"))
        if resume_from:
            print(f"auto-resuming preempted run from {resume_from}")
        else:
            for stale in ("checkpoints", "output"):
                shutil.rmtree(os.path.join(out_root, stale), ignore_errors=True)

    config = TrainConfig(
        data=data,
        # 256-image corpus.  Stages 1-4 are proven at length by the 32px
        # artifact (benchmarks/convergence/); the budget concentrates on the
        # top of the pyramid: 200/480/400/960 iters at 64/128/256/512px.
        batch_progression=(64, 64, 64, 64, 64, 32, 32, 8),
        epoch_progression=(20, 20, 20, 30, 50, 60, 50, 30),
        display_step=240,
        checkpoint_step=1200,
        refresh_stat_step=10,
        seed=11,
        ema_beta=0.999,
        eval_step=80,
        eval_images=64,
        checkpoint_dir=os.path.join(out_root, "checkpoints"),
        output_dir=os.path.join(out_root, "output"),
    )

    t0 = time.time()
    if not verify_only:
        train(config, checkpoint=resume_from)
        wall = time.time() - t0
    else:
        try:
            with open(os.path.join(out_root, "summary.json")) as f:
                wall = json.load(f)["wall_seconds"]
        except (OSError, KeyError, ValueError):
            wall = 0.0

    # ---- verify the run learned, including WITHIN the hi-res stages ----
    from byogan_tpu.train.metrics import read_metrics

    metrics_path = os.path.join(config.output_dir, "metrics.jsonl")
    all_records = read_metrics(metrics_path)
    metrics = [r for r in all_records if "c_loss" in r]
    evals = [r for r in all_records if r.get("kind") == "eval"]
    assert metrics and evals
    for rec in metrics:
        assert np.isfinite(rec["c_loss"]) and np.isfinite(rec["g_loss"]), rec
    for rec in evals:
        assert np.isfinite(rec["swd"]) and np.isfinite(rec["swd_ema"]), rec
    assert metrics[-1]["stage"] == N_STAGES, "did not reach 512px"

    swd_by_stage = {}
    for rec in evals:
        swd_by_stage.setdefault(rec["stage"], []).append(rec)
    hires_improvement = {}
    for stage in sorted(swd_by_stage):
        if stage < 5:
            continue
        recs = swd_by_stage[stage]
        assert len(recs) >= 3, f"stage {stage}: too few SWD readings"
        first = min(recs[0]["swd"], recs[0]["swd_ema"])
        best = min(min(r["swd"], r["swd_ema"]) for r in recs[1:])
        hires_improvement[stage] = {
            "first": round(first, 2),
            "best_later": round(best, 2),
            "n_evals": len(recs),
        }
        assert best < first, (
            f"stage {stage} SWD never improved within the stage: "
            f"first={first} best_later={best}"
        )

    ds = StageDataset(data, N_STAGES)
    real = ds.get_batch_uint8(np.arange(64)).astype(np.float32) / 255.0
    real_means, real_sstd = channel_stats(real)

    final = os.path.join(config.checkpoint_dir, "FINAL")
    trained_means, trained_sstd = generated_stats(final)

    from byogan_tpu.models.factory import build_critic, build_generator
    from byogan_tpu.train.checkpoint import save_checkpoint
    from byogan_tpu.train.loop import model_spec
    from byogan_tpu.train.state import create_train_state

    spec = model_spec(config)
    fresh_state = create_train_state(
        config, build_generator(spec), build_critic(spec)
    ).replace(stage=N_STAGES)
    fresh_dir = save_checkpoint(
        os.path.join(out_root, "fresh"), fresh_state, None, name="INIT",
        model_spec=spec,
    )
    fresh_means, fresh_sstd = generated_stats(fresh_dir)

    trained_err = float(np.abs(trained_means - real_means).mean())
    fresh_err = float(np.abs(fresh_means - real_means).mean())

    summary = {
        "schedule": "4px -> 512px (FULL 8-stage reference schedule shape)",
        "iters": metrics[-1]["iter"],
        "wall_seconds": round(wall, 1),
        "final_stage": metrics[-1]["stage"],
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
        "hires_swd_improvement": hires_improvement,
        "swd_trajectory": evals,
    }
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "swd_trajectory"}))

    try:
        from byogan_tpu.cli.plot import main as plot_main

        plot_main([
            metrics_path, "-o", os.path.join(out_root, "curves.png"),
            "--title", "tpu_full_schedule (4px->512px, one v5e chip)",
        ])
    except (Exception, SystemExit) as e:
        print(f"curves.png skipped: {e}")

    assert trained_err < fresh_err, (
        f"training did not move generated stats toward the data: "
        f"trained_err={trained_err} vs fresh_err={fresh_err}"
    )
    assert trained_sstd > 0.03, (
        f"mode collapse to near-constant images (spatial std {trained_sstd})"
    )
    shutil.rmtree(os.path.join(out_root, "fresh"), ignore_errors=True)
    print("FULL-SCHEDULE RUN PASSED (4px -> 512px)")


if __name__ == "__main__":
    main()
