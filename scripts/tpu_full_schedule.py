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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_common import (  # noqa: E402
    prepare_data,
    resolve_run_state,
    run_and_verify,
)

N_STAGES = 8
FINAL_SIZE = 4 * 2 ** (N_STAGES - 1)  # 512


def main() -> None:
    out_root = (
        sys.argv[1] if len(sys.argv) > 1 else "benchmarks/full_schedule"
    )
    os.makedirs(out_root, exist_ok=True)

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from byogan_tpu.train.config import TrainConfig

    data = prepare_data(out_root, n_images=256, size=FINAL_SIZE, seed=5)
    verify_only, resume_from = resolve_run_state(out_root, allow_resume=True)

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
    run_and_verify(
        out_root, config, N_STAGES,
        verify_only=verify_only,
        resume_from=resume_from,
        summary_head={
            "schedule": "4px -> 512px (FULL 8-stage reference schedule shape)"
        },
        swd_stage_min=5,
        require_final_stage=True,
        plot_title="tpu_full_schedule (4px->512px, one v5e chip)",
        pass_message="FULL-SCHEDULE RUN PASSED (4px -> 512px)",
    )


if __name__ == "__main__":
    main()
