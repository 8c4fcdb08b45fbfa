"""High-resolution convergence proof on the real TPU chip (VERDICT r2 #2).

Round 2's committed proof (scripts/tpu_convergence.py, benchmarks/
convergence/) stops at stage 4 (32px).  This sibling pushes the SAME
production path — prep pyramid -> train() -> checkpoints/grids/SWD evals —
through a 6-stage progressive schedule (4px -> 128px), so the evidence now
covers the 64px and 128px stages *learning*, fade-in buckets included
(each stage after the first enters through its fade bucket; the
metrics.jsonl stage/iter fields plus the per-stage SWD trajectory make the
within-stage improvement checkable).

Beyond tpu_convergence.py's checks, this asserts the SWD actually IMPROVES
WITHIN each high-resolution stage: for stages >= 5 the best in-stage SWD
(raw or EMA) must beat the stage's first reading (convergence_common.py,
swd_stage_min).

Artifacts land in benchmarks/convergence_hires/ (metrics.jsonl, s-*.png
grids at up to 128px, summary.json, curves.png).

Usage:  python scripts/tpu_convergence_hires.py [out_root]
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

N_STAGES = 6
FINAL_SIZE = 4 * 2 ** (N_STAGES - 1)  # 128


def main() -> None:
    out_root = (
        sys.argv[1] if len(sys.argv) > 1 else "benchmarks/convergence_hires"
    )
    os.makedirs(out_root, exist_ok=True)

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from byogan_tpu.train.config import TrainConfig

    data = prepare_data(out_root, n_images=256, size=FINAL_SIZE, seed=3)
    verify_only, resume_from = resolve_run_state(out_root, allow_resume=True)

    config = TrainConfig(
        data=data,
        # 4 batches/epoch at 64-batch stages, 8 at the 32-batch stage 6:
        # stages 1-4 get 120-160 iters (they are proven at length by the
        # 32px artifact); the budget concentrates on stages 5-6
        # (320 and 800 iters).
        batch_progression=(64, 64, 64, 64, 64, 32),
        epoch_progression=(30, 30, 30, 40, 80, 100),
        display_step=160,
        checkpoint_step=800,
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
        summary_head={"schedule": "4px -> 128px (6 stages)"},
        swd_stage_min=5,
        plot_title="tpu_convergence_hires (4px->128px, one v5e chip)",
        pass_message="HI-RES CONVERGENCE RUN PASSED",
    )


if __name__ == "__main__":
    main()
