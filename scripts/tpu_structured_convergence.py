"""Structure-resolving convergence proof at 128px (VERDICT r3 next-round #2).

The round-3 high-resolution proofs trained on an UNSTRUCTURED synthetic
corpus (free-floating circles over sinusoids) where the top-stage SWD gains
were ~1-6% — within the eval cadence's noise — and the main learning signal
was channel-mean error.  This proof closes the one axis where the reference
still had something this repo lacked (recognizably structured samples,
/root/reference/README.md:76 faces.png):

  * corpus: face-like parameterized geometry with CONSISTENT layout
    statistics (data/synthetic.write_structured_dataset) — head / hair /
    eyes / mouth with per-image color+position jitter, so high-frequency
    structure is actually learnable at 64/128px;
  * schedule: 6 stages (4px -> 128px), budget concentrated on stages 5-6;
  * assertion: stages 5 and 6 must drop their in-stage SWD by a REAL
    margin (>= 20% from the stage's first reading, > 6 evals per stage —
    not the jitter-passable best<first of the old check);
  * artifact: real_grid.png / gen_grid.png / compare.png — 25 real corpus
    images next to 25 EMA samples at 128px, same [0,1] rendering.

Artifacts land in benchmarks/convergence_structured/.

Usage:  python scripts/tpu_structured_convergence.py [out_root]
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

N_STAGES = 6
FINAL_SIZE = 4 * 2 ** (N_STAGES - 1)  # 128


def main() -> None:
    out_root = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "benchmarks/convergence_structured"
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
        # 256-image corpus: 4 batches/epoch at the 64-batch stages, 8 at
        # the 32-batch stage 6.  Stages 1-4 are warm-up (the 32px proof
        # already covers them at length); stages 5 (64px, 600 iters) and 6
        # (128px, 2000 iters) carry the structure-resolution claim.
        batch_progression=(64, 64, 64, 64, 64, 32),
        epoch_progression=(30, 30, 30, 40, 150, 250),
        display_step=200,
        checkpoint_step=1000,
        refresh_stat_step=10,
        seed=23,
        ema_beta=0.999,
        eval_step=80,  # stage 5: ~7 evals, stage 6: ~25 evals
        eval_images=64,
        checkpoint_dir=os.path.join(out_root, "checkpoints"),
        output_dir=os.path.join(out_root, "output"),
    )
    run_and_verify(
        out_root, config, N_STAGES,
        verify_only=verify_only,
        resume_from=resume_from,
        summary_head={
            "schedule": "4px -> 128px (6 stages), structured face corpus"
        },
        swd_stage_min=5,
        swd_min_drop=0.20,
        swd_min_evals=7,
        require_final_stage=True,
        plot_title="tpu_structured_convergence (4px->128px, one chip)",
        pass_message="STRUCTURED CONVERGENCE RUN PASSED",
    )
    grids = write_compare_grids(
        out_root, data, N_STAGES,
        os.path.join(out_root, "checkpoints", "FINAL"),
    )
    print(f"compare grids written (ema={grids['ema']}, n={grids['n']})")


if __name__ == "__main__":
    main()
