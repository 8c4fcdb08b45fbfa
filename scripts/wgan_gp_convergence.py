"""End-to-end WGAN-GP training proof (VERDICT r2 missing #3).

The reference's WGAN-GP path is BROKEN as written — ``Critic.get_wgan_loss``
references an undefined ``self.device`` (gan.py:368) and an undefined
``fake_im`` (gan.py:372), so it NameErrors if ever called; ours
(train/losses.py) claims to be the working one, oracle-tested against a
repaired torch transcription (tests/test_losses.py:26-82) and stepped once in
tests/test_train_step.py.  This script backs that claim with an actual RUN:
a 2-stage progressive schedule (4px -> 8px, several hundred iterations) with
``use_r1=False`` through the production ``train()`` loop, then the same
learning-signal verification as the other proofs (convergence_common.py):

  * every loss record finite (Wasserstein estimates swing negative by
    design — finiteness, not sign, is the health check);
  * generated channel statistics move toward the data distribution and away
    from the fresh-init generator's;
  * no mode collapse (per-image spatial std).

Tiny widths (channel_divisor=16) keep it CPU-sized: the point is the LOSS
PATH's trajectory, not resolution (scripts/tpu_convergence.py covers scale).
Artifacts land in benchmarks/wgan_gp/: metrics.jsonl, sample grids,
summary.json.

Usage:  python scripts/wgan_gp_convergence.py [out_root]
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

N_STAGES = 2


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/wgan_gp"
    os.makedirs(out_root, exist_ok=True)

    import jax

    # CPU by choice: this proof is about the use_r1=False loss path, and the
    # axon plugin would otherwise force the (shared) TPU chip.
    jax.config.update("jax_platforms", "cpu")

    from byogan_tpu.train.config import TrainConfig

    data = prepare_data(out_root, n_images=256, size=8, seed=5)
    verify_only, _ = resolve_run_state(out_root, allow_resume=False)

    config = TrainConfig(
        data=data,
        use_r1=False,  # <- the WGAN-GP branch (reference gan.py:357-391)
        batch_progression=(32, 32),
        epoch_progression=(40, 40),  # 8 batches/epoch -> 640 iters total
        channel_divisor=16,
        mapping_depth=4,
        display_step=160,
        checkpoint_step=320,
        refresh_stat_step=10,
        seed=17,
        checkpoint_dir=os.path.join(out_root, "checkpoints"),
        output_dir=os.path.join(out_root, "output"),
    )
    run_and_verify(
        out_root, config, N_STAGES,
        verify_only=verify_only,
        summary_head={"loss": "wgan-gp (use_r1=False)"},
        include_first_loss=True,
        expect_evals=False,
        pass_message="WGAN-GP CONVERGENCE RUN PASSED",
    )


if __name__ == "__main__":
    main()
