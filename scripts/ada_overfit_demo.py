"""Small-dataset ADA proof: augmentation suppresses critic overfit.

StyleGAN2-ADA's premise: on a small corpus the critic memorizes the reals —
its overfit heuristic r_t = E[sign(D(real))] drifts toward +1 and the
training signal degrades.  This demo trains the SAME 32-image 16px corpus
twice through the production ``train()`` loop:

  * baseline — no augmentation (the reference-faithful path);
  * ada      — ``ada_target = 0.6``: the on-device controller raises the
    augmentation probability until r_t stops exceeding the target.

Evidence recorded in benchmarks/ada/summary.json (r_t and aug_p ride in
metrics.jsonl via the loop's window extras):

  * both runs learn (convergence_common channel-stat verification);
  * the controller engages: final aug_p well off its 0 start;
  * overfit is suppressed: the ada run's late-phase mean r_t sits below the
    baseline's (which shoots past the target on 32 images).

CPU-sized by design (channel_divisor=16): the claim is about the CONTROLLER
and the loss statistics, not resolution.  The reference has no augmentation
at all beyond the loader's 50% x-flip (train.py:44).

Usage:  python scripts/ada_overfit_demo.py [out_root]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convergence_common import (  # noqa: E402
    prepare_data,
    resolve_run_state,
    run_and_verify,
)

N_STAGES = 3
ADA_TARGET = 0.6


def _tail_mean(records, key, frac=0.25):
    vals = [r[key] for r in records if key in r]
    if not vals:
        return None
    tail = vals[int(len(vals) * (1.0 - frac)):]
    return sum(tail) / len(tail)


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/ada"
    os.makedirs(out_root, exist_ok=True)

    import jax

    # CPU by choice: the proof is about loss statistics, and the axon plugin
    # would otherwise force the (shared) TPU chip.
    jax.config.update("jax_platforms", "cpu")

    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.metrics import read_metrics

    data = prepare_data(out_root, n_images=32, size=16, seed=11)

    def run(name: str, **overrides):
        sub = os.path.join(out_root, name)
        os.makedirs(sub, exist_ok=True)
        verify_only, _ = resolve_run_state(sub, allow_resume=False)
        config = TrainConfig(
            data=data,
            batch_progression=(8, 8, 8),
            epoch_progression=(25, 25, 50),  # 4 batches/epoch -> 400 iters
            channel_divisor=16,
            mapping_depth=4,
            display_step=200,
            checkpoint_step=400,
            refresh_stat_step=5,
            eval_step=50,
            eval_images=32,
            seed=23,
            checkpoint_dir=os.path.join(sub, "checkpoints"),
            output_dir=os.path.join(sub, "output"),
            **overrides,
        )
        summary = run_and_verify(
            sub, config, N_STAGES,
            verify_only=verify_only,
            summary_head={"run": name},
            pass_message=f"{name.upper()} RUN LEARNED",
        )
        records = read_metrics(os.path.join(sub, "output", "metrics.jsonl"))
        train_recs = [r for r in records if "c_loss" in r]
        evals = [r for r in records if r.get("kind") == "eval"]
        stage_final = [r for r in train_recs if r["stage"] == N_STAGES]
        return {
            "learned": {
                "trained_err": summary["trained_channel_mean_err"],
                "fresh_err": summary["fresh_channel_mean_err"],
            },
            "rt_tail_mean": _tail_mean(stage_final, "rt"),
            "aug_p_final": (
                stage_final[-1].get("aug_p") if stage_final else None
            ),
            "rt_trajectory": [
                {"iter": r["iter"], "rt": r.get("rt"),
                 **({"aug_p": r["aug_p"]} if "aug_p" in r else {})}
                for r in train_recs[::4]
            ],
            "final_stage_swd": [
                {"iter": r["iter"], "swd": r["swd"]}
                for r in evals if r["stage"] == N_STAGES
            ],
        }

    baseline = run("baseline")
    ada = run("ada", ada_target=ADA_TARGET, ada_speed=1600)

    # ---- the ADA claims ----
    assert ada["aug_p_final"] is not None and ada["aug_p_final"] > 0.05, (
        f"controller never engaged: final aug_p {ada['aug_p_final']}"
    )
    assert ada["rt_tail_mean"] < baseline["rt_tail_mean"], (
        "augmentation did not suppress critic overfit: late-phase r_t "
        f"ada={ada['rt_tail_mean']:.3f} vs baseline={baseline['rt_tail_mean']:.3f}"
    )

    summary = {
        "corpus": "32 synthetic images, 4px -> 16px (3 stages), 400 iters",
        "ada_target": ADA_TARGET,
        "baseline": baseline,
        "ada": ada,
    }
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({
        "baseline_rt_tail": round(baseline["rt_tail_mean"], 3),
        "ada_rt_tail": round(ada["rt_tail_mean"], 3),
        "ada_final_p": round(ada["aug_p_final"], 3),
    }))
    print("ADA OVERFIT DEMO PASSED")


if __name__ == "__main__":
    main()
