"""PLR quality readout: does path-length regularization help inversion?
(VERDICT r4 next-round #6.)

benchmarks/plr/ proved PLR's mechanics and cost (the penalty engages, the
path-length CV tightens, headline throughput unchanged) but no artifact
showed the StyleGAN2 paper's claimed BENEFIT — a smoother W space that is
easier to invert (Karras et al. 2020 §3.2 report "noticeably easier" W
projection under PLR).  This experiment measures exactly that axis:

  * corpus: ONE structured face corpus split disjointly — 64 TRAIN images
    and 64 HELD-OUT images (inversion targets the models never saw);
  * arms (same seed, same budget, production ``train()``):
      - baseline — no generator regularizer (reference-faithful);
      - plr      — plr_weight > 0, default lazy interval;
  * readout: project every held-out image into each arm's FINAL generator
    (projector.project — Adam over w inside one lax.scan) and compare
    per-image reconstruction MSE, both single-w (the model's natural
    manifold — the paper's claim) and w-plus (the editing workhorse).

Honest measurement, not a forced win: asserts cover mechanics (both arms
learn, PLR engages, inversions converge); the comparison is RECORDED in
summary.json (``conclusion`` + per-arm errors + inversion_mse.png),
whichever way it lands.

Runs on the real chip (full-width model at 32px).
Usage:  python scripts/plr_quality.py [out_root]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from limited_data_common import (  # noqa: E402
    dump_summary,
    prepare_split_data,
    run_arm,
)

N_STAGES = 4  # 32px
SIZE = 4 * 2 ** (N_STAGES - 1)
N_TRAIN = 64
N_HELDOUT = 64
PLR_WEIGHT = 2.0


def _invert(checkpoint_dir: str, targets: np.ndarray, w_plus: bool) -> dict:
    """Project ``targets`` (uint8 NHWC) into the FINAL generator; return
    per-image reconstruction MSE stats (training-range [-1,1] pixels)."""
    from byogan_tpu.core.grids import uint8_to_training_range
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.projector import project
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(os.path.join(checkpoint_dir, "FINAL"))
    gen = build_generator(ModelSpec.from_dict(save.get("model")))
    params = {"params": save["gen_params"]}
    target_f = uint8_to_training_range(targets)
    result = project(
        gen, params, target_f, steps=int(save["step"]),
        z_dim=z_dim_from_params(save["gen_params"]),
        n_iters=400, w_plus=w_plus,
    )
    per_image = np.mean(
        np.square(np.asarray(result.image) - np.asarray(target_f)),
        axis=(1, 2, 3),
    )
    losses = np.asarray(result.losses)
    assert np.all(np.isfinite(per_image)), "non-finite inversion error"
    assert losses[-1] < losses[0], "inversion did not converge"
    return {
        "mse_mean": round(float(per_image.mean()), 6),
        "mse_median": round(float(np.median(per_image)), 6),
        "mse_p90": round(float(np.percentile(per_image, 90)), 6),
        "loss_first": round(float(losses[0]), 5),
        "loss_last": round(float(losses[-1]), 5),
        "per_image_mse": [round(float(v), 6) for v in per_image],
    }


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/plr_quality"
    os.makedirs(out_root, exist_ok=True)

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    paths = prepare_split_data(
        out_root, n_train=N_TRAIN, n_heldout=N_HELDOUT, size=SIZE, seed=47
    )

    base_kwargs = dict(
        batch_progression=(16, 16, 16, 16),
        epoch_progression=(25, 25, 50, 400),  # 4 b/e -> 1600 stage-4 iters
        display_step=400,
        checkpoint_step=100000,  # only FINAL matters here
        refresh_stat_step=5,
        eval_step=0,
        seed=23,
        ema_beta=0.0,
    )
    arms = {
        "baseline": {},
        "plr": {"plr_weight": PLR_WEIGHT},
    }

    from byogan_tpu.data.pipeline import open_stage_dataset
    from byogan_tpu.train.metrics import read_metrics

    heldout = open_stage_dataset(paths["heldout"], N_STAGES)
    targets = heldout.get_batch_uint8(np.arange(min(N_HELDOUT, len(heldout))))

    results = {}
    for name, extra in arms.items():
        info = run_arm(
            out_root, name, paths["train"], N_STAGES,
            {**base_kwargs, **extra},
        )
        recs = read_metrics(os.path.join(info["output"], "metrics.jsonl"))
        train_recs = [r for r in recs if "c_loss" in r]
        assert train_recs and np.isfinite(train_recs[-1]["g_loss"])
        if name == "plr":
            # Engagement readout: pl_ema (the running path-length mean) is
            # carried in every train record and only moves on penalized
            # iterations — a flat/zero trajectory means the penalty never
            # ran.  (pl_penalty itself is also logged since round 5.)
            emas = [r["pl_ema"] for r in train_recs if "pl_ema" in r]
            assert emas and max(emas) > 0 and min(emas) != max(emas), (
                "PLR never engaged (pl_ema flat)"
            )
        results[name] = {
            "w": _invert(info["checkpoints"], targets, w_plus=False),
            "w_plus": _invert(info["checkpoints"], targets, w_plus=True),
        }

    ratios = {
        space: round(
            results["plr"][space]["mse_mean"]
            / results["baseline"][space]["mse_mean"], 4,
        )
        for space in ("w", "w_plus")
    }
    if ratios["w"] < 1.0:
        conclusion = (
            f"PLR makes held-out inversion easier: single-w reconstruction "
            f"MSE {results['plr']['w']['mse_mean']} vs baseline "
            f"{results['baseline']['w']['mse_mean']} "
            f"({(1 - ratios['w']):.0%} lower; w+ ratio {ratios['w_plus']})"
        )
    else:
        conclusion = (
            f"honest negative: PLR did not lower held-out single-w "
            f"inversion MSE ({results['plr']['w']['mse_mean']} vs baseline "
            f"{results['baseline']['w']['mse_mean']}, ratio {ratios['w']}; "
            f"w+ ratio {ratios['w_plus']})"
        )

    # Per-image scatter: baseline MSE vs PLR MSE, one point per held-out
    # image (below the diagonal = PLR inverts that image better).
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4.2))
    for ax, space in zip(axes, ("w", "w_plus")):
        b = results["baseline"][space]["per_image_mse"]
        p = results["plr"][space]["per_image_mse"]
        lim = max(max(b), max(p)) * 1.05
        ax.scatter(b, p, s=14, alpha=0.7)
        ax.plot([0, lim], [0, lim], ls="--", lw=1.0, color="gray")
        ax.set_xlabel("baseline inversion MSE")
        ax.set_ylabel("PLR inversion MSE")
        ax.set_title(f"{space} (below diagonal = PLR better)")
        ax.grid(alpha=0.25)
    fig.suptitle(
        f"Held-out inversion error, {N_HELDOUT} images @{SIZE}px "
        f"(plr_weight={PLR_WEIGHT})"
    )
    fig.tight_layout()
    fig.savefig(os.path.join(out_root, "inversion_mse.png"), dpi=120)
    plt.close(fig)

    summary = {
        "regime": (
            f"{N_TRAIN} train / {N_HELDOUT} held-out structured images, "
            f"4px->{SIZE}px, same seed/budget per arm; inversion: 400 Adam "
            f"iters over w (projector.py), mean-w init"
        ),
        "conclusion": conclusion,
        "plr_vs_baseline_mse_ratio": ratios,
        "results": results,
    }
    dump_summary(
        out_root, summary, ["conclusion", "plr_vs_baseline_mse_ratio"]
    )
    print("PLR QUALITY READOUT COMPLETE")


if __name__ == "__main__":
    main()
