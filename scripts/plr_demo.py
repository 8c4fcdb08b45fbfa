"""Path-length regularization proof: PLR conditions the w -> image map.

StyleGAN2 §3.2's claim: penalizing the deviation of per-sample path lengths
``||J_w^T y||`` from their running mean pushes the generator toward uniform
scaling of w-space — the conditioning behind its smoother interpolations.
This demo trains the SAME 32-image 16px corpus twice through the production
``train()`` loop:

  * baseline — no generator-side regularizer (the reference-faithful path);
  * plr      — ``plr_weight = 2`` (paper weight), lazy every 4th generator
    iteration.

Evidence recorded in benchmarks/plr/summary.json:

  * both runs learn (convergence_common channel-stat verification);
  * the running mean engages: final pl_ema > 0 and finite;
  * the CONDITIONING claim: per-sample path-length dispersion (std/mean of
    pl over fresh latents, estimator noise averaged over several random
    projections y) is LOWER for the PLR arm than the baseline;
  * the cost: wall seconds for identical schedules, side by side (the TPU
    headline cost is measured separately: BENCH_PLR=2 python bench.py).

CPU-sized by design (channel_divisor=16): the claim is about the w-space
geometry, not resolution.  The reference has no generator regularizer.

Usage:  python scripts/plr_demo.py [out_root]
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
PLR_WEIGHT = 2.0


def path_length_stats(checkpoint: str, n: int = 128, k: int = 4, seed: int = 7):
    """(mean, std, cv) of per-sample path lengths on a trained generator.

    pl_i is estimated with ``k`` independent random projections y per latent
    (single-y estimates are noisy; the ARM COMPARISON only needs the same
    estimator on both sides).  Uses the same VJP machinery as the training
    penalty (losses.gen_path_length_penalty's definition, inlined here so a
    fixed noise buffer can be shared across projections).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.core.random import synthesis_noise, truncated_noise
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(checkpoint)
    params = save["gen_params"]
    steps = save["step"]
    gen = build_generator(ModelSpec.from_dict(save.get("model")))
    kz, kn, ky = jax.random.split(jax.random.PRNGKey(seed), 3)
    z = truncated_noise(kz, n, z_dim_from_params(params), 0.75)
    noise = synthesis_noise(kn, n, steps)
    w = gen.apply({"params": params}, z, method="map_latent")

    def synth(w_):
        return gen.apply(
            {"params": params}, None, noise, steps=steps, alpha=None,
            style=[w_] * steps,
        )

    @jax.jit
    def one_projection(y_key, w_):
        def projection(wv):
            img = synth(wv).astype(jnp.float32)
            h, wd = img.shape[1], img.shape[2]
            y = jax.random.normal(y_key, img.shape, jnp.float32) / jnp.sqrt(
                float(h * wd)
            )
            return jnp.sum(img * y)

        g = jax.grad(projection)(w_).astype(jnp.float32)
        return jnp.sqrt(jnp.sum(jnp.square(g), axis=-1) + 1e-8)

    pls = np.stack([
        np.asarray(one_projection(key, w))
        for key in jax.random.split(ky, k)
    ])
    pl = pls.mean(axis=0)  # average the estimator, per sample
    mean, std = float(pl.mean()), float(pl.std())
    return {
        "pl_mean": round(mean, 4),
        "pl_std": round(std, 4),
        "pl_cv": round(std / mean, 4) if mean > 0 else None,
        "n_latents": n,
        "projections_per_latent": k,
    }


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/plr"
    os.makedirs(out_root, exist_ok=True)

    import jax

    # CPU by choice: the proof is about w-space geometry, and the axon
    # plugin would otherwise force the (shared) TPU chip.
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
        pl_stats = path_length_stats(
            os.path.join(sub, "checkpoints", "FINAL")
        )
        return {
            "learned": {
                "trained_err": summary["trained_channel_mean_err"],
                "fresh_err": summary["fresh_channel_mean_err"],
            },
            "wall_seconds": summary["wall_seconds"],
            "pl_stats": pl_stats,
            "pl_ema_final": (
                train_recs[-1].get("pl_ema") if train_recs else None
            ),
            "pl_ema_trajectory": [
                {"iter": r["iter"], "pl_ema": r["pl_ema"]}
                for r in train_recs[::8] if "pl_ema" in r
            ],
        }

    baseline = run("baseline")
    plr = run("plr", plr_weight=PLR_WEIGHT, plr_interval=4, plr_decay=0.05)

    # ---- the PLR claims ----
    assert plr["pl_ema_final"] is not None and plr["pl_ema_final"] > 0, (
        f"pl_ema never engaged (final {plr['pl_ema_final']})"
    )
    cv_base = baseline["pl_stats"]["pl_cv"]
    cv_plr = plr["pl_stats"]["pl_cv"]
    assert cv_plr < cv_base, (
        f"PLR did not tighten path-length dispersion: cv {cv_plr} vs "
        f"baseline {cv_base}"
    )

    summary = {
        "corpus": "32 synthetic images, 4px -> 16px (3 stages), 400 iters",
        "plr_weight": PLR_WEIGHT,
        "baseline": baseline,
        "plr": plr,
    }
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({
        "pl_cv_baseline": cv_base,
        "pl_cv_plr": cv_plr,
        "pl_mean_baseline": baseline["pl_stats"]["pl_mean"],
        "pl_mean_plr": plr["pl_stats"]["pl_mean"],
        "pl_ema_final": plr["pl_ema_final"],
        "wall_baseline_s": baseline["wall_seconds"],
        "wall_plr_s": plr["wall_seconds"],
    }))
    print("PLR DEMO PASSED")


if __name__ == "__main__":
    main()
