"""EMA + SWD demonstration on the real TPU chip.

Round-2 extensions proof: runs a short REAL progressive schedule (4px ->
16px) with the EMA generator shadow enabled (config.ema_beta) through the
exact production path, then scores sample quality with the SWD metric
(byogan_tpu/eval/swd.py) — on the same chip — for three parameter sets:

  * the trained live generator,
  * its EMA shadow,
  * a fresh-init generator (the control).

Validates, on hardware, that (a) the EMA shadow trains/checkpoints/samples
end-to-end, and (b) SWD discriminates trained from untrained generators
(trained << fresh), i.e. the metric actually tracks quality.  EMA-vs-live
ordering is recorded but not asserted — on a run this short the shadow lags
the live weights by construction and either may score better.

Artifacts land in benchmarks/eval/: summary.json.

Usage:  python scripts/tpu_ema_swd_demo.py [out_root]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def swd_for_params(gen_params, spec, steps, real_u8, seed=7):
    """SWD between real uint8 images and n fresh samples from gen_params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.core.random import synthesis_noise, truncated_noise
    from byogan_tpu.eval.swd import sliced_wasserstein_distance
    from byogan_tpu.models.factory import build_generator, z_dim_from_params

    n = real_u8.shape[0]
    gen = build_generator(spec)
    kz, kn = jax.random.split(jax.random.PRNGKey(seed))
    # The TRAINING latent distribution (the reference trains on truncated
    # z at 0.75, steps.py/train.py:139) — scoring with wider z probes
    # latents the model never saw and inflates the trained score.
    z = truncated_noise(kz, n, z_dim_from_params(gen_params), 0.75)
    noise = synthesis_noise(kn, n, steps)
    fake = gen.apply({"params": gen_params}, z, noise, steps=steps, alpha=None)
    # real pixels to the training range [-1,1]; fakes are already there
    from byogan_tpu.core.grids import uint8_to_training_range

    real = jnp.asarray(uint8_to_training_range(real_u8))
    return sliced_wasserstein_distance(
        real, jnp.asarray(fake, jnp.float32), jax.random.PRNGKey(seed + 1),
        patches_per_image=64, min_size=8,
    )


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/eval"
    os.makedirs(out_root, exist_ok=True)

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from byogan_tpu.data.pipeline import StageDataset
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.models.factory import build_critic, build_generator
    from byogan_tpu.train.checkpoint import load_checkpoint
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import model_spec, train
    from byogan_tpu.train.state import create_train_state

    data = os.path.join(out_root, "data")
    if not os.path.isdir(os.path.join(data, "prepared")):
        write_synthetic_dataset(data, n_images=256, size=16, seed=3)
        prepare_pyramid(data, 4, 16)
    # Re-score an existing completed run without retraining.
    score_only = os.environ.get("BYOGAN_EVAL_SCORE_ONLY") == "1" and (
        os.path.isdir(os.path.join(out_root, "checkpoints", "FINAL"))
    )
    if not score_only:
        for stale in ("checkpoints", "output"):
            shutil.rmtree(os.path.join(out_root, stale), ignore_errors=True)

    config = TrainConfig(
        data=data,
        batch_progression=(64, 64, 64),
        epoch_progression=(80, 80, 80),
        display_step=160,
        checkpoint_step=960,
        refresh_stat_step=10,
        seed=11,
        ema_beta=0.99,
        eval_step=160,  # periodic SWD readout -> metrics.jsonl trajectory
        eval_images=64,
        checkpoint_dir=os.path.join(out_root, "checkpoints"),
        output_dir=os.path.join(out_root, "output"),
    )

    t0 = time.time()
    if not score_only:
        train(config)
        wall = time.time() - t0
    else:
        try:
            with open(os.path.join(out_root, "summary.json")) as f:
                wall = json.load(f)["wall_seconds"]
        except (OSError, KeyError, ValueError):
            wall = 0.0

    save = load_checkpoint(os.path.join(config.checkpoint_dir, "FINAL"))
    assert save["gen_ema"] is not None, "FINAL checkpoint lost the EMA shadow"
    spec = model_spec(config)
    steps = save["step"]

    real = StageDataset(data, steps).get_batch_uint8(np.arange(256))
    fresh = create_train_state(
        config, build_generator(spec), build_critic(spec)
    ).gen_params

    scores = {
        "live": swd_for_params(save["gen_params"], spec, steps, real),
        "ema": swd_for_params(save["gen_ema"], spec, steps, real),
        "fresh": swd_for_params(fresh, spec, steps, real),
    }
    # Periodic in-training SWD readouts (eval_step): the quality trajectory.
    from byogan_tpu.train.metrics import read_metrics

    metrics_path = os.path.join(config.output_dir, "metrics.jsonl")
    trajectory = (
        read_metrics(metrics_path, kind="eval")
        if os.path.exists(metrics_path)
        else []
    )

    summary = {
        "iters": save["iter"],
        "wall_seconds": round(wall, 1),
        "resolution": 4 * 2 ** (steps - 1),
        "ema_beta": config.ema_beta,
        "swd_x1e3": {
            name: {str(k): round(v, 2) for k, v in res.items()}
            for name, res in scores.items()
        },
        "swd_trajectory": trajectory,
    }
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))

    for name in ("live", "ema"):
        assert scores[name][0] < scores["fresh"][0], (
            f"SWD does not separate trained ({name}: {scores[name][0]:.1f}) "
            f"from fresh-init ({scores['fresh'][0]:.1f})"
        )
    print("EMA+SWD DEMO PASSED")


if __name__ == "__main__":
    main()
