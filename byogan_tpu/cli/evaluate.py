"""Evaluation CLI (``byogan-eval``) — TPU-native extension, no reference
equivalent.

Computes the multi-scale sliced Wasserstein distance (eval/swd.py) between
N generated samples from a checkpoint and N random real images from a
prepared dataset at the checkpoint's stage resolution, and prints one JSON
line.  Lower is better; values are only comparable across runs of this
implementation (see eval/swd.py docstring).

``--metric msssim`` (or ``both``) adds the mode-collapse readout: mean
pairwise MS-SSIM within the generated set (eval/msssim.py) — near 1.0 means
the generator emits near-identical images — reported beside the REAL set's
own score on the same corpus, which is the healthy anchor (a good model's
diversity approaches the data's).

Truncation defaults to 0.75 — the TRAINING latent distribution (the
reference trains on truncated z at 0.75, train.py:139, a quirk this repo
keeps), so by default the score reflects the distribution the model
actually learned.  Raise it to probe wider latents.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Sliced Wasserstein distance: checkpoint vs dataset"
    )
    parser.add_argument("model", help="checkpoint (ours or reference .pth)")
    parser.add_argument("data", help="dataset root (contains prepared/)")
    parser.add_argument(
        "-n", "--images", default=256, type=int,
        help="images per side (real and fake); more = less noisy",
    )
    parser.add_argument(
        "--batch", default=32, type=int, help="synthesis batch size"
    )
    parser.add_argument(
        "-t", "--truncation", default=0.75, type=float,
        help="latent truncation boundary (default 0.75 = the training "
        "distribution)",
    )
    parser.add_argument(
        "--ema", action="store_true",
        help="evaluate the EMA generator weights",
    )
    parser.add_argument(
        "--patches", default=128, type=int,
        help="descriptor patches per image per pyramid level",
    )
    parser.add_argument(
        "--metric", default="swd", choices=("swd", "msssim", "both"),
        help="swd = distribution distance (lower better); msssim = "
        "mode-collapse diversity readout (generated-set pairwise MS-SSIM, "
        "reported beside the real set's)",
    )
    parser.add_argument(
        "--seed", default=0, type=int,
        help="PRNG seed (real-image choice, patch sites, projections)",
    )
    parser.add_argument(
        "-d", "--device", default=None, type=str,
        help="jax platform to run on (cpu/tpu; default: jax's default)",
    )
    args = parser.parse_args(argv)

    import jax

    from byogan_tpu.core.cache import enable_compilation_cache

    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()
    import numpy as np

    from byogan_tpu.data.pipeline import open_stage_dataset
    from byogan_tpu.eval.swd import sliced_wasserstein_distance
    from byogan_tpu.serve import Sampler

    sampler = Sampler(
        args.model,
        batch=min(args.batch, args.images),
        truncation=args.truncation,
        seed=args.seed,
        use_ema=args.ema,
    )
    resolution = sampler.resolution

    dataset = open_stage_dataset(args.data, sampler.steps)
    rng = np.random.default_rng(args.seed)
    n = args.images
    resampled = len(dataset) < n
    if resampled:
        print(
            f"warning: dataset has {len(dataset)} images < n={n}; sampling "
            "real images WITH replacement — SWD scores are not comparable "
            "to runs on larger datasets (the MS-SSIM real anchor is "
            "computed on the unique images only)",
            file=sys.stderr,
        )
    idx = rng.choice(len(dataset), size=n, replace=resampled)
    real = dataset.get_batch_uint8(np.sort(idx))
    # Float synthesis, NOT the uint8 serving path: the Sampler's uint8
    # frames keep the reference's raw-range save quantization (negative
    # half saturates — PARITY.md), which would structurally bias the
    # comparison against full-range real pixels.  The SWD converts the
    # uint8 reals to the same [-1,1] training range.
    fake = sampler.sample_float(n)

    want_swd = args.metric in ("swd", "both")
    out = {
        "metric": "swd_x1e3" if want_swd else "msssim",
        "resolution": resolution,
        "n_images": n,
        "resampled": resampled,
        "ema": bool(args.ema),
        "truncation": args.truncation,
    }
    if want_swd:  # stable schema — scripts/artifacts parse these keys
        result = sliced_wasserstein_distance(
            real,
            fake,
            jax.random.PRNGKey(args.seed),
            patches_per_image=args.patches,
            min_size=min(16, resolution),
        )
        mean = result.pop(0)
        out["per_level"] = {str(k): round(v, 3) for k, v in result.items()}
        out["mean"] = round(mean, 3)
    if args.metric in ("msssim", "both"):
        from byogan_tpu.eval.msssim import msssim_diversity

        # The real anchor must never contain duplicate images: a duplicated
        # pair scores MS-SSIM 1.0 and inflates the "healthy" diversity
        # baseline the fake score is judged against.  When the dataset is
        # smaller than -n (the with-replacement SWD path above), anchor on
        # ALL unique images instead.
        real_anchor = (
            dataset.get_batch_uint8(np.arange(len(dataset)))
            if resampled else real
        )
        out["msssim_diversity"] = {
            "fake": round(float(msssim_diversity(fake)), 4),
            # Diversity needs >= 2 distinct images; a 1-image dataset has
            # no real anchor (null, not a crash or a fake 1.0).
            "real": (
                round(float(msssim_diversity(real_anchor)), 4)
                if len(real_anchor) >= 2 else None
            ),
            "real_n": int(len(real_anchor)),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
