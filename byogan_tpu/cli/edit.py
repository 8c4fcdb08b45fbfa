"""Edit-sheet CLI (``byogan-edit``) — TPU-native extension, no reference
equivalent.

Derives unsupervised SeFa edit directions from a checkpoint's style
weights (editing.py) and renders a sheet: one row per sample, one column
per coefficient along the chosen direction.  Start from random samples, or
from a projected latent (``--w`` pointing at a byogan-project ``*-w.npy``).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="SeFa edit sheet along an unsupervised W direction"
    )
    parser.add_argument("checkpoint", help="checkpoint (ours or .pth)")
    parser.add_argument(
        "-o", "--output", default="edit.png", help="output sheet PNG"
    )
    parser.add_argument(
        "-i", "--direction", default=0, type=int,
        help="direction index (0 = strongest eigenvalue)",
    )
    parser.add_argument(
        "-r", "--rows", default=3, type=int, help="samples (rows)"
    )
    parser.add_argument(
        "--range", dest="span", default=3.0, type=float,
        help="walk from -RANGE to +RANGE along the direction",
    )
    parser.add_argument(
        "--steps", dest="ncols", default=7, type=int,
        help="columns (coefficients, inclusive endpoints)",
    )
    parser.add_argument(
        "--stages", default=None,
        help="comma-separated stage indices to restrict BOTH the "
        "factorization and the edit to (e.g. '0,1' = coarse)",
    )
    parser.add_argument(
        "--w", default=None,
        help="start from this .npy w (byogan-project output) instead of "
        "random samples; implies one row",
    )
    parser.add_argument(
        "-t", "--truncation", default=0.75, type=float,
        help="z truncation for random starting samples",
    )
    parser.add_argument(
        "--ema", action="store_true",
        help="use the EMA generator weights (runs with ema_beta > 0)",
    )
    parser.add_argument("--seed", default=0, type=int)
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
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.core.grids import save_image_grid
    from byogan_tpu.core.random import truncated_noise
    from byogan_tpu.editing import edit_sheet, sefa_directions
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(args.checkpoint)
    if args.ema:
        if save.get("gen_ema") is None:
            raise SystemExit(
                f"--ema: {args.checkpoint} carries no EMA weights "
                "(train with ema_beta > 0)"
            )
        save["gen_params"] = save["gen_ema"]
    steps, alpha = save["step"], save["alpha"]
    # Factorize only the TRAINED stages: every checkpoint carries all 8
    # stages' parameters from init (models/generator.py), and the ones
    # beyond `step` are random init — including them would contaminate the
    # eigendecomposition with noise directions.
    stages = (
        list(range(steps))
        if args.stages is None
        else [int(s) for s in args.stages.split(",")]
    )
    if any(s >= steps for s in stages):
        raise SystemExit(
            f"--stages includes untrained stages (checkpoint has {steps})"
        )

    directions, eigvals = sefa_directions(
        save["gen_params"], k=args.direction + 1, stages=stages,
        trained_stages=steps,
    )
    direction = directions[args.direction]

    gen = build_generator(ModelSpec.from_dict(save.get("model")))
    params = {"params": save["gen_params"]}

    if args.w is not None:
        w = np.load(args.w)
        if w.ndim == 1:  # byogan-project single-w output: (style_dim,)
            w = w[None, :]
        elif w.ndim == 2:
            # byogan-project --w-plus output: (steps, style_dim) — one W+
            # latent, NOT a batch of w's.
            if w.shape[0] != steps:
                raise SystemExit(
                    f"--w: shape {w.shape} is neither (style_dim,) nor a "
                    f"W+ latent with {steps} stage rows"
                )
            w = w[None, :, :]
        else:
            raise SystemExit(f"--w: unsupported array shape {w.shape}")
        w = jnp.asarray(w, jnp.float32)
    else:
        z_dim = z_dim_from_params(save["gen_params"])
        z = truncated_noise(
            jax.random.PRNGKey(args.seed), args.rows, z_dim, args.truncation
        )
        w = gen.apply(params, z, method="map_latent")

    coeffs = np.linspace(-args.span, args.span, args.ncols)
    sheet = edit_sheet(
        gen, params, w, direction, steps, coeffs,
        noise_seed=args.seed, alpha=alpha,
        edit_stages=None if args.stages is None else stages,
    )
    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    sheet01 = np.clip((np.asarray(sheet) + 1.0) / 2.0, 0.0, 1.0)
    save_image_grid(sheet01, args.output, nrow=args.ncols)
    print(
        f"wrote edit sheet (direction {args.direction}, eigenvalue "
        f"{eigvals[args.direction]:.3g}, coeffs ±{args.span}) to "
        f"{args.output}"
    )


if __name__ == "__main__":
    main()
