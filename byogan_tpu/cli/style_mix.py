"""Style-mixing grid CLI (``byogan-mix``) — TPU-native extension, no
reference equivalent.

Renders the classic StyleGAN style-mixing matrix: cell (i, j) takes its
COARSE stages (below ``--crossover``) from row latent A_i and its FINE
stages from column latent B_j, via the generator's per-stage style
injection (models/generator.py).  One grid PNG, plus the pure A row and
pure B column for orientation (row 0 = B alone, column 0 = A alone).
Synthesis noise is a single fixed pyramid shared by every cell so all
visible variation comes from the styles.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Style-mixing grid")
    parser.add_argument("checkpoint", help="checkpoint (ours or .pth)")
    parser.add_argument(
        "-o", "--output", default="mix.png", help="output grid PNG path"
    )
    parser.add_argument(
        "-r", "--rows", default=4, type=int, help="coarse-style latents (A)"
    )
    parser.add_argument(
        "-c", "--cols", default=4, type=int, help="fine-style latents (B)"
    )
    parser.add_argument(
        "--crossover", default=None, type=int,
        help="stages below this take A's style, the rest B's "
        "(default: half the checkpoint's stages)",
    )
    parser.add_argument(
        "-t", "--truncation", default=0.75, type=float,
        help="z truncation boundary",
    )
    parser.add_argument(
        "--psi", default=None, type=float,
        help="W-space truncation toward the mean w (e.g. 0.7); off if unset",
    )
    parser.add_argument(
        "--ema", action="store_true",
        help="use the EMA generator weights (runs with ema_beta > 0)",
    )
    parser.add_argument(
        "--seed", default=0, type=int, help="PRNG seed"
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
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.core.grids import save_image_grid
    from byogan_tpu.core.random import fixed_synthesis_noise, truncated_noise
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
    crossover = (
        args.crossover if args.crossover is not None else max(1, steps // 2)
    )
    if not 0 <= crossover <= steps:
        raise SystemExit(f"--crossover must be in [0, {steps}]")
    z_dim = z_dim_from_params(save["gen_params"])

    gen = build_generator(ModelSpec.from_dict(save.get("model")))
    params = {"params": save["gen_params"]}
    rows, cols = args.rows, args.cols
    n = (rows + 1) * (cols + 1)  # + source row/column (cell 0,0 left blank)

    key = jax.random.PRNGKey(args.seed)
    ka, kb, kn = jax.random.split(key, 3)
    fixed_noise = fixed_synthesis_noise(kn, steps=steps)
    w_mean = None
    if args.psi is not None:
        from byogan_tpu.projector import mean_w

        w_mean = mean_w(gen, params, z_dim, args.truncation)

    @jax.jit
    def render():
        def to_w(k, count):
            z = truncated_noise(k, count, z_dim, args.truncation)
            w = gen.apply(params, z, method="map_latent")
            if args.psi is not None:
                w = w_mean + args.psi * (w - w_mean)
            return w

        w_a, w_b = to_w(ka, rows), to_w(kb, cols)  # (R, D), (C, D) in W-space
        sd = w_a.shape[-1]  # style_dim (not z_dim)
        # Grid of (rows+1)x(cols+1) styles: row 0 shows B alone, column 0
        # shows A alone; interior cell (i, j) mixes A_i coarse + B_j fine.
        ca = jnp.concatenate([jnp.zeros((1, sd), w_a.dtype), w_b], axis=0)
        ca = jnp.concatenate(
            [ca[None, :, :],  # header row: B alone (cell 0,0 is zero style)
             jnp.broadcast_to(w_a[:, None, :], (rows, cols + 1, sd))],
            axis=0,
        ).reshape(n, sd)
        fi = jnp.concatenate([jnp.zeros((1, sd), w_b.dtype), w_b], axis=0)
        fi = jnp.broadcast_to(fi[None, :, :], (rows + 1, cols + 1, sd))
        fi = fi.at[1:, 0, :].set(w_a)  # column 0: A alone (fine = A too)
        fi = fi.reshape(n, sd)
        styles = [ca if i < crossover else fi for i in range(steps)]
        noise = [
            jnp.broadcast_to(m, (n,) + m.shape[1:])
            for m in fixed_noise[:steps]
        ]
        img = gen.apply(
            params, None, noise, steps=steps,
            alpha=None if alpha is None else jnp.float32(alpha),
            style=styles,
        )
        return jnp.clip((img.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)

    imgs = np.asarray(render())
    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    save_image_grid(imgs, args.output, nrow=cols + 1)
    print(
        f"wrote {rows}x{cols} mixing grid (crossover {crossover}/{steps}) "
        f"to {args.output}"
    )


if __name__ == "__main__":
    main()
