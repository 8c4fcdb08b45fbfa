"""Latent-projection CLI (``byogan-project``) — TPU-native extension, no
reference equivalent.

Inverts one or more images into the generator's W space (projector.py: the
whole Adam loop is a single compiled XLA program) and writes the
reconstruction next to each input plus the recovered latents as ``.npy``.
Inputs are resized to the checkpoint's stage resolution if needed.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Project images into the generator's W space"
    )
    parser.add_argument("checkpoint", help="checkpoint (ours or .pth)")
    parser.add_argument("images", nargs="+", help="input image file(s)")
    parser.add_argument(
        "-o", "--output", default=".", help="output directory"
    )
    parser.add_argument(
        "--iters", default=400, type=int, help="optimization iterations"
    )
    parser.add_argument("--lr", default=0.05, type=float, help="Adam LR")
    parser.add_argument(
        "--w-plus", action="store_true",
        help="optimize an independent w per stage (more expressive)",
    )
    parser.add_argument(
        "--ema", action="store_true",
        help="project against the EMA generator weights",
    )
    parser.add_argument(
        "--seed", default=0, type=int, help="synthesis-noise seed"
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
    from PIL import Image

    from byogan_tpu.core.grids import save_image
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.projector import project
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(args.checkpoint)
    if args.ema:
        if save.get("gen_ema") is None:
            raise SystemExit(
                f"--ema: {args.checkpoint} carries no EMA weights "
                "(train with ema_beta > 0)"
            )
        save["gen_params"] = save["gen_ema"]
    steps = save["step"]
    res = 4 * 2 ** (steps - 1)
    z_dim = z_dim_from_params(save["gen_params"])
    gen = build_generator(ModelSpec.from_dict(save.get("model")))
    params = {"params": save["gen_params"]}

    frames = []
    for path in args.images:
        with Image.open(path) as im:
            im = im.convert("RGB")
            if im.size != (res, res):
                im = im.resize((res, res), Image.BILINEAR)
            frames.append(np.asarray(im, np.uint8))
    target = np.stack(frames, axis=0)

    result = project(
        gen, params, target, steps=steps, z_dim=z_dim,
        n_iters=args.iters, lr=args.lr, w_plus=args.w_plus,
        noise_seed=args.seed, alpha=save["alpha"],
    )
    losses = np.asarray(result.losses)
    os.makedirs(args.output, exist_ok=True)
    recon01 = np.clip((np.asarray(result.image) + 1.0) / 2.0, 0.0, 1.0)
    for i, path in enumerate(args.images):
        stem = os.path.splitext(os.path.basename(path))[0]
        save_image(
            recon01[i], os.path.join(args.output, f"{stem}-proj.png")
        )
        np.save(
            os.path.join(args.output, f"{stem}-w.npy"),
            np.asarray(result.w[i]),
        )
    print(
        f"projected {len(args.images)} image(s): loss "
        f"{losses[0]:.4f} -> {losses[-1]:.4f} over {args.iters} iters; "
        f"outputs in {args.output}"
    )


if __name__ == "__main__":
    main()
