"""Sample-generation CLI (reference generate_samples.py).

Loads a checkpoint (ours or a reference ``.pth``) and writes N sample PNGs
``image_{i}.png`` at the checkpoint's saved step/alpha from fresh truncated
noise (generate_samples.py:54-59).  Flag surface is the reference's
*documented* one — ``-d/--device -o/--output -z/--z-size -t/--truncation`` —
fixing its argparse quirk where adjacent string literals fused the spellings
into ``-d--device`` etc. (generate_samples.py:15/30/37; SURVEY.md §2.4), and
its hardcoded-CUDA noise helper that broke ``-d cpu`` (helper.py:42).
Output parity: images are saved RAW (network range ~[-1,1]) with
save_image's [0,255] clamp — negative values saturate to black, matching the
reference's observable PNGs (SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import os

from byogan_tpu.core.grids import to_uint8
from byogan_tpu.core.random import synthesis_noise, truncated_noise
from byogan_tpu.serve import save_frame_u8


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate samples")
    parser.add_argument("model", help="path to saved model", type=str)
    parser.add_argument("images", help="number of images to produce", type=int)
    parser.add_argument(
        "-d", "--device",
        dest="device", default=None, type=str,
        help="jax platform to run on (cpu/tpu; default: jax's default)",
    )
    parser.add_argument(
        "-o", "--output",
        dest="output_dir", default=".", type=str, help="output directory",
    )
    parser.add_argument(
        "-z", "--z-size", dest="z_size", default=None, type=int,
        help="noise size (default: read from the checkpoint)",
    )
    parser.add_argument(
        "-t", "--truncation",
        dest="trunc", default=0.75, type=float, help="truncation boundary",
    )
    parser.add_argument(
        "--seed", default=None, type=int, help="PRNG seed (default: random)"
    )
    parser.add_argument(
        "--batch", default=None, type=int,
        help="generate in batches of this size (default: all at once)",
    )
    parser.add_argument(
        "--pallas", action="store_true",
        help="use the fused Pallas synthesis kernels (TPU only; off by "
        "default — see benchmarks/RESULTS.md for when they win)",
    )
    parser.add_argument(
        "--ema", action="store_true",
        help="sample from the EMA generator weights (checkpoints trained "
        "with ema_beta > 0)",
    )
    parser.add_argument(
        "--psi", default=None, type=float,
        help="W-space truncation toward the mean w (StyleGAN trick; e.g. "
        "0.7 trades diversity for fidelity — off if unset)",
    )
    parser.add_argument(
        "--format", default="png", choices=("png", "jpeg", "raw"),
        help="output encoding: png (reference-faithful default), jpeg "
        "(native libjpeg — 7x faster encode at 512px, RESULTS.md r3), "
        "raw (uint8 .npy, no encode)",
    )
    parser.add_argument(
        "--jpeg-quality", default=92, type=int,
        help="libjpeg quality for --format jpeg (1-100)",
    )
    args = parser.parse_args(argv)

    if args.output_dir is not None and not os.path.exists(args.output_dir):
        raise OSError("path does not exist!")

    import jax

    from byogan_tpu.core.cache import enable_compilation_cache

    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(args.model)
    if args.ema:
        if save.get("gen_ema") is None:
            raise SystemExit(
                f"--ema: {args.model} carries no EMA weights "
                "(train with ema_beta > 0)"
            )
        save["gen_params"] = save["gen_ema"]
    steps, alpha = save["step"], save["alpha"]
    if args.z_size is None:
        args.z_size = z_dim_from_params(save["gen_params"])

    # Rebuild the architecture the checkpoint was trained with (reference
    # .pth files carry no spec -> reference-default architecture).
    gen = build_generator(
        ModelSpec.from_dict(save.get("model")), use_pallas=args.pallas
    )
    params = {"params": save["gen_params"]}
    seed = int.from_bytes(os.urandom(4), "little") if args.seed is None else args.seed
    key = jax.random.PRNGKey(seed)

    # TPU-native: one jitted batched synthesis instead of the reference's
    # N single-image forwards (generate_samples.py:54-59).
    batch = args.batch or args.images

    w_mean = None
    if args.psi is not None:
        from byogan_tpu.projector import mean_w

        w_mean = mean_w(gen, params, args.z_size, args.trunc)

    @jax.jit
    def synthesize(z, noise_key):
        noise = synthesis_noise(noise_key, z.shape[0], steps)
        a = None if alpha is None else jnp.float32(alpha)
        if args.psi is None:
            return gen.apply(params, z, noise, steps=steps, alpha=a)
        w = gen.apply(params, z, method="map_latent")
        w = w_mean + args.psi * (w - w_mean)
        return gen.apply(params, None, noise, steps=steps, alpha=a, style=w)

    written = 0
    while written < args.images:
        n = min(batch, args.images - written)
        key, z_key, n_key = jax.random.split(key, 3)
        z = truncated_noise(z_key, n, args.z_size, args.trunc)
        if n != batch:  # pad to the compiled batch size
            z = jnp.pad(z, ((0, batch - n), (0, 0)))
        imgs = np.asarray(synthesize(z, n_key))[:n]
        for i in range(n):
            stem = os.path.join(args.output_dir, f"image_{written + i + 1}")
            # One quantization rule (to_uint8, the reference's raw-range save
            # semantics) and one format dispatch (serve.save_frame_u8) for
            # every encode lane; png keeps the save_image zlib level.
            save_frame_u8(
                to_uint8(imgs[i]), stem, args.format,
                jpeg_quality=args.jpeg_quality, png_compression=6,
            )
        written += n
    print(f"wrote {written} images to {args.output_dir}")


if __name__ == "__main__":
    main()
