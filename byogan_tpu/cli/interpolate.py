"""Latent-walk frame dump (reference interpolate.py).

The reference is hardcoded — checkpoint ``./chk-116000.pth``, 60 z's at
truncation 0.7, one FIXED per-resolution noise pyramid shared by all frames,
61 lerp steps per adjacent pair, frames to ``./output/image_{e}.png``
(interpolate.py:14-41).  This CLI keeps every one of those defaults but adds
argparse (SURVEY.md §7 step 6) and batches each pair's 61 frames into ONE
jitted device call instead of 61 single-image forwards.

Semantics preserved: z-space (not w-space) lerp; constant noise across
frames (interpolate.py:30-41).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Latent interpolation frames")
    parser.add_argument(
        "checkpoint", nargs="?", default="./chk-116000.pth",
        help="checkpoint (ours or reference .pth); default matches the "
        "reference's hardcoded path",
    )
    parser.add_argument("-o", "--output", default="./output")
    parser.add_argument("-n", "--num-latents", type=int, default=60)
    parser.add_argument("-t", "--truncation", type=float, default=0.7)
    parser.add_argument(
        "-p", "--psi-steps", type=int, default=61,
        help="frames per latent pair (inclusive endpoints)",
    )
    parser.add_argument(
        "-z", "--z-size", type=int, default=None,
        help="noise size (default: read from the checkpoint)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-d", "--device", default=None)
    parser.add_argument(
        "--pallas", action="store_true",
        help="use the fused Pallas synthesis kernels (TPU only)",
    )
    parser.add_argument(
        "--ema", action="store_true",
        help="render from the EMA generator weights (checkpoints trained "
        "with ema_beta > 0)",
    )
    parser.add_argument(
        "--w-space", action="store_true",
        help="lerp in W space instead of Z (smoother walks; extension — "
        "the reference lerps z, interpolate.py:33)",
    )
    args = parser.parse_args(argv)

    import jax

    from byogan_tpu.core.cache import enable_compilation_cache

    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from byogan_tpu.core.grids import save_image
    from byogan_tpu.core.random import fixed_synthesis_noise, truncated_noise
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.train.checkpoint import load_checkpoint

    os.makedirs(args.output, exist_ok=True)
    save = load_checkpoint(args.checkpoint)
    if args.ema:
        if save.get("gen_ema") is None:
            raise SystemExit(
                f"--ema: {args.checkpoint} carries no EMA weights "
                "(train with ema_beta > 0)"
            )
        save["gen_params"] = save["gen_ema"]
    steps, alpha = save["step"], save["alpha"]
    if args.z_size is None:
        args.z_size = z_dim_from_params(save["gen_params"])

    gen = build_generator(
        ModelSpec.from_dict(save.get("model")), use_pallas=args.pallas
    )
    params = {"params": save["gen_params"]}

    key = jax.random.PRNGKey(args.seed)
    key, z_key, n_key = jax.random.split(key, 3)
    z = truncated_noise(z_key, args.num_latents, args.z_size, args.truncation)
    if args.w_space:
        # Map the endpoints once; frames then lerp w directly (style
        # injection, models/generator.py) — W is the smoother space.
        z = jax.jit(
            lambda z_: gen.apply(params, z_, method="map_latent")
        )(z)
    # Batch-1 fixed noise pyramid shared by every frame (interpolate.py:23-26),
    # broadcast over the frame batch.
    fixed_noise = fixed_synthesis_noise(n_key, steps=gen.num_stages)
    psi = jnp.linspace(0.0, 1.0, args.psi_steps)[:, None]

    @jax.jit
    def render_pair(z_start, z_end):
        frames_z = z_start[None, :] * (1 - psi) + z_end[None, :] * psi
        noise = [
            jnp.broadcast_to(n, (args.psi_steps,) + n.shape[1:])
            for n in fixed_noise[:steps]
        ]
        a = None if alpha is None else jnp.float32(alpha)
        if args.w_space:
            return gen.apply(
                params, None, noise, steps=steps, alpha=a, style=frames_z
            )
        return gen.apply(params, frames_z, noise, steps=steps, alpha=a)

    e = 0
    for i in range(args.num_latents - 1):
        frames = np.asarray(render_pair(z[i], z[i + 1]))
        for f in frames:
            save_image(f, os.path.join(args.output, f"image_{e + 1}.png"))
            e += 1
    print(f"wrote {e} frames to {args.output}")


if __name__ == "__main__":
    main()
