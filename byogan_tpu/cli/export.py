"""Export a byogan_tpu checkpoint — two lanes:

  * default: a reference-loadable PyTorch ``.pth``.  Interop completion:
    the reference's own ``generate_samples.py`` / ``interpolate.py`` can
    consume the exported file (DataParallel ``module.`` keys, logical
    fields of train.py:248-259).  Only reference-shaped architectures
    (ModelSpec defaults) are exportable — scaled models have no torch
    counterpart.
  * ``--stablehlo``: a self-contained serving artifact (jax.export) with
    the generator weights baked in as constants — serveable without
    byogan_tpu, flax, or the checkpoint (byogan_tpu/deploy.py).  Works
    for ANY architecture, lowered for cpu+tpu by default.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export a checkpoint: reference-loadable .pth (default) "
        "or a self-contained StableHLO serving module (--stablehlo)"
    )
    parser.add_argument("checkpoint", help="byogan_tpu checkpoint directory")
    parser.add_argument(
        "output", help="output path (.pth, or the StableHLO blob with "
        "--stablehlo; a .json sidecar lands next to it)"
    )
    parser.add_argument(
        "--ema", action="store_true",
        help="export the EMA generator weights into the .pth 'gen' slot "
        "(the reference format has no EMA concept) / into the StableHLO "
        "module",
    )
    parser.add_argument(
        "--stablehlo", action="store_true",
        help="write a self-contained jax.export/StableHLO serving module "
        "(+ .json sidecar) instead of a .pth",
    )
    parser.add_argument(
        "--batch", type=int, default=32,
        help="--stablehlo: batch size the module is traced at",
    )
    parser.add_argument(
        "--dtype", default="bfloat16",
        help="--stablehlo: compute dtype (bfloat16|float32)",
    )
    parser.add_argument(
        "--psi", type=float, default=None,
        help="--stablehlo: bake W-space truncation (mean w embedded as a "
        "module constant)",
    )
    parser.add_argument(
        "-t", "--truncation", type=float, default=0.75,
        help="--stablehlo: the TRAINING z truncation (config.noise_trunc) — "
        "used to compute the baked mean w where the model was trained; set "
        "it when the checkpoint's run used a non-default noise_trunc",
    )
    parser.add_argument(
        "--platforms", default="cpu,tpu",
        help="--stablehlo: comma-separated lowering targets",
    )
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.stablehlo:
        from byogan_tpu.deploy import export_stablehlo

        meta = export_stablehlo(
            args.checkpoint,
            args.output,
            batch=args.batch,
            dtype=args.dtype,
            use_ema=args.ema,
            truncation_psi=args.psi,
            truncation=args.truncation,
            platforms=tuple(
                p.strip() for p in args.platforms.split(",") if p.strip()
            ),
        )
        print(
            f"exported {args.checkpoint} -> {args.output} "
            f"({meta['bytes']} bytes, {meta['resolution']}px, "
            f"platforms {','.join(meta['platforms'])})"
        )
        return

    from byogan_tpu.models.factory import ModelSpec
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(args.checkpoint)
    if args.ema:
        if save.get("gen_ema") is None:
            raise SystemExit(
                f"--ema: {args.checkpoint} carries no EMA weights "
                "(train with ema_beta > 0)"
            )
        save["gen_params"] = save["gen_ema"]
    spec = ModelSpec.from_dict(save.get("model"))
    if not spec.is_reference_compatible:
        raise SystemExit(
            f"checkpoint architecture {spec} is not the reference shape; "
            "only ModelSpec() defaults can be exported to .pth"
        )

    import numpy as np
    import torch

    from byogan_tpu.compat.torch_ckpt import (
        critic_params_to_torch,
        generator_params_to_torch,
    )

    out = {
        "gen": {
            k: torch.from_numpy(np.array(v))
            for k, v in generator_params_to_torch(save["gen_params"]).items()
        },
        "critic": {
            k: torch.from_numpy(np.array(v))
            for k, v in critic_params_to_torch(save["critic_params"]).items()
        },
        "iter": save["iter"],
        "im_count": save["im_count"],
        "step": save["step"],
        "epoch": save["epoch"],
        "alpha": save["alpha"],
    }
    torch.save(out, args.output)
    print(f"exported {args.checkpoint} -> {args.output}")


if __name__ == "__main__":
    main()
