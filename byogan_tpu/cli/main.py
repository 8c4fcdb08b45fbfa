"""Training CLI (reference main.py).

Usage parity: ``byogan-train <config-section> [-c CHECKPOINT]`` reading
``config.txt`` from the working directory (reference main.py:13-26), plus
TPU-native extras (--config-file, --max-iters, --trace-dir).
"""

from __future__ import annotations

import argparse

from byogan_tpu.profiling import trace_if
from byogan_tpu.train.config import load_ini_config
from byogan_tpu.train.loop import train


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a progressive StyleGAN")
    parser.add_argument("config", help="Specify which config to use", type=str)
    parser.add_argument(
        "-c", "--checkpoint", dest="checkpoint", help="Path to checkpoint file"
    )
    parser.add_argument(
        "--config-file", default="config.txt", help="INI config path"
    )
    parser.add_argument(
        "--max-iters", type=int, default=None, help="stop after N iterations"
    )
    parser.add_argument(
        "--trace-dir", default=None, help="write a jax.profiler trace here"
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host: call jax.distributed.initialize() before training "
        "(mesh axes come from the data_axis/model_axis config keys)",
    )
    parser.add_argument(
        "--auto-resume", action="store_true",
        help="resume from the newest checkpoint in checkpoint_dir if one "
        "exists (failure recovery; the reference requires a manual -c path)",
    )
    parser.add_argument(
        "--force-resume", action="store_true",
        help="resume even when the config's trajectory knobs (batch/epoch "
        "progressions, critic_repeats, seed, ...) differ from the ones the "
        "checkpoint was trained with — the resumed trajectory will diverge",
    )
    args = parser.parse_args(argv)

    import jax

    from byogan_tpu.core.cache import enable_compilation_cache

    if args.distributed:
        jax.distributed.initialize()
    config = load_ini_config(args.config_file, args.config)
    if config.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()
    print(f"devices: {jax.devices()}")

    checkpoint = args.checkpoint
    if checkpoint is None and args.auto_resume:
        from byogan_tpu.train.checkpoint import latest_checkpoint

        checkpoint = latest_checkpoint(config.checkpoint_dir)
        if checkpoint:
            print(f"auto-resuming from {checkpoint}")

    with trace_if(args.trace_dir):
        train(
            config,
            checkpoint=checkpoint,
            max_iters=args.max_iters,
            allow_config_mismatch=args.force_resume,
        )


if __name__ == "__main__":
    main()
