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
    args = parser.parse_args(argv)

    import jax

    config = load_ini_config(args.config_file, args.config)
    if config.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}")
    with trace_if(args.trace_dir):
        train(config, checkpoint=args.checkpoint, max_iters=args.max_iters)


if __name__ == "__main__":
    main()
