"""cProfile the REAL train() loop on the TPU for a few dozen iterations.

scripts/profile_hotloop.py showed the loop's building blocks run at ~6ms/iter
in isolation, but the full train() measured ~1s/iter on the tunneled chip —
this profiles train() itself to find the gap.

Usage: python scripts/profile_train.py [iters=40]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import shutil
import sys
import time


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import train

    out_root = "benchmarks/profile_train"
    data = os.path.join("benchmarks/convergence", "data")
    if not os.path.isdir(os.path.join(data, "prepared")):
        data = os.path.join(out_root, "data")
        write_synthetic_dataset(data, n_images=256, size=32, seed=3)
        prepare_pyramid(data, 4, 32)
    shutil.rmtree(out_root, ignore_errors=True)

    config = TrainConfig(
        data=data,
        batch_progression=(64, 64, 64, 32),
        epoch_progression=(120, 120, 120, 120),
        display_step=10_000,
        checkpoint_step=10_000,
        refresh_stat_step=10,
        seed=11,
        checkpoint_dir=os.path.join(out_root, "checkpoints"),
        output_dir=os.path.join(out_root, "output"),
    )

    # Warm the compile cache outside the profile window.
    train(config, max_iters=2)
    shutil.rmtree(out_root, ignore_errors=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    train(config, max_iters=iters)
    prof.disable()
    wall = time.time() - t0
    print(f"\n=== {iters} iters in {wall:.1f}s = {wall / iters * 1e3:.0f} ms/iter ===")
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
