"""Synthetic dataset generation for tests, demos, and benchmarks.

The reference has no test data story (SURVEY.md §4); this provides a tiny
deterministic image corpus so the full prep -> train -> sample -> interpolate
cycle can run hermetically on CPU (integration tests) or at scale on TPU
(bench.py warm-up without a real dataset).
"""

from __future__ import annotations

import os

import numpy as np


def write_synthetic_dataset(
    datapath: str, n_images: int = 32, size: int = 64, seed: int = 0
) -> str:
    """Write ``n_images`` colorful PNGs (smooth gradients + circles) into
    ``datapath`` as 'originals' ready for prepare_pyramid."""
    from PIL import Image

    os.makedirs(datapath, exist_ok=True)
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n_images):
        cx, cy, r = rng.random(3) * 0.8 + 0.1
        phase = rng.random(3) * 6.28
        base = np.stack(
            [np.sin(4 * xx + p) * np.cos(3 * yy + p) for p in phase], axis=-1
        )
        mask = ((xx - cx) ** 2 + (yy - cy) ** 2) < (0.2 * r) ** 2
        base[mask] = rng.random(3) * 2 - 1
        img = ((base * 0.5 + 0.5) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(datapath, f"orig-{i:04d}.png"))
    return datapath
