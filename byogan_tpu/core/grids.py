"""Image-grid assembly and PNG IO (reference helper.py:8-33 + torchvision
``make_grid``/``save_image`` observable behavior).

The reference displays/saves 5x5 sample grids via matplotlib +
``torchvision.utils.make_grid`` (helper.py:22-31) and saves individual
samples via ``utils.save_image`` (generate_samples.py:56-59) — which clamps
to [0,255] AFTER scaling, so the network's [-1,1] output loses its negative
half (SURVEY.md §3.2).  Both behaviors are replicated here in pure
numpy/PIL, no torch dependency.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np


def make_grid(
    images: np.ndarray, nrow: int = 8, padding: int = 2, pad_value: float = 0.0
) -> np.ndarray:
    """NHWC batch -> single HWC grid (torchvision ``make_grid`` semantics:
    ``nrow`` images per row, 2px zero padding on all internal + outer-top/left
    edges)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncols = min(nrow, n)
    nrows = int(math.ceil(n / ncols))
    grid_h = nrows * (h + padding) + padding
    grid_w = ncols * (w + padding) + padding
    grid = np.full((grid_h, grid_w, c), pad_value, dtype=images.dtype)
    for idx in range(n):
        r, col = divmod(idx, ncols)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def to_uint8(image: np.ndarray) -> np.ndarray:
    """[0,1]-nominal float HWC -> uint8, torchvision save_image rounding:
    ``clamp(x*255 + 0.5, 0, 255)`` — out-of-range values saturate."""
    return np.clip(np.asarray(image, np.float32) * 255.0 + 0.5, 0, 255).astype(
        np.uint8
    )


def uint8_to_training_range(u8):
    """uint8 pixels -> float32 in [-1, 1] — THE training normalization
    (``u8 * 2/255 - 1``, data/pipeline.py), shared by every metric/analysis
    surface so real and generated pixels always meet in the same range.

    NOT the inverse of :func:`to_uint8` — that is the reference's raw-range
    SAVE rule, which maps [0,1] to [0,255] and saturates negatives.
    """
    import numpy as _np

    if hasattr(u8, "device"):  # jax array: stay on device
        import jax.numpy as _jnp

        return u8.astype(_jnp.float32) * (2.0 / 255.0) - 1.0
    return _np.asarray(u8, _np.float32) * (2.0 / 255.0) - 1.0


def save_image(image: np.ndarray, path: str, compression: int = 6) -> None:
    """Save one HWC float image as PNG (torchvision ``save_image`` pixel
    parity; encoded natively when the IO library is built, PIL otherwise).

    ``compression``: zlib level — pass 1 for serving-throughput encodes.
    """
    u8 = to_uint8(image)
    if path.lower().endswith(".png"):
        from byogan_tpu.data.native import encode_png

        if encode_png(path, u8, compression):
            return
    from PIL import Image

    Image.fromarray(u8).save(path)


def save_image_grid(
    images: np.ndarray, path: str, nrow: int = 8, padding: int = 2
) -> None:
    """Save an NHWC batch as one grid PNG."""
    save_image(make_grid(images, nrow=nrow, padding=padding), path)


def display_image(
    images: np.ndarray,
    num_display: int = 4,
    save_to_disk: bool = False,
    save_dir: str = "./output",
    filename: str = "figure",
    title: str = "Images",
) -> None:
    """Reference ``helper.display_image`` parity (helper.py:8-33): matplotlib
    figure of a sqrt(num_display)-wide grid with a title, saved to
    ``{save_dir}/{filename}.png`` or shown.  Input NHWC (or HWC for one
    image)."""
    import matplotlib

    if save_to_disk:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    if images.ndim == 3:
        plt.imshow(images)
    else:
        nrow = int(math.sqrt(num_display))
        grid = make_grid(images[:num_display], nrow=nrow)
        plt.imshow(np.squeeze(grid))
    plt.title(title)
    if save_to_disk:
        os.makedirs(save_dir, exist_ok=True)
        plt.savefig(os.path.join(save_dir, f"{filename}.png"))
        plt.close()
    else:
        plt.show()
