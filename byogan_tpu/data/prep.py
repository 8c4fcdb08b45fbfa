"""Offline multi-resolution dataset preparation (reference prep.py).

Produces the reference's on-disk layout — ``<data>/original/images/`` for the
moved originals (prep.py:35-40) and ``<data>/prepared/set_{k}/images/
image-{n}.png`` pyramids (prep.py:53, 81-85) — so datasets prepared by either
tool are interchangeable.

TPU-native redesign of the pipeline itself (the reference re-decodes every
original once per resolution through a shuffled torch DataLoader,
prep.py:64-79 — O(stages x N) decodes and a nondeterministic index<->file
mapping):
  * each original is decoded ONCE and resized to every target size in the
    same pass (O(N) decodes);
  * deterministic, sorted file order (stable image-N naming across runs);
  * multi-threaded decode/encode (PNG work is GIL-releasing in PIL).
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


def _is_image(name: str) -> bool:
    return os.path.splitext(name)[1].lower() in IMAGE_EXTENSIONS


def _gather_sizes(start_size: int, end_size: int) -> List[int]:
    sizes = []
    cur = start_size
    while cur <= end_size:
        sizes.append(cur)
        cur *= 2
    return sizes


def prepare_pyramid(
    datapath: str,
    start_size: int = 4,
    end_size: int = 512,
    workers: int = 8,
    overwrite: Optional[Callable[[str], bool]] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> List[str]:
    """Build the resolution pyramid.  Returns the list of set directories.

    ``overwrite(set_name) -> bool`` decides whether to rebuild an existing
    set (the reference prompts interactively, prep.py:55-60; the CLI wires
    that prompt in, the library defaults to skip-existing).
    """
    from PIL import Image

    # Move originals into original/images (reference prep.py:35-40).
    dest = os.path.join(datapath, "original", "images")
    if not os.path.exists(dest):
        os.makedirs(dest)
        for name in sorted(os.listdir(datapath)):
            if name not in ("original", "prepared"):
                shutil.move(os.path.join(datapath, name), dest)

    sizes = _gather_sizes(start_size, end_size)
    prepared = os.path.join(datapath, "prepared")
    os.makedirs(prepared, exist_ok=True)

    out_dirs, build_sizes, build_dirs = [], [], []
    for index, size in enumerate(sizes):
        set_dir = os.path.join(prepared, f"set_{index + 1}", "images")
        out_dirs.append(os.path.dirname(set_dir))
        if os.path.exists(set_dir):
            if overwrite is not None and overwrite(f"set_{index + 1}"):
                shutil.rmtree(set_dir)
            else:
                continue
        os.makedirs(set_dir)
        build_sizes.append(size)
        build_dirs.append(set_dir)

    if not build_sizes:
        return out_dirs

    files = sorted(
        os.path.join(dest, f) for f in os.listdir(dest) if _is_image(f)
    )

    def process(args) -> None:
        n, path = args
        with Image.open(path) as im:
            im = im.convert("RGB")
            # Largest-first so each subsequent size downsamples the previous
            # result (cheaper + antialiased like PIL's resize).
            src = im
            for size, set_dir in sorted(
                zip(build_sizes, build_dirs), reverse=True
            ):
                src = src.resize((size, size), Image.BILINEAR)
                src.save(os.path.join(set_dir, f"image-{n}.png"))

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for i, _ in enumerate(pool.map(process, enumerate(files))):
            if progress is not None:
                progress(i + 1, len(files))
    return out_dirs
