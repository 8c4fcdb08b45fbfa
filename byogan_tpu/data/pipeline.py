"""Per-stage training data pipeline (reference train.py:43-55, 109-117).

The reference builds a fresh torchvision ImageFolder + DataLoader per
progressive stage with RandomHorizontalFlip -> ToTensor -> Normalize to
[-1,1] (train.py:43-50).  TPU-native redesign:

  * decoded images are cached in RAM when the stage fits a byte budget
    (low-resolution stages — the bulk of training — then pay ZERO decode
    cost per epoch; the reference re-decodes PNGs every epoch);
  * batches are materialized as NHWC float32 in [-1,1] by a background
    prefetch thread so host IO overlaps device compute;
  * static batch shapes: the trailing partial batch is dropped
    (drop_remainder) by default — the reference trains on ragged final
    batches (train.py:133), which on TPU would force one extra XLA compile
    per stage for a sliver of data; documented divergence, configurable.
  * augmentation (horizontal flip, train.py:46) uses a seeded numpy
    Generator — deterministic given the seed.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

from byogan_tpu.data.prep import _is_image


class StageDataset:
    """Images of one progressive stage (``<root>/prepared/set_{k}``).

    Files are discovered recursively (torchvision ImageFolder layout —
    class subdirectories — as produced by prep, reference prep.py:53).
    """

    def __init__(
        self,
        root: str,
        stage: int,
        cache_limit_bytes: int = 1 << 30,
        derive_shift: int = 0,
    ):
        """``derive_shift=k`` reads set_{stage} files but downsamples each
        decoded image by 2^k with prep's own bilinear filter — the
        single-multi-res-source mode (SURVEY §7 step 5): one high-resolution
        set on disk serves every lower stage with the SAME pixels prep would
        have written."""
        self.set_dir = os.path.join(root, "prepared", f"set_{stage}")
        self.derive_shift = derive_shift
        if not os.path.isdir(self.set_dir):
            raise OSError(
                f"Did not detect prepared dataset! (missing {self.set_dir})"
            )
        self.files: List[str] = []
        for dirpath, _, names in sorted(os.walk(self.set_dir)):
            for name in sorted(names):
                if _is_image(name):
                    self.files.append(os.path.join(dirpath, name))
        self._cache: Optional[np.ndarray] = None
        self._cache_limit = cache_limit_bytes
        # Packed zero-decode store (see pack_stage): a uint8 NHWC memmap.
        packed = os.path.join(self.set_dir, "packed.npy")
        self._packed: Optional[np.ndarray] = None
        if self.derive_shift == 0 and os.path.exists(packed):
            self._packed = np.load(packed, mmap_mode="r")
        if not self.files and self._packed is None:
            raise OSError(f"no images under {self.set_dir}")

    def __len__(self) -> int:
        if self._packed is not None:
            return int(self._packed.shape[0])
        return len(self.files)

    def _decode(self, path: str) -> np.ndarray:
        from byogan_tpu.data import native

        img = native.decode_image(path)
        if img is None:
            from PIL import Image

            with Image.open(path) as im:
                img = np.asarray(im.convert("RGB"), dtype=np.uint8)
        if self.derive_shift:
            img = _downsample_u8(img, self.derive_shift)
        return img

    def maybe_cache(self, workers: int = 8) -> bool:
        """Decode everything into one uint8 NHWC array if under budget."""
        if self._packed is not None:
            return True  # memmap already serves zero-decode reads
        if self._cache is not None:
            return True
        probe = self._decode(self.files[0])
        total = probe.nbytes * len(self.files)
        if total > self._cache_limit:
            return False
        cache = np.empty((len(self.files),) + probe.shape, np.uint8)
        cache[0] = probe

        def fill(i):
            cache[i] = self._decode(self.files[i])

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(fill, range(1, len(self.files))))
        self._cache = cache
        return True

    def get_batch_uint8(self, indices: np.ndarray, workers: int = 8) -> np.ndarray:
        if self._packed is not None:
            return np.asarray(self._packed[np.sort(indices)])[
                np.argsort(np.argsort(indices))
            ]
        if self._cache is not None:
            return self._cache[indices]
        from byogan_tpu.data import native

        probe = self._decode(self.files[int(indices[0])])
        batch = None
        if not self.derive_shift:
            batch = native.decode_batch(
                [self.files[int(i)] for i in indices],
                probe.shape[0],
                probe.shape[1],
                threads=workers,
            )
        if batch is not None:
            return batch
        out = np.empty((len(indices),) + probe.shape, np.uint8)
        out[0] = probe
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for j, img in enumerate(
                pool.map(lambda i: self._decode(self.files[i]), indices[1:])
            ):
                out[j + 1] = img
        return out


def pack_stage(root: str, stage: int, workers: int = 8) -> str:
    """Pack set_{stage} into a single uint8 NHWC ``packed.npy`` memmap.

    Training then reads batches with ZERO decode work and no RAM-cache
    budget pressure (the OS page cache does the rest) — the fastest data
    path for the big 256/512px stages.  Idempotent; loaders pick the packed
    file up automatically.
    """
    ds = StageDataset(root, stage, cache_limit_bytes=0)
    probe = ds._decode(ds.files[0])
    path = os.path.join(ds.set_dir, "packed.npy")
    tmp = path + ".tmp.npy"
    arr = np.lib.format.open_memmap(
        tmp, mode="w+", dtype=np.uint8, shape=(len(ds.files),) + probe.shape
    )
    arr[0] = probe

    def fill(i):
        arr[i] = ds._decode(ds.files[i])

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(fill, range(1, len(ds.files))))
    arr.flush()
    del arr
    os.replace(tmp, path)
    return path


def _halve_axis0(x: np.ndarray) -> np.ndarray:
    """One antialiased bilinear 2x reduction along axis 0 (float64 in/out).

    Exactly PIL's BILINEAR reduction filter for an integer 2x factor: a
    triangle filter of support 2, i.e. interior taps (1,3,3,1)/8 and
    boundary-clipped renormalized taps (3,3,1)/7 — so stages derived from a
    higher prepared set match what prep.py's PIL resize chain writes to disk
    (to within 1 LSB of PIL's fixed-point arithmetic)."""
    h = x.shape[0]
    n = h // 2
    if n == 1:
        return (x[0:1] + x[1:2]) / 2.0
    out = np.empty((n,) + x.shape[1:], np.float64)
    out[0] = (3.0 * x[0] + 3.0 * x[1] + x[2]) / 7.0
    out[n - 1] = (x[2 * n - 3] + 3.0 * x[2 * n - 2] + 3.0 * x[2 * n - 1]) / 7.0
    if n > 2:
        out[1:-1] = (
            x[1 : 2 * n - 3 : 2]
            + 3.0 * x[2 : 2 * n - 2 : 2]
            + 3.0 * x[3 : 2 * n - 1 : 2]
            + x[4 : 2 * n : 2]
        ) / 8.0
    return out


def _downsample_u8(img: np.ndarray, shift: int) -> np.ndarray:
    """2^shift downsample of an HWC uint8 image via repeated 2x bilinear
    halvings, rounding to uint8 between halvings exactly like prep.py's
    largest-first PIL resize chain (data/prep.py:93-100)."""
    for _ in range(shift):
        x = _halve_axis0(img.astype(np.float64))
        x = _halve_axis0(x.transpose(1, 0, 2)).transpose(1, 0, 2)
        img = np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)
    return img


def open_stage_dataset(
    root: str,
    stage: int,
    cache_limit_bytes: int = 1 << 30,
    allow_derived: bool = True,
) -> StageDataset:
    """Open set_{stage}, or derive it from the next available higher set.

    Lets a dataset prepared with only its top resolution (or sparse sets)
    train every stage — the reference requires all 8 disk copies
    (train.py:109-110).
    """
    direct = os.path.join(root, "prepared", f"set_{stage}")
    if os.path.isdir(direct) or not allow_derived:
        return StageDataset(root, stage, cache_limit_bytes)
    prepared = os.path.join(root, "prepared")
    if os.path.isdir(prepared):
        for higher in range(stage + 1, 16):
            if os.path.isdir(os.path.join(prepared, f"set_{higher}")):
                return StageDataset(
                    root, higher, cache_limit_bytes,
                    derive_shift=higher - stage,
                )
    raise OSError(f"Did not detect prepared dataset! (missing {direct})")


def _normalize(batch_u8: np.ndarray, flip_mask: np.ndarray) -> np.ndarray:
    """uint8 NHWC -> float32 in [-1,1] with per-sample horizontal flip.

    Uses the fused native kernel (data/native.py) when available.
    """
    from byogan_tpu.data import native

    out = native.normalize_batch(batch_u8, flip_mask)
    if out is not None:
        return out
    batch = batch_u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    if flip_mask.any():
        batch[flip_mask] = batch[flip_mask, :, ::-1]
    return batch


def _flip_u8(batch_u8: np.ndarray, flip_mask: np.ndarray) -> np.ndarray:
    """Per-sample horizontal flip on raw uint8 (the device-normalize lane).

    Same flip semantics as ``_normalize`` but without the float conversion:
    the [-1,1] mapping happens ON DEVICE inside the jitted step (train/
    steps.py), so batches cross the host->device link as uint8 — 4x fewer
    bytes than the float32 lane, which is the real-run iteration bound on
    transfer-limited hosts at the big stages.
    """
    if flip_mask.any():
        batch_u8 = batch_u8.copy()
        batch_u8[flip_mask] = batch_u8[flip_mask, :, ::-1]
    return batch_u8


def make_stage_loader(
    dataset: StageDataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    flip: bool = True,
    drop_remainder: bool = True,
    workers: int = 8,
    prefetch: int = 2,
    epochs: Optional[int] = 1,
    cache: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    skip_batches: int = 0,
    device_normalize: bool = False,
) -> Iterator[np.ndarray]:
    """Yield NHWC float32 batches in [-1,1], prefetched on a worker thread.

    ``device_normalize=True`` yields flipped RAW uint8 batches instead; the
    jitted train step maps them to [-1,1] on device (same f32 expression,
    equal to float rounding — XLA fuses an FMA, <=1 ulp; tested).  Shuffle/
    flip RNG draws are unchanged, so the two lanes see the same data order.

    ``epochs=None`` streams forever.  One epoch = one shuffled pass
    (train.py:112-117 semantics, minus the ragged tail under
    drop_remainder).

    ``skip_batches``: skip the first m batches of the FIRST epoch while still
    consuming their RNG draws — the stream continues bit-identically to an
    uninterrupted pass (batch-exact resume, train/loop.py).

    Multi-host: with ``process_count > 1``, every host draws the IDENTICAL
    global shuffle/flip sequence (same seed) but decodes ONLY its contiguous
    ``batch_size / process_count`` row slice of each global batch — the rows
    its addressable devices own under the mesh's batch sharding.  Batches
    then assemble into one global array via
    ``jax.make_array_from_process_local_data`` (device_prefetch).
    """
    if batch_size % process_count != 0:
        raise ValueError(
            f"batch_size {batch_size} not divisible by process_count "
            f"{process_count}"
        )
    local_rows = batch_size // process_count
    lo_row = process_index * local_rows
    if cache:
        dataset.maybe_cache(workers=workers)
    rng = np.random.default_rng(seed)
    n = len(dataset)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()
    _SENTINEL = object()

    def producer():
        epoch = 0
        try:
            while not stop.is_set() and (epochs is None or epoch < epochs):
                order = rng.permutation(n) if shuffle else np.arange(n)
                limit = n - (n % batch_size) if drop_remainder else n
                for lo in range(0, limit, batch_size):
                    if stop.is_set():
                        return
                    idx = order[lo : lo + batch_size]
                    # Draw flips for the GLOBAL batch (keeps the stream
                    # identical whatever process_count is), then slice.
                    flips = (
                        rng.random(len(idx)) < 0.5
                        if flip
                        else np.zeros(len(idx), bool)
                    )
                    if epoch == 0 and lo // batch_size < skip_batches:
                        continue  # resume skip: RNG consumed, no decode
                    idx = idx[lo_row : lo_row + local_rows]
                    flips = flips[lo_row : lo_row + local_rows]
                    batch_u8 = dataset.get_batch_uint8(idx, workers=workers)
                    q.put(
                        _flip_u8(batch_u8, flips)
                        if device_normalize
                        else _normalize(batch_u8, flips)
                    )
                epoch += 1
        except BaseException as e:  # surface IO errors to the consumer —
            # a swallowed decode failure would silently truncate the epoch
            q.put(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so the producer can exit
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5)


def batches_per_epoch(
    dataset_len: int, batch_size: int, drop_remainder: bool = True
) -> int:
    """len(DataLoader) analogue (train.py:119 uses it for the fade-in span)."""
    if drop_remainder:
        return dataset_len // batch_size
    return -(-dataset_len // batch_size)


def device_prefetch(iterator, sharding=None, depth: int = 2,
                    process_count: int = 1):
    """Overlap host->device transfer with device compute.

    Wraps a host-batch iterator: batches are jax.device_put (optionally with
    a NamedSharding for mesh runs) ``depth`` steps ahead of consumption, so
    the transfer of batch N+1 rides under the computation of batch N.  (The
    reference's DataLoader moves tensors inside the train loop per step,
    train.py:150-156.)

    Multi-host (``process_count > 1``): each host's iterator yields only its
    LOCAL row slice (make_stage_loader's per-host sharding); the slices
    assemble into one global jax.Array spanning all hosts via
    ``jax.make_array_from_process_local_data``.
    """
    import collections

    import jax

    buf = collections.deque()
    try:
        for item in iterator:
            if process_count > 1:
                if sharding is None:
                    raise ValueError(
                        "multi-host prefetch requires a batch sharding"
                    )
                global_shape = (item.shape[0] * process_count,) + item.shape[1:]
                dev = jax.make_array_from_process_local_data(
                    sharding, item, global_shape
                )
            elif sharding is not None:
                dev = jax.device_put(item, sharding)
            else:
                dev = jax.device_put(item)
            buf.append(dev)
            if len(buf) >= depth:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
    finally:
        buf.clear()
