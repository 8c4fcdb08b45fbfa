"""Batched sampling service — the production serving path.

The reference's only inference surface is a one-image-at-a-time CLI loop
(generate_samples.py:54-59).  ``Sampler`` is the library/serving equivalent,
TPU-shaped:

  * ONE precompiled synthesis program per (batch, steps) bucket — fresh
    latents and per-stage noise are drawn on device, so a request is a single
    device dispatch;
  * requests of any size are served by tiling the compiled batch (ragged
    tails padded, never recompiled);
  * optional data-parallel mesh: the batch shards over the ``data`` axis and
    XLA splits synthesis across chips;
  * outputs are returned as uint8 HWC frames (save_image rounding) ready for
    encoding, and ``save_stream`` overlaps PNG encoding with device compute.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from byogan_tpu.core.random import synthesis_noise, truncated_noise
from byogan_tpu.models.factory import ModelSpec, build_generator
from byogan_tpu.train.checkpoint import load_checkpoint


#: encode lane -> file extension (the one definition both the Sampler and
#: the CLIs dispatch on).
FRAME_EXTENSIONS = {"png": ".png", "jpeg": ".jpg", "raw": ".npy"}


def _save_u8(frame: np.ndarray, path: str, compression: int = 1) -> None:
    """Encode an already-quantized uint8 HWC frame (fast zlib level)."""
    from byogan_tpu.data.native import encode_png

    if encode_png(path, frame, compression=compression):
        return
    from PIL import Image

    Image.fromarray(frame).save(path)


def _save_u8_jpeg(frame: np.ndarray, path: str, quality: int) -> None:
    """JPEG-encode a uint8 HWC frame (native libjpeg, PIL fallback)."""
    from byogan_tpu.data.native import encode_jpeg

    if encode_jpeg(path, frame, quality=quality):
        return
    from PIL import Image

    Image.fromarray(frame).save(path, quality=quality)


def save_frame_u8(
    frame: np.ndarray,
    stem: str,
    format: str = "png",
    jpeg_quality: int = 92,
    png_compression: int = 1,
) -> str:
    """Write one already-quantized uint8 HWC frame via the chosen encode lane
    ("png" | "jpeg" | "raw"); returns the path written (stem + extension).

    The single definition of the format dispatch, shared by
    ``Sampler.save_stream`` and ``byogan-generate --format``.
    """
    path = stem + FRAME_EXTENSIONS[format]
    if format == "png":
        _save_u8(frame, path, compression=png_compression)
    elif format == "jpeg":
        _save_u8_jpeg(frame, path, jpeg_quality)
    else:
        np.save(path, frame)
    return path


class Sampler:
    def __init__(
        self,
        checkpoint: str,
        batch: int = 32,
        z_dim: Optional[int] = None,
        truncation: float = 0.75,
        dtype: str = "bfloat16",
        mesh=None,
        seed: Optional[int] = None,
        use_pallas: bool = False,
        use_ema: bool = False,
        truncation_psi: Optional[float] = None,
    ):
        """``use_pallas`` switches synthesis to the fused Pallas epilogue
        (ops/fused.py) — measured slower end-to-end than XLA fusion at 512px
        (benchmarks/RESULTS.md), exposed for shapes/hardware where it wins.
        ``use_ema`` samples from the EMA generator weights (checkpoints from
        runs with ``ema_beta > 0``; errors if the checkpoint has none).
        ``truncation_psi`` (extension; the reference truncates only in Z)
        applies the StyleGAN W-space truncation trick: w is pulled toward
        the mean w by ``w_mean + psi*(w - w_mean)`` before synthesis —
        psi=1.0 is a no-op, psi=0.0 collapses to the mean face; typical
        0.5-0.8 trades diversity for fidelity."""
        save = load_checkpoint(checkpoint)
        if use_ema:
            if save.get("gen_ema") is None:
                raise ValueError(
                    f"use_ema=True but {checkpoint} carries no EMA weights "
                    "(train with ema_beta > 0)"
                )
            save["gen_params"] = save["gen_ema"]
        self.steps: int = save["step"]
        self.alpha = save["alpha"]
        self.batch = batch
        if z_dim is None:
            from byogan_tpu.models.factory import z_dim_from_params

            z_dim = z_dim_from_params(save["gen_params"])
        self.z_dim = z_dim
        self.truncation = truncation
        spec = ModelSpec.from_dict(save.get("model"))
        model_dtype = None if dtype == "float32" else jnp.dtype(dtype)
        self._gen = build_generator(spec, dtype=model_dtype, use_pallas=use_pallas)
        self._params = {"params": save["gen_params"]}
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            self._params = jax.device_put(self._params, replicated)
        else:
            # Commit the restored (numpy — checkpoint loads are
            # device-agnostic, train/checkpoint.py) weights to the device
            # ONCE.  Leaving them as numpy makes every jitted synthesis
            # call re-upload the full parameter set host->device: on a
            # tunneled/bandwidth-limited host that is ~3s per batch of an
            # 82MB full-depth generator — measured 24 -> 203 img/s at
            # 512px from this one device_put (benchmarks/RESULTS.md r3).
            self._params = jax.device_put(self._params)
        self._key = jax.random.PRNGKey(
            int.from_bytes(os.urandom(4), "little") if seed is None else seed
        )

        gen, steps, alpha = self._gen, self.steps, self.alpha
        compute_dtype = model_dtype or jnp.float32
        self._compute_dtype = compute_dtype
        self.truncation_psi = truncation_psi
        self._w_mean = None  # computed lazily; see _ensure_w_mean
        get_w_mean, psi = self._ensure_w_mean, truncation_psi
        self._mix_cache: dict = {}

        def synth_raw(params, key):
            """Float NHWC frames in the generator's raw ~[-1,1] range."""
            kz, kn = jax.random.split(key)
            z = truncated_noise(kz, batch, z_dim, truncation, compute_dtype)
            noise = synthesis_noise(kn, batch, steps, dtype=compute_dtype)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                z = jax.lax.with_sharding_constraint(
                    z, NamedSharding(mesh, P("data", None))
                )
                # Pin the per-stage noise maps to the same batch sharding —
                # don't rely on XLA propagating it through the RNG ops.
                noise = [
                    jax.lax.with_sharding_constraint(
                        n, NamedSharding(mesh, P("data", None, None, None))
                    )
                    for n in noise
                ]
            if psi is None:
                img = gen.apply(
                    params, z, noise, steps=steps,
                    alpha=None if alpha is None else jnp.float32(alpha),
                )
            else:
                # W-space truncation: pull w toward the mean w (extension).
                w = gen.apply(params, z, method="map_latent")
                wm = get_w_mean().astype(w.dtype)
                w = wm + psi * (w - wm)
                img = gen.apply(
                    params, None, noise, steps=steps,
                    alpha=None if alpha is None else jnp.float32(alpha),
                    style=w,
                )
            return img.astype(jnp.float32)

        def synth(params, key):
            # Quantize ON DEVICE (torchvision save_image rounding, identical
            # to core.grids.to_uint8): a uint8 frame is 4x less device->host
            # traffic than float32 — the fetch, not the compute, bounds
            # serving throughput on bandwidth-limited hosts.
            img32 = synth_raw(params, key)
            return jnp.clip(img32 * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

        self._synth = jax.jit(synth)
        self._synth_raw = synth_raw
        self._synth_float = None  # lazily jitted by sample_float

    @property
    def resolution(self) -> int:
        return 4 * 2 ** (self.steps - 1)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _ensure_w_mean(self) -> jax.Array:
        """Canonical W center (projector.mean_w: fixed key, jitted once),
        so every surface on a given checkpoint agrees on the mean w.

        Computed LAZILY at the first synthesis trace, not at construction:
        the 4096-latent mapping forward (on the tunneled TPU backend, a
        surprise multi-second compile) bills to the first request instead
        of making ``Sampler(truncation_psi=...)`` itself block.
        """
        if self._w_mean is None:
            from byogan_tpu.projector import mean_w

            self._w_mean = mean_w(
                self._gen, self._params, self.z_dim, self.truncation
            )
        return self._w_mean

    def style_mix(self, n: int, crossover: int) -> np.ndarray:
        """n uint8 frames with COARSE stages (< ``crossover``) styled by one
        latent set and FINE stages (>= ``crossover``) by an independent one
        — classic StyleGAN style mixing, via the generator's per-stage
        ``style`` injection (models/generator.py).  ``truncation_psi``
        applies to both sets when set.

        Compilation is bounded like ``sample_batches``: the mix program is
        compiled at the constructor ``batch`` size, ONE variant per
        ``crossover`` — requests of any ``n`` tile that batch (ragged tails
        padded, never recompiled), so a long-lived serving process fed
        varying sizes holds at most ``steps + 1`` executables."""
        if not 0 <= crossover <= self.steps:
            raise ValueError(
                f"crossover must be in [0, {self.steps}], got {crossover}"
            )
        key_fn = self._mix_cache.get(crossover)
        if key_fn is None:
            gen, steps, alpha = self._gen, self.steps, self.alpha
            batch = self.batch
            compute_dtype = self._compute_dtype
            get_w_mean, psi = self._ensure_w_mean, self.truncation_psi

            def mix(params, key):
                ka, kb, kn = jax.random.split(key, 3)
                noise = synthesis_noise(kn, batch, steps, dtype=compute_dtype)

                def to_w(k):
                    z = truncated_noise(
                        k, batch, self.z_dim, self.truncation, compute_dtype
                    )
                    w = gen.apply(params, z, method="map_latent")
                    if psi is not None:
                        wm = get_w_mean().astype(w.dtype)
                        w = wm + psi * (w - wm)
                    return w

                w_a, w_b = to_w(ka), to_w(kb)
                styles = [
                    w_a if i < crossover else w_b for i in range(steps)
                ]
                img = gen.apply(
                    params, None, noise, steps=steps,
                    alpha=None if alpha is None else jnp.float32(alpha),
                    style=styles,
                )
                img32 = img.astype(jnp.float32)
                return jnp.clip(img32 * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

            key_fn = self._mix_cache[crossover] = jax.jit(mix)
        out = []
        produced = 0
        while produced < n:
            frames = np.asarray(key_fn(self._params, self._next_key()))
            take = min(self.batch, n - produced)
            out.append(frames[:take])
            produced += take
        return np.concatenate(out, axis=0)

    def sample_batches(self, n: int) -> Iterator[np.ndarray]:
        """Yield uint8 NHWC batches (device-quantized) until n produced;
        the next batch's synthesis is dispatched before the current fetch."""
        produced = 0
        pending = self._synth(self._params, self._next_key())
        while produced < n:
            take = min(self.batch, n - produced)
            produced += take
            nxt = (
                self._synth(self._params, self._next_key())
                if produced < n
                else None
            )
            yield np.asarray(pending[:take])
            pending = nxt

    def sample(self, n: int) -> np.ndarray:
        """n uint8 HWC frames (save_image rounding — SURVEY §3.2 range note)."""
        return np.concatenate(list(self.sample_batches(n)), axis=0)

    def sample_float(self, n: int) -> np.ndarray:
        """n float32 NHWC frames in the generator's raw ~[-1,1] range.

        For metrics/analysis: the uint8 path deliberately keeps the
        reference's raw-range save quantization (the negative half
        saturates to 0 — PARITY.md), which would structurally bias any
        distribution comparison against full-range real pixels.
        """
        if self._synth_float is None:
            self._synth_float = jax.jit(self._synth_raw)
        out = []
        produced = 0
        while produced < n:
            take = min(self.batch, n - produced)
            frames = np.asarray(
                self._synth_float(self._params, self._next_key()),
                np.float32,
            )
            out.append(frames[:take])
            produced += take
        return np.concatenate(out, axis=0)

    def save_stream(
        self,
        directory: str,
        n: int,
        prefix: str = "image_",
        format: str = "png",
        jpeg_quality: int = 92,
    ) -> int:
        """Write n images, overlapping encode (host) with synthesis (device).

        ``format`` picks the encode lane (default stays reference-faithful
        PNG, generate_samples.py:54-59):
          - "png":  lossless, zlib level 1 — encode-bound at 512px on this
            single host core (~19 img/s vs ~284 img/s synthesis).
          - "jpeg": native libjpeg at ``jpeg_quality`` — the fast lane for
            bulk serving (measured in benchmarks/RESULTS.md round 3).
          - "raw":  uint8 HWC .npy per frame, no encode at all — the
            zero-host-cost ceiling; consumers np.load() them.
        """
        if format not in FRAME_EXTENSIONS:
            raise ValueError(f"unknown save_stream format: {format!r}")
        os.makedirs(directory, exist_ok=True)
        q: "queue.Queue" = queue.Queue(maxsize=4)
        _DONE = object()
        error: list = []

        def writer():
            idx = 0
            while True:
                item = q.get()
                if item is _DONE:
                    return
                if error:
                    continue  # keep draining so the producer never blocks
                try:
                    for frame in item:  # frames arrive uint8 from the device
                        idx += 1
                        stem = os.path.join(directory, f"{prefix}{idx}")
                        save_frame_u8(frame, stem, format, jpeg_quality)
                except Exception as e:  # surface encode errors to the caller
                    error.append(e)

        thread = threading.Thread(target=writer, daemon=True)
        thread.start()
        written = 0
        for batch in self.sample_batches(n):
            q.put(batch)
            written += len(batch)
        q.put(_DONE)
        thread.join()
        if error:
            raise error[0]
        return written
