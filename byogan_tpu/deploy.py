"""Self-contained serving artifacts via ``jax.export`` (StableHLO).

The reference's only deployment story is "ship the .pth and the Python
model code" (generate_samples.py:50-57 rebuilds the module graph from
source before it can sample).  On TPU the idiomatic artifact is the
compiled program itself: ``export_stablehlo`` traces the full synthesis
path — mapping network, per-stage blocks, device-side uint8 quantization —
into ONE StableHLO module with the generator weights embedded as
constants, serialized with ``jax.export``.  The blob is:

  * self-contained — no byogan_tpu, flax, or checkpoint needed to serve;
    any process with jax (or a StableHLO runtime) can run it;
  * multi-platform — lowered once for each requested platform
    (default ``("cpu", "tpu")``), so the same file serves on a TPU pod
    and on a CPU fallback host;
  * stable — jax.export's versioned calling convention guarantees
    loadability across jax releases within the compatibility window.

Exported signature (the serving contract, recorded in the JSON sidecar):

    (z: f32[batch, z_dim], seed: i32[]) -> u8[batch, res, res, 3]

The caller supplies latents (so interpolation / truncation / projection
all stay possible downstream) and a seed for the per-stage synthesis
noise; frames come back already quantized with the save_image rounding
(serve.Sampler's uint8 contract — 4x less fetch traffic than f32).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import numpy as np

#: sidecar suffix for the JSON metadata written next to the blob.
META_SUFFIX = ".json"


def export_stablehlo(
    checkpoint: str,
    out_path: str,
    batch: int = 32,
    dtype: str = "bfloat16",
    use_ema: bool = False,
    truncation_psi: Optional[float] = None,
    truncation: float = 0.75,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> dict:
    """Export ``checkpoint``'s generator as a serialized StableHLO module.

    Writes the blob to ``out_path`` and a JSON sidecar (shape/contract
    metadata) to ``out_path + ".json"``; returns the metadata dict.

    ``truncation_psi`` bakes the W-space truncation trick into the module:
    the canonical mean w (projector.mean_w, computed once at export time)
    is embedded as a constant and every request's w is pulled toward it.
    ``truncation`` only matters for that mean-w computation — it is the
    training z distribution (config.noise_trunc; see CLAUDE.md on why the
    mean must be taken where the model was trained).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from byogan_tpu.core.random import synthesis_noise
    from byogan_tpu.models.factory import (
        ModelSpec,
        build_generator,
        z_dim_from_params,
    )
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(checkpoint)
    if use_ema:
        if save.get("gen_ema") is None:
            raise ValueError(
                f"use_ema=True but {checkpoint} carries no EMA weights "
                "(train with ema_beta > 0)"
            )
        save["gen_params"] = save["gen_ema"]
    steps: int = save["step"]
    alpha = save["alpha"]
    spec = ModelSpec.from_dict(save.get("model"))
    compute_dtype = jnp.float32 if dtype == "float32" else jnp.dtype(dtype)
    gen = build_generator(
        spec, dtype=None if dtype == "float32" else compute_dtype
    )
    params = {"params": save["gen_params"]}  # numpy leaves -> baked constants
    z_dim = z_dim_from_params(save["gen_params"])

    w_mean = None
    if truncation_psi is not None:
        from byogan_tpu.projector import mean_w

        # Eager, once, at export time; embedded as a module constant.
        w_mean = np.asarray(mean_w(gen, params, z_dim, truncation), np.float32)

    def synth(z, seed):
        noise = synthesis_noise(
            jax.random.PRNGKey(seed), batch, steps, dtype=compute_dtype
        )
        a = None if alpha is None else jnp.float32(alpha)
        if truncation_psi is None:
            img = gen.apply(
                params, z.astype(compute_dtype), noise, steps=steps, alpha=a
            )
        else:
            w = gen.apply(params, z.astype(compute_dtype), method="map_latent")
            wm = jnp.asarray(w_mean, w.dtype)
            w = wm + truncation_psi * (w - wm)
            img = gen.apply(params, None, noise, steps=steps, alpha=a, style=w)
        # save_image rounding on device (core.grids.to_uint8 semantics).
        img32 = img.astype(jnp.float32)
        return jnp.clip(img32 * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    exported = jexport.export(jax.jit(synth), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((batch, z_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)

    meta = {
        "format": "jax.export/stablehlo",
        "signature": "(z: f32[batch, z_dim], seed: i32[]) -> "
        "u8[batch, res, res, 3]",
        "batch": batch,
        "z_dim": z_dim,
        "resolution": 4 * 2 ** (steps - 1),
        "steps": steps,
        "alpha": alpha,
        "dtype": dtype,
        "use_ema": use_ema,
        "truncation_psi": truncation_psi,
        "train_truncation": truncation,
        "platforms": list(platforms),
        "model": spec.to_dict(),
        "bytes": len(blob),
    }
    with open(out_path + META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedSampler:
    """Serve from a ``export_stablehlo`` blob — no checkpoint, no model code.

    Latents should come from the TRAINING distribution — a truncated
    normal at ``meta["train_truncation"]`` (framework invariant: wider z
    probes latents the model never saw and measurably degrades samples;
    benchmarks/RESULTS.md round 2).  ``sample_z`` draws them correctly:

    >>> s = ExportedSampler("gen.hlo")
    >>> frames = s(s.sample_z(seed=3), seed=7)
    """

    def __init__(self, path: str):
        import jax
        from jax import export as jexport

        with open(path, "rb") as f:
            blob = f.read()
        self._exported = jexport.deserialize(bytearray(blob))
        try:
            with open(path + META_SUFFIX) as f:
                self.meta = json.load(f)
        except FileNotFoundError:
            self.meta = {}
        self._call = jax.jit(self._exported.call)

    def sample_z(self, seed: int = 0) -> np.ndarray:
        """One traced batch of latents from the TRAINING distribution
        (truncated normal at ``meta["train_truncation"]``, shape
        ``in_shape``) — the z distribution the module's weights were
        trained and mean-w-centered on."""
        import jax

        from byogan_tpu.core.random import truncated_noise

        batch, z_dim = self.in_shape
        trunc = float(self.meta.get("train_truncation", 0.75))
        return np.asarray(
            truncated_noise(jax.random.PRNGKey(seed), batch, z_dim, trunc),
            np.float32,
        )

    def __call__(self, z: np.ndarray, seed: int = 0) -> np.ndarray:
        import jax.numpy as jnp

        z = np.asarray(z)
        if tuple(z.shape) != self.in_shape:
            raise ValueError(
                f"z has shape {tuple(z.shape)} but the module was traced at "
                f"(batch, z_dim) = {self.in_shape} (see the .json sidecar; "
                "jax.export modules are fixed-shape — re-export with "
                "--batch to change it)"
            )
        return np.asarray(
            self._call(jnp.asarray(z, jnp.float32), jnp.int32(seed))
        )

    @property
    def in_shape(self) -> Tuple[int, int]:
        """(batch, z_dim) the module was traced at."""
        shape = self._exported.in_avals[0].shape
        return (int(shape[0]), int(shape[1]))
