"""Device-mesh parallelism: data parallel + optional tensor parallel.

The reference's only parallelism is single-process ``nn.DataParallel``
(train.py:71, 79 — replicate/scatter/gather per forward, no process groups,
no NCCL; SURVEY.md §2.6).  TPU-natively both are replaced by ONE mechanism:
a ``jax.sharding.Mesh`` with axes ``("data", "model")`` and sharding
annotations — XLA inserts all collectives (gradient psum over the data axis,
activation all-gathers over the model axis) and lays them on ICI.

  * data axis: batches sharded on dim 0; params/opt-state replicated →
    per-device gradients are psum'd by XLA automatically (DP ≈ DDP, not the
    reference's scatter/gather DataParallel).
  * model axis (optional TP): the mapping network's 512x512 matmuls and the
    widest conv kernels are sharded on their output-feature dim; XLA
    resolves the layer-to-layer resharding.  At this model's scale TP is a
    demonstration of mechanism (SURVEY.md §2.6 "optional model axis"), off
    by default (model_axis=1).

Multi-host: ``jax.distributed.initialize()`` + the same mesh over
``jax.devices()`` — no transport code here at all, by design.  Data is
sharded per host: every process seeds the identical global shuffle but
decodes only its own ``batch/process_count`` row slice of each batch
(data/pipeline.py ``make_stage_loader(process_index=..., process_count=...)``),
and the slices assemble into one global jax.Array via
``jax.make_array_from_process_local_data`` (``device_prefetch``).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Feature dims at least this wide get TP-sharded (must divide evenly).
_TP_MIN_FEATURES = 256


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh.  Defaults: all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs more than the {len(devices)} devices "
            "available"
        )
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def sharding_for_leaf(
    path_str: str, shape, mesh: Mesh, tp_min_features: int = _TP_MIN_FEATURES
) -> NamedSharding:
    """Partition rule for a parameter (or optimizer-moment) leaf.

    TP rules (active only when the mesh's model axis > 1):
      * mapping-net dense weights (in, out): shard ``out`` -> P(None, "model")
      * conv kernels (kh, kw, in, out) with wide ``out``: P(None, None, None,
        "model"); biases of those layers follow on their only dim.
    Everything else (and everything when model=1) is replicated — data
    parallelism needs no per-param annotation.  ``tp_min_features`` is the
    width threshold (tests lower it to exercise TP on small models).
    """
    model_size = mesh.shape.get("model", 1)
    spec = P()
    if model_size > 1:
        is_mapping = "mapping/" in path_str
        if path_str.endswith("weight") and len(shape) == 2:
            if shape[1] >= tp_min_features and shape[1] % model_size == 0:
                spec = P(None, "model")
        elif path_str.endswith("weight") and len(shape) == 4:
            if shape[3] >= tp_min_features and shape[3] % model_size == 0:
                spec = P(None, None, None, "model")
        elif path_str.endswith("bias") and len(shape) == 1 and is_mapping:
            if shape[0] >= tp_min_features and shape[0] % model_size == 0:
                spec = P("model")
    return NamedSharding(mesh, spec)


def tree_shardings(
    tree: Any, mesh: Mesh, tp_min_features: int = _TP_MIN_FEATURES
) -> Any:
    """Sharding pytree matching ``tree`` via sharding_for_leaf."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: sharding_for_leaf(
            _path_str(path), getattr(leaf, "shape", ()), mesh, tp_min_features
        ),
        tree,
    )


def shard_train_state(state, mesh: Mesh, tp_min_features: int = _TP_MIN_FEATURES):
    """Place a TrainState on the mesh: params/opt-state per TP rules
    (replicated over data), counters/rng replicated."""
    def place(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(
                leaf,
                sharding_for_leaf(
                    _path_str(path), getattr(leaf, "shape", ()), mesh,
                    tp_min_features,
                ),
            ),
            tree,
        )

    replicated = NamedSharding(mesh, P())
    return state.replace(
        gen_params=place(state.gen_params),
        critic_params=place(state.critic_params),
        gen_opt_state=place(state.gen_opt_state),
        critic_opt_state=place(state.critic_opt_state),
        # EMA leaves mirror gen_params' paths, so the same TP rules apply.
        gen_ema=(
            place(state.gen_ema) if state.gen_ema is not None else None
        ),
        rng=jax.device_put(state.rng, replicated),
        iters=jax.device_put(state.iters, replicated),
        im_count=jax.device_put(state.im_count, replicated),
        aug_p=(
            jax.device_put(state.aug_p, replicated)
            if state.aug_p is not None
            else None
        ),
        rt_ema=(
            jax.device_put(state.rt_ema, replicated)
            if state.rt_ema is not None
            else None
        ),
        pl_ema=(
            jax.device_put(state.pl_ema, replicated)
            if state.pl_ema is not None
            else None
        ),
    )


def shard_batch(batch: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard an NHWC batch over the data axis."""
    return jax.device_put(
        batch, NamedSharding(mesh, P("data", None, None, None))
    )
