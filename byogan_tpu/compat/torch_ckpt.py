"""PyTorch <-> byogan_tpu checkpoint bridge.

The reference saves ``torch.save`` dicts with keys
{gen, critic, iter, im_count, step, epoch, alpha} (reference train.py:248-259)
whose state dicts carry ``module.``-prefixed keys because both nets are
wrapped in ``nn.DataParallel`` before saving (train.py:71, train.py:79 — the
wrap is load-bearing for ``generate_samples.py:48-52``).

This module converts those state dicts to/from our NHWC flax param pytrees:

  layout transforms (torch -> ours):
    linear  (out, in)        -> (in, out)            transpose
    conv    (O, I, kH, kW)   -> (kH, kW, I, O)       OIHW -> HWIO
    noise   (1, C, 1, 1)     -> (C,)
    const   (1, C, 4, 4)     -> (1, 4, 4, C)         NCHW -> NHWC

Key maps are generated programmatically from the architecture tables so the
converter stays in lock-step with models/.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

FlatParams = Dict[Tuple[str, ...], np.ndarray]


def _strip_module(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _linear_in(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _linear_out(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv_in(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _conv_out(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))  # HWIO -> OIHW


def _unflatten(flat: FlatParams) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value
    return tree


def _flatten(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()) -> FlatParams:
    out: FlatParams = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# Generator


def _generator_key_map(num_stages: int = 8, mapping_depth: int = 8):
    """[(torch_key, flax_path, kind)] — kind in {linear, conv, noise, const, bias}."""
    entries = []
    for i in range(mapping_depth):
        # MappingLayers nested as to_w_noise.0.layers.{i}.0 (reference
        # gan.py:133-145, gan.py:155).
        base = f"to_w_noise.0.layers.{i}.0"
        entries.append((f"{base}.weight", ("mapping", f"dense{i}", "weight"), "linear"))
        entries.append((f"{base}.bias", ("mapping", f"dense{i}", "bias"), "bias"))
    for k in range(num_stages):
        stage = f"stages_{k}"
        for torch_conv, ours in (("conv_1", "conv1"), ("conv_2", "conv2")):
            base = f"gen_blocks.{k}.{torch_conv}"
            if torch_conv == "conv_1" and k == 0:
                # Learned 4x4 constant (gan.py:81): bare nn.Parameter "conv".
                entries.append((f"{base}.conv", (stage, ours, "const"), "const"))
            else:
                entries.append(
                    (f"{base}.conv.weight", (stage, ours, "conv", "weight"), "conv")
                )
                entries.append(
                    (f"{base}.conv.bias", (stage, ours, "conv", "bias"), "bias")
                )
            entries.append(
                (
                    f"{base}.inject_noise.weights",
                    (stage, ours, "noise", "weight"),
                    "noise",
                )
            )
            entries.append(
                (
                    f"{base}.adain.style.weight",
                    (stage, ours, "adain", "style", "weight"),
                    "linear",
                )
            )
            entries.append(
                (
                    f"{base}.adain.style.bias",
                    (stage, ours, "adain", "style", "bias"),
                    "bias",
                )
            )
        entries.append((f"to_rgbs.{k}.weight", (f"to_rgbs_{k}", "weight"), "conv"))
        entries.append((f"to_rgbs.{k}.bias", (f"to_rgbs_{k}", "bias"), "bias"))
    return entries


def _critic_key_map(num_stages: int = 8):
    entries = []
    for k in range(num_stages):
        entries.append(
            (f"from_rgbs.{k}.0.weight", (f"from_rgbs_{k}", "conv", "weight"), "conv")
        )
        entries.append(
            (f"from_rgbs.{k}.0.bias", (f"from_rgbs_{k}", "conv", "bias"), "bias")
        )
        block = f"blocks_{k}"
        if k == num_stages - 1:
            # Final block (gan.py:237-251): conv_1 = Seq(stddev, conv, lrelu);
            # conv_2 = Seq(conv4, lrelu, flatten, linear, lrelu, linear).
            entries.append(
                (f"conv_blocks.{k}.conv_1.1.weight", (block, "conv1", "weight"), "conv")
            )
            entries.append(
                (f"conv_blocks.{k}.conv_1.1.bias", (block, "conv1", "bias"), "bias")
            )
            entries.append(
                (f"conv_blocks.{k}.conv_2.0.weight", (block, "conv2", "weight"), "conv")
            )
            entries.append(
                (f"conv_blocks.{k}.conv_2.0.bias", (block, "conv2", "bias"), "bias")
            )
            entries.append(
                (
                    f"conv_blocks.{k}.conv_2.3.weight",
                    (block, "dense1", "weight"),
                    "linear",
                )
            )
            entries.append(
                (f"conv_blocks.{k}.conv_2.3.bias", (block, "dense1", "bias"), "bias")
            )
            entries.append(
                (
                    f"conv_blocks.{k}.conv_2.5.weight",
                    (block, "dense2", "weight"),
                    "linear",
                )
            )
            entries.append(
                (f"conv_blocks.{k}.conv_2.5.bias", (block, "dense2", "bias"), "bias")
            )
        else:
            entries.append(
                (f"conv_blocks.{k}.conv_1.0.weight", (block, "conv1", "weight"), "conv")
            )
            entries.append(
                (f"conv_blocks.{k}.conv_1.0.bias", (block, "conv1", "bias"), "bias")
            )
            entries.append(
                (f"conv_blocks.{k}.conv_2.0.weight", (block, "conv2", "weight"), "conv")
            )
            entries.append(
                (f"conv_blocks.{k}.conv_2.0.bias", (block, "conv2", "bias"), "bias")
            )
    return entries


def _torch_to_flax(state: Mapping[str, Any], key_map) -> Dict[str, Any]:
    state = _strip_module(state)
    flat: FlatParams = {}
    for torch_key, path, kind in key_map:
        if torch_key not in state:
            raise KeyError(f"missing key in torch state dict: {torch_key}")
        v = state[torch_key].astype(np.float32)
        if kind == "linear":
            v = _linear_in(v)
        elif kind == "conv":
            v = _conv_in(v)
        elif kind == "noise":
            v = v.reshape(-1)  # (1,C,1,1) -> (C,)
        elif kind == "const":
            v = np.ascontiguousarray(v.transpose(0, 2, 3, 1))  # NCHW -> NHWC
        flat[path] = v
    return _unflatten(flat)


def _flax_to_torch(params: Mapping[str, Any], key_map) -> Dict[str, np.ndarray]:
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    for torch_key, path, kind in key_map:
        if path not in flat:
            raise KeyError(f"missing param path: {'/'.join(path)}")
        v = np.asarray(flat[path], dtype=np.float32)
        if kind == "linear":
            v = _linear_out(v)
        elif kind == "conv":
            v = _conv_out(v)
        elif kind == "noise":
            v = v.reshape(1, -1, 1, 1)
        elif kind == "const":
            v = np.ascontiguousarray(v.transpose(0, 3, 1, 2))
        out[torch_key] = v
    return out


def generator_params_from_torch(
    state: Mapping[str, Any], num_stages: int = 8, mapping_depth: int = 8
) -> Dict[str, Any]:
    """Reference generator state dict (``save["gen"]``) -> flax params tree."""
    return _torch_to_flax(state, _generator_key_map(num_stages, mapping_depth))


def critic_params_from_torch(
    state: Mapping[str, Any], num_stages: int = 8
) -> Dict[str, Any]:
    """Reference critic state dict (``save["critic"]``) -> flax params tree."""
    return _torch_to_flax(state, _critic_key_map(num_stages))


def generator_params_to_torch(
    params: Mapping[str, Any],
    num_stages: int = 8,
    mapping_depth: int = 8,
    data_parallel_prefix: bool = True,
) -> Dict[str, np.ndarray]:
    """Flax generator params -> reference-compatible torch state dict (numpy
    values; prefix ``module.`` so reference CLIs that wrap in DataParallel can
    load it, generate_samples.py:48-52)."""
    state = _flax_to_torch(params, _generator_key_map(num_stages, mapping_depth))
    if data_parallel_prefix:
        state = {f"module.{k}": v for k, v in state.items()}
    return state


def critic_params_to_torch(
    params: Mapping[str, Any], num_stages: int = 8, data_parallel_prefix: bool = True
) -> Dict[str, np.ndarray]:
    state = _flax_to_torch(params, _critic_key_map(num_stages))
    if data_parallel_prefix:
        state = {f"module.{k}": v for k, v in state.items()}
    return state


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint into JAX-ready pieces.

    Returns dict with keys: gen_params, critic_params (flax trees), iter,
    im_count, step, epoch, alpha — the logical fields of the reference
    checkpoint (train.py:248-259).
    """
    import torch  # local import: torch is only needed at the compat boundary

    save = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {
        "iter": int(save.get("iter", 0)),
        "im_count": int(save.get("im_count", 0)),
        "step": int(save.get("step", 1)),
        "epoch": int(save.get("epoch", 0)),
        "alpha": save.get("alpha", None),
    }
    if "gen" in save:
        out["gen_params"] = generator_params_from_torch(save["gen"])
    if "critic" in save:
        out["critic_params"] = critic_params_from_torch(save["critic"])
    return out
