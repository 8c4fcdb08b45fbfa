"""Model construction from a serializable spec.

The reference hardcodes one architecture (8 stages, 512-max channels,
gan.py:157-181/305-329).  Here the same tables are the *default* of a
``ModelSpec`` that also supports fewer stages and scaled channel widths —
small models for CPU tests/CI, full size for production — and the spec is
persisted in checkpoint metadata so the sampling/interpolation CLIs can
rebuild the exact architecture a checkpoint was trained with.

``ModelSpec()`` (defaults) is bit-compatible with reference checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from byogan_tpu.models.critic import CRITIC_CHANNELS, CRITIC_FROM_RGB, Critic
from byogan_tpu.models.generator import GENERATOR_CHANNELS, Generator

_MIN_CHANNELS = 4


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    num_stages: int = 8
    channel_divisor: int = 1
    style_dim: int = 512
    mapping_depth: int = 8

    def __post_init__(self):
        if not 1 <= self.num_stages <= len(GENERATOR_CHANNELS):
            raise ValueError(f"num_stages must be in [1, 8], got {self.num_stages}")
        if self.channel_divisor < 1:
            raise ValueError("channel_divisor must be >= 1")

    def _scale(self, c: int) -> int:
        return max(c // self.channel_divisor, _MIN_CHANNELS)

    def generator_channels(self) -> Tuple[Tuple[int, int], ...]:
        return tuple(
            (self._scale(ic), self._scale(oc))
            for ic, oc in GENERATOR_CHANNELS[: self.num_stages]
        )

    def critic_from_rgb(self) -> Tuple[int, ...]:
        # Critic tables are highest-resolution-first (gan.py:305-329): an
        # n-stage model keeps the LAST n entries.
        return tuple(
            self._scale(c)
            for c in CRITIC_FROM_RGB[len(CRITIC_FROM_RGB) - self.num_stages :]
        )

    def critic_blocks(self) -> Tuple[Tuple[int, int], ...]:
        return tuple(
            (self._scale(ic), self._scale(oc))
            for ic, oc in CRITIC_CHANNELS[len(CRITIC_CHANNELS) - self.num_stages :]
        )

    @property
    def is_reference_compatible(self) -> bool:
        return self == ModelSpec()

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Optional[Dict[str, Any]]) -> "ModelSpec":
        if not d:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def z_dim_from_params(gen_params) -> int:
    """The latent size a checkpoint was trained with — the mapping net's
    first dense weight is (z_dim, style_dim).  Lets the sampling surfaces
    default to the right z size instead of a hardcoded 512 (the reference
    CLI silently requires the user to pass -z for non-512 models)."""
    return int(gen_params["mapping"]["dense0"]["weight"].shape[0])


def build_generator(
    spec: ModelSpec = ModelSpec(),
    dtype=None,
    use_pallas: bool = False,
) -> Generator:
    return Generator(
        channels=spec.generator_channels(),
        style_dim=spec._scale(spec.style_dim) if spec.channel_divisor > 1
        else spec.style_dim,
        mapping_depth=spec.mapping_depth,
        dtype=dtype,
        use_pallas=use_pallas,
    )


def build_critic(spec: ModelSpec = ModelSpec(), dtype=None) -> Critic:
    return Critic(
        from_rgb_channels=spec.critic_from_rgb(),
        block_channels=spec.critic_blocks(),
        dtype=dtype,
    )
