"""Typed training config + reference-compatible INI loading.

The reference's user-facing surface is ``config.txt`` parsed with stdlib
configparser (reference main.py:21-24) with ``[DEFAULT]`` inheritance and
per-dataset sections, values parsed at train.py:18-41.  We keep the same file
format and keys as the compatibility boundary and parse into a typed
dataclass, preserving the reference's parse quirks:

  * ``use_r1`` is true iff the string equals exactly ``"True"``
    (train.py:25);
  * ``gradient_lambda`` is parsed with int() (train.py:18);
  * ``lr`` defaults to 0.001 in code even though config.txt ships 0.002
    (train.py:23 vs config.txt:13);
  * ``final_image_size`` is read by nobody — the resolution ceiling is
    ``len(epoch_progression)`` (SURVEY.md §2.7) — we accept and ignore it.

TPU-native extras (seed, dtype, mesh axes, output dirs) get their own keys
with defaults, so reference config files work unmodified.
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from typing import List, Mapping, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # --- reference-compatible knobs (train.py:18-41) ---
    data: Optional[str] = None
    device: str = "tpu"  # reference key `device` (config.txt:10); "cpu" forces
    # the CPU backend, anything else uses jax's default platform
    c_lambda: float = 10.0
    noise_size: int = 512
    beta_1: float = 0.0
    beta_2: float = 0.99
    learning_rate: float = 0.001
    critic_repeats: int = 1
    use_r1: bool = True
    num_workers: int = 2
    display_step: int = 250
    checkpoint_step: int = 2000
    refresh_stat_step: int = 5
    batch_progression: Tuple[int, ...] = (24, 16, 16, 16, 12, 10, 5, 5)
    epoch_progression: Tuple[int, ...] = (10, 20, 20, 30, 30, 20, 20, 15)
    fade_percentage: float = 0.5
    # --- TPU-native knobs ---
    channel_divisor: int = 1  # scale down all channel widths (1 = reference)
    mapping_depth: int = 8
    seed: int = 0
    compute_dtype: str = "bfloat16"  # "float32" for bit-parity runs
    remat: bool = False  # jax.checkpoint the network applies inside the step:
    # trades ~1/3 more FLOPs for much smaller live activation memory, which
    # buys bigger batches at the 256/512px stages (benchmarks/RESULTS.md)
    remat_progression: Optional[Tuple[bool, ...]] = None  # per-stage remat
    # override (one flag per stage, like batch_progression); None = the
    # global `remat` everywhere.  Measured: stage 7 is fastest at batch 128
    # WITH remat (263.5 img/s, +35% over its best no-remat batch) while
    # remat costs 25-30% at every other stage (RESULTS.md round-3 table) —
    # this key lets a schedule buy stage 7's win without paying elsewhere.
    data_axis: int = 1  # data-parallel mesh size (1 = single chip)
    model_axis: int = 1  # tensor-parallel mesh size
    checkpoint_dir: str = "./checkpoints"
    output_dir: str = "./output"
    mapping_lr_mult: float = 0.01  # StyleGAN mapping-net LR trick (train.py:63)
    eval_step: int = 0  # every N iterations, compute the SWD sample-quality
    # metric (eval/swd.py) against the real set and log it to metrics.jsonl
    # as a {"kind": "eval"} record.  0 = off (the reference has no metric);
    # when off the hot loop is untouched.
    eval_images: int = 64  # images per side for the periodic SWD readout
    ema_beta: float = 0.0  # exponential moving average of generator weights
    # (0 = off, the reference behavior; typical 0.999).  An EMA generator is
    # the standard StyleGAN sampling-quality trick the reference lacks; when
    # enabled the shadow weights ride along in TrainState/checkpoints and
    # sampling surfaces opt in via --ema / Sampler(use_ema=True).  Training
    # dynamics are untouched (the EMA is never trained against).
    # NOTE: there is deliberately no `use_pallas` training knob — the Pallas
    # epilogue is forward-only and measured slower than XLA fusion in the
    # training path (benchmarks/RESULTS.md); it is exposed where it can run:
    # serve.Sampler(use_pallas=...) and the sampling CLIs' --pallas flag.
    r1_interval: int = 1  # lazy R1 regularization (opt-in; StyleGAN2 "lazy
    # regularization"): apply the R1 penalty's double-backward only every N
    # critic iterations, with lambda scaled by N so the effective strength
    # is unchanged.  1 = the reference behavior (penalty every iteration,
    # train.py:181/gan.py:398-400).  Requires use_r1=True.  Implemented as a
    # lax.cond inside the one compiled step — no extra jit buckets.
    max_checkpoints: int = 0  # checkpoint rotation (opt-in; 0 = keep every
    # periodic checkpoint, the reference behavior train.py:247-259).  N > 0
    # keeps only the newest N periodic chk-* dirs after each save (a
    # full-depth checkpoint is ~1.5GB); FINAL is never pruned.
    style_mix_prob: float = 0.0  # style-mixing regularization (opt-in;
    # StyleGAN §3.1 "mixing regularization"): with this probability per
    # sample, training forwards draw a SECOND latent and cross over to its
    # w at a uniform-random stage boundary (stage granularity — the
    # reference's StyleGanBlock shares one style across its two convs,
    # gan.py:125-127).  0 = the reference behavior (one w for all layers,
    # gan.py:185).  Applies to generator forwards in BOTH the critic and
    # generator phases; eval/sampling are untouched.  No effect at stage 1
    # (no crossover point exists below two stages).
    aug_p: float = 0.0  # differentiable critic-input augmentation (opt-in;
    # DiffAugment/ADA family, ops/augment.py): with this per-sample,
    # per-transform probability, BOTH real and fake images entering the
    # critic are augmented (x-flip, translate, brightness/contrast/
    # saturation, cutout) — the small-dataset overfit countermeasure the
    # reference lacks.  0 = off (the reference behavior; the compiled step
    # is untouched).  With ada_target > 0 this is only the INITIAL p.
    ada_target: float = 0.0  # adaptive augmentation (opt-in; StyleGAN2-ADA):
    # steer aug_p so the critic's overfit heuristic r_t = E[sign(D(real))]
    # sits at this target (paper default 0.6).  The controller runs inside
    # the compiled step on a dynamic scalar (TrainState.aug_p) — adapting p
    # never retraces.  0 = off.  Requires use_r1=True (r_t is a logistic-
    # loss statistic; WGAN scores have no calibrated zero).
    ada_speed: int = 500_000  # images over which the ADA controller can move
    # p across the full [0, 1] range (paper: 500k).  Smaller = faster
    # adaptation; scale it down with tiny demo datasets.
    ada_rt_beta: float = 0.9  # per-iteration EMA decay for the controller's
    # r_t input (window ~ 1/(1-beta) iterations; the paper integrates r_t
    # over 4 minibatches x 64 images).  A single minibatch's
    # E[sign(D(real))] is +-1-quantized at small batches, so steering on it
    # raw makes p jitter (benchmarks/ada round 3); the EMA — one dynamic f32
    # scalar in TrainState — smooths the input without changing the
    # endpoint.  0.0 = steer on the per-iteration reading directly.
    plr_weight: float = 0.0  # path-length regularization (opt-in; StyleGAN2
    # §3.2 "path length regularization", the companion of lazy R1 on the
    # GENERATOR side): penalize mean((||J_w^T y|| - a)^2) where J_w is the
    # synthesis Jacobian at w, y a unit-variance random image direction, and
    # a a running mean of the observed path lengths (TrainState.pl_ema) —
    # pushes the w -> image map toward uniform scaling, the StyleGAN2
    # conditioning trick behind its smoother latent space.  0 = off (the
    # reference behavior; the compiled step is untouched).  Paper weight: 2.
    plr_interval: int = 8  # apply the PLR penalty (a second-order path like
    # R1's) only every N generator iterations, weight scaled by N — always
    # lazy, as in the paper (G reg interval).  lax.cond inside the one
    # compiled step; no extra jit buckets.
    plr_decay: float = 0.01  # pl_ema <- pl_ema + decay*(mean(pl) - pl_ema)
    # per penalized iteration (paper 0.01) — one dynamic f32 scalar, no
    # retrace.
    plr_batch_shrink: int = 2  # compute the penalty on batch//shrink fresh
    # latents (paper 2): the second-order path costs a backward through the
    # synthesis stack, and a quarter/half batch estimates pl_mean fine.
    show_noise_count: int = 25  # fixed eval grid, 5x5 (train.py:83)
    show_noise_trunc: float = 0.75
    noise_trunc: float = 0.75  # latent truncation during training (train.py:139)

    def __post_init__(self):
        # Fail at construction, not hours into a run: stage_batch() indexes
        # batch_progression per stage while num_stages comes from
        # epoch_progression — a short batch_progression would otherwise
        # IndexError at the final stage boundary after most of the schedule's
        # wall-clock had already been spent (the reference has the same
        # latent mismatch, train.py:33-38 / config.txt:4-5).
        if len(self.batch_progression) < len(self.epoch_progression):
            raise ValueError(
                f"batch_progression has {len(self.batch_progression)} entries "
                f"but epoch_progression defines {len(self.epoch_progression)} "
                "stages; every stage needs a batch size"
            )
        if self.remat_progression is not None and len(
            self.remat_progression
        ) != len(self.epoch_progression):
            raise ValueError(
                f"remat_progression has {len(self.remat_progression)} flags "
                f"for {len(self.epoch_progression)} stages"
            )
        if self.plr_weight > 0.0 and (
            self.plr_interval < 1 or self.plr_batch_shrink < 1
        ):
            raise ValueError(
                "plr_interval and plr_batch_shrink must be >= 1 when "
                f"plr_weight > 0 (got {self.plr_interval}, "
                f"{self.plr_batch_shrink})"
            )

    @property
    def num_stages(self) -> int:
        return len(self.epoch_progression)

    @property
    def use_aug(self) -> bool:
        """Static augmentation gate: either a fixed aug_p or the ADA
        controller turns the (otherwise absent) augment path on."""
        return self.aug_p > 0.0 or self.ada_target > 0.0

    def stage_batch(self, stage_index: int) -> int:
        return self.batch_progression[stage_index]

    def stage_remat(self, stage_index: int) -> bool:
        """Per-stage remat flag (remat_progression overrides global remat)."""
        if self.remat_progression is None:
            return self.remat
        if len(self.remat_progression) != self.num_stages:
            raise ValueError(
                f"remat_progression has {len(self.remat_progression)} flags "
                f"for {self.num_stages} stages"
            )
        return self.remat_progression[stage_index]

    def stage_epochs(self, stage_index: int) -> int:
        return self.epoch_progression[stage_index]


def _parse_int_list(s: str) -> Tuple[int, ...]:
    return tuple(int(v) for v in s.split(","))


def config_from_mapping(section: Mapping[str, str]) -> TrainConfig:
    """Build a TrainConfig from a configparser section (reference key names)."""
    get = section.get
    defaults = TrainConfig()
    return TrainConfig(
        data=get("data", None),
        device=get("device", defaults.device),
        c_lambda=float(int(get("gradient_lambda", 10))),  # int() parse, train.py:18
        noise_size=int(get("noise_length", 512)),
        beta_1=float(get("beta_1", 0.00)),
        beta_2=float(get("beta_2", 0.99)),
        learning_rate=float(get("lr", 0.001)),  # code default 0.001, train.py:23
        critic_repeats=int(get("critic_repeats", 1)),
        use_r1=str(get("use_r1", "True")) == "True",  # exact-match, train.py:25
        num_workers=int(get("dataloader_threads", 2)),
        display_step=int(get("display_step", 250)),
        checkpoint_step=int(get("checkpoint_step", 2000)),
        refresh_stat_step=int(get("refresh_stat_step", 5)),
        batch_progression=_parse_int_list(
            get("batch_progression", "24,16,16,16,12,10,5,5")
        ),
        epoch_progression=_parse_int_list(
            get("epoch_progression", "10,20,20,30,30,20,20,15")
        ),
        fade_percentage=float(get("fade_percentage", 0.5)),
        channel_divisor=int(get("channel_divisor", defaults.channel_divisor)),
        mapping_depth=int(get("mapping_depth", defaults.mapping_depth)),
        seed=int(get("seed", defaults.seed)),
        compute_dtype=get("compute_dtype", defaults.compute_dtype),
        remat=str(get("remat", "False")) == "True",
        remat_progression=(
            tuple(v.strip() == "True" for v in get("remat_progression").split(","))
            if get("remat_progression")
            else None
        ),
        data_axis=int(get("data_axis", defaults.data_axis)),
        model_axis=int(get("model_axis", defaults.model_axis)),
        checkpoint_dir=get("checkpoint_dir", defaults.checkpoint_dir),
        output_dir=get("output_dir", defaults.output_dir),
        ema_beta=float(get("ema_beta", defaults.ema_beta)),
        r1_interval=int(get("r1_interval", defaults.r1_interval)),
        style_mix_prob=float(get("style_mix_prob", defaults.style_mix_prob)),
        max_checkpoints=int(get("max_checkpoints", defaults.max_checkpoints)),
        aug_p=float(get("aug_p", defaults.aug_p)),
        ada_target=float(get("ada_target", defaults.ada_target)),
        ada_speed=int(get("ada_speed", defaults.ada_speed)),
        ada_rt_beta=float(get("ada_rt_beta", defaults.ada_rt_beta)),
        plr_weight=float(get("plr_weight", defaults.plr_weight)),
        plr_interval=int(get("plr_interval", defaults.plr_interval)),
        plr_decay=float(get("plr_decay", defaults.plr_decay)),
        plr_batch_shrink=int(
            get("plr_batch_shrink", defaults.plr_batch_shrink)
        ),
        eval_step=int(get("eval_step", defaults.eval_step)),
        eval_images=int(get("eval_images", defaults.eval_images)),
    )


def load_ini_config(path: str, section: str) -> TrainConfig:
    """Load ``config.txt``-style INI (reference main.py:21-24)."""
    parser = configparser.ConfigParser()
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    parser.read(path)
    try:
        return config_from_mapping(parser[section])
    except ValueError as e:
        raise ValueError(f"{path} [{section}]: {e}") from e
