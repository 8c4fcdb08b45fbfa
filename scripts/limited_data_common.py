"""Shared pieces for the limited-data quality experiments (VERDICT r4 #2/#6).

Both the ADA benefit experiment (scripts/ada_limited_data.py) and the PLR
quality readout (scripts/plr_quality.py) need the same scaffold: ONE
structured corpus split into a small TRAIN set and a disjoint HELD-OUT set
(both prepped into resolution pyramids), multiple training arms from one
seed, and post-hoc scoring of saved checkpoints against the held-out set.
The reference has no analogue of any of this (no eval at all, SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional


def prepare_split_data(
    out_root: str,
    n_train: int,
    n_heldout: int,
    size: int,
    seed: int,
) -> Dict[str, str]:
    """One structured corpus, split DISJOINTLY into train/ and heldout/
    dataset roots (each with its own prepared/ pyramid).  Idempotent.

    The split happens at the raw-image level BEFORE prep, so the two sets
    share the corpus distribution but no images — held-out scores measure
    generalization, not recall.
    """
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_structured_dataset

    train = os.path.join(out_root, "train_data")
    heldout = os.path.join(out_root, "heldout_data")
    if all(
        os.path.isdir(os.path.join(d, "prepared")) for d in (train, heldout)
    ):
        return {"train": train, "heldout": heldout}

    raw = os.path.join(out_root, "raw")
    shutil.rmtree(raw, ignore_errors=True)
    write_structured_dataset(
        raw, n_images=n_train + n_heldout, seed=seed, size=size
    )
    names = sorted(os.listdir(raw))
    assert len(names) == n_train + n_heldout
    for dest, chunk in (
        (train, names[:n_train]),
        (heldout, names[n_train:]),
    ):
        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest)
        for name in chunk:
            shutil.copy(os.path.join(raw, name), os.path.join(dest, name))
        prepare_pyramid(dest, 4, size)
    shutil.rmtree(raw, ignore_errors=True)
    return {"train": train, "heldout": heldout}


def heldout_swd_trajectory(
    checkpoint_dir: str,
    heldout_data: str,
    n_images: int,
    seed: int = 0,
    use_ema: bool = False,
    stage: Optional[int] = None,
) -> List[dict]:
    """Score saved checkpoints of a run against the HELD-OUT set.

    For each checkpoint (sorted by iteration, FINAL last): SWD between
    ``n_images`` generated samples and the held-out reals at the
    checkpoint's resolution, plus the generated set's MS-SSIM diversity.
    This is the overfit readout the in-loop eval lane cannot give (it
    scores against the TRAIN reals).  ``stage`` restricts scoring to
    checkpoints of that progressive stage (the default scores only the
    FINAL checkpoint's stage — mixed resolutions are not comparable).
    """
    import jax
    import numpy as np

    from byogan_tpu.data.pipeline import open_stage_dataset
    from byogan_tpu.eval.msssim import msssim_diversity
    from byogan_tpu.eval.swd import sliced_wasserstein_distance
    from byogan_tpu.serve import Sampler
    from byogan_tpu.train.checkpoint import load_checkpoint

    entries = []
    stages = {}
    for name in os.listdir(checkpoint_dir):
        path = os.path.join(checkpoint_dir, name)
        if not os.path.isdir(path):
            continue
        save = load_checkpoint(path)
        stages[path] = int(save["step"])
        entries.append((int(save["iter"]), name == "FINAL", path))
    entries.sort()
    if stage is None:
        stage = stages[entries[-1][2]]  # the FINAL checkpoint's stage
    entries = [e for e in entries if stages[e[2]] == stage]

    out: List[dict] = []
    dataset = None
    real = None
    for iters, is_final, path in entries:
        sampler = Sampler(
            path, batch=min(64, n_images), seed=seed, use_ema=use_ema
        )
        if dataset is None:
            dataset = open_stage_dataset(heldout_data, sampler.steps)
            n = min(n_images, len(dataset))
            real = dataset.get_batch_uint8(np.arange(n))
        fake = sampler.sample_float(real.shape[0])
        swd = sliced_wasserstein_distance(
            real, fake, jax.random.PRNGKey(seed),
            patches_per_image=128,
            min_size=min(16, sampler.resolution),
        )[0]
        out.append({
            "iter": iters,
            "final": is_final,
            "heldout_swd": round(float(swd), 3),
            "msssim_fake": round(float(msssim_diversity(fake)), 4),
        })
    return out


def run_arm(
    out_root: str,
    name: str,
    data: str,
    n_stages: int,
    config_kwargs: dict,
) -> dict:
    """Train one arm through the production ``train()`` (skipping it when a
    FINAL checkpoint already exists) and return its paths + summary."""
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import train

    sub = os.path.join(out_root, name)
    ckpt_dir = os.path.join(sub, "checkpoints")
    output_dir = os.path.join(sub, "output")
    config = TrainConfig(
        data=data,
        checkpoint_dir=ckpt_dir,
        output_dir=output_dir,
        **config_kwargs,
    )
    if not os.path.isdir(os.path.join(ckpt_dir, "FINAL")):
        shutil.rmtree(sub, ignore_errors=True)
        train(config)
    return {"name": name, "checkpoints": ckpt_dir, "output": output_dir}


def write_trajectory_plot(
    out_path: str,
    arms: Dict[str, List[dict]],
    key: str,
    title: str,
    ylabel: str,
    baselines: Optional[Dict[str, float]] = None,
) -> None:
    """One PNG: per-arm trajectories of ``key`` over checkpoint iterations."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name, traj in arms.items():
        ax.plot(
            [t["iter"] for t in traj],
            [t[key] for t in traj],
            marker="o", ms=4, label=name,
        )
    for label, value in (baselines or {}).items():
        ax.axhline(value, ls="--", lw=1.0, color="gray")
        ax.annotate(label, (0.01, value), xycoords=("axes fraction", "data"),
                    fontsize=8, color="gray", va="bottom")
    ax.set_xlabel("iteration")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(alpha=0.25)
    ax.legend(fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def dump_summary(out_root: str, summary: dict, head_keys: List[str]) -> None:
    with open(os.path.join(out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in head_keys if k in summary}))
