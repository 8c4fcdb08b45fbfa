"""SWD evaluation metric (eval/swd.py) + byogan-eval CLI.

Covers: Laplacian pyramid exactness, patch extraction bounds, the metric's
core properties (zero on identical sets, discrimination between matched and
mismatched distributions, symmetry of scale), and a CLI smoke run against a
tiny trained checkpoint.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.core.resize import upsample2x_bilinear
from byogan_tpu.eval.swd import (
    PATCH,
    extract_patches,
    laplacian_pyramid,
    sliced_wasserstein,
    sliced_wasserstein_distance,
)


def test_pyramid_reconstructs_exactly():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 64, 3), jnp.float32)
    levels = laplacian_pyramid(x, min_size=16)
    assert [lv.shape[1] for lv in levels] == [64, 32, 16]
    recon = levels[-1]
    for lv in levels[-2::-1]:
        recon = upsample2x_bilinear(recon) + lv
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-5)


def test_extract_patches_shapes_and_content():
    # An image whose value encodes its pixel coordinate: every extracted
    # patch must be a contiguous 7x7 window (rows differ by W, cols by 1).
    n, h, w = 3, 32, 32
    coords = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    imgs = jnp.tile(coords, (n, 1, 1, 3))
    patches = extract_patches(imgs, jax.random.PRNGKey(1), patches_per_image=10)
    assert patches.shape == (n * 10, PATCH, PATCH, 3)
    p = np.asarray(patches)
    np.testing.assert_array_equal(p[:, :, 1:, :] - p[:, :, :-1, :], 1.0)
    np.testing.assert_array_equal(p[:, 1:, :, :] - p[:, :-1, :, :], float(w))


def test_swd_zero_on_identical_sets():
    d = jax.random.normal(jax.random.PRNGKey(2), (256, PATCH, PATCH, 3))
    val = sliced_wasserstein(d, d, jax.random.PRNGKey(3))
    assert float(val) < 1e-5


def test_swd_discriminates_distributions():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    same_a = jax.random.normal(k1, (512, PATCH * PATCH * 3))
    same_b = jax.random.normal(k2, (512, PATCH * PATCH * 3))
    shifted = same_b + 2.0
    near = float(sliced_wasserstein(same_a, same_b, k3))
    far = float(sliced_wasserstein(same_a, shifted, k3))
    assert far > 5 * near


def test_full_metric_on_images():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    real = jax.random.uniform(k1, (16, 32, 32, 3), minval=-1.0, maxval=1.0)
    alike = jax.random.uniform(k2, (16, 32, 32, 3), minval=-1.0, maxval=1.0)
    # Per-set descriptor normalization cancels affine differences (that is
    # the metric's design), so "unalike" must differ STRUCTURALLY: flat
    # per-image constants have none of real's intra-patch variation.
    unalike = jnp.broadcast_to(
        alike.mean(axis=(1, 2), keepdims=True), alike.shape
    )
    res_alike = sliced_wasserstein_distance(
        real, alike, k3, patches_per_image=32
    )
    res_unalike = sliced_wasserstein_distance(
        real, unalike, k3, patches_per_image=32
    )
    assert set(res_alike) == {32, 16, 0}
    assert res_unalike[0] > res_alike[0]
    # uint8 inputs take the [-1,1] conversion path and stay finite
    u8 = (np.random.default_rng(0).integers(0, 256, (8, 16, 16, 3))
          .astype(np.uint8))
    res_u8 = sliced_wasserstein_distance(
        jnp.asarray(u8), jnp.asarray(u8), k3, patches_per_image=16
    )
    # Identical image sets, but each side draws its OWN patch sites, so the
    # result is the metric's sampling-noise floor, not zero (exact zero on
    # identical descriptors is covered above).  It must sit far below the
    # structural-difference scale.
    assert 0 <= res_u8[0] < res_unalike[0]


def test_swd_rejects_mismatched_counts():
    a = jnp.zeros((8, PATCH, PATCH, 3))
    b = jnp.zeros((9, PATCH, PATCH, 3))
    with pytest.raises(ValueError, match="equal descriptor counts"):
        sliced_wasserstein(a, b, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """A 1-stage trained checkpoint + its dataset, through the real loop."""
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import train

    root = str(tmp_path_factory.mktemp("eval_data"))
    write_synthetic_dataset(root, n_images=12, size=4)
    prepare_pyramid(root, start_size=4, end_size=4)
    ckpt_dir = str(tmp_path_factory.mktemp("eval_ckpt"))
    config = TrainConfig(
        data=root,
        noise_size=16,
        compute_dtype="float32",
        channel_divisor=16,
        mapping_depth=2,
        batch_progression=(4,),
        epoch_progression=(1,),
        display_step=100,
        checkpoint_step=100,
        refresh_stat_step=2,
        checkpoint_dir=ckpt_dir,
        output_dir=str(tmp_path_factory.mktemp("eval_out")),
        show_noise_count=4,
        seed=3,
    )
    train(config)
    return os.path.join(ckpt_dir, "FINAL"), root


def test_periodic_swd_during_training(tmp_path):
    """eval_step > 0 logs {"kind": "eval"} SWD records to metrics.jsonl,
    including the EMA score when the shadow is enabled."""
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import train

    root = str(tmp_path / "data")
    write_synthetic_dataset(root, n_images=8, size=4)
    prepare_pyramid(root, start_size=4, end_size=4)
    out = tmp_path / "out"
    config = TrainConfig(
        data=root,
        noise_size=16,
        compute_dtype="float32",
        channel_divisor=16,
        mapping_depth=2,
        batch_progression=(4,),
        epoch_progression=(2,),
        display_step=100,
        checkpoint_step=100,
        refresh_stat_step=2,
        eval_step=2,
        eval_images=8,
        ema_beta=0.5,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(out),
        show_noise_count=4,
        seed=9,
    )
    train(config)
    records = [
        json.loads(line) for line in open(out / "metrics.jsonl")
    ]
    evals = [r for r in records if r.get("kind") == "eval"]
    losses = [r for r in records if "c_loss" in r]
    assert evals and losses
    for r in evals:
        assert np.isfinite(r["swd"]) and r["swd"] >= 0
        assert np.isfinite(r["swd_ema"]) and r["swd_ema"] >= 0
        assert "c_loss" not in r  # eval records don't pollute the loss schema
        # mode-collapse readout rides every eval record (live, EMA, anchor)
        for k in ("msssim", "msssim_ema", "msssim_real"):
            assert 0.0 <= r[k] <= 1.0


def test_evaluate_cli(tiny_run, capsys):
    from byogan_tpu.cli.evaluate import main

    ckpt, root = tiny_run
    main([ckpt, root, "-n", "8", "--patches", "8", "--seed", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "swd_x1e3"
    assert out["resolution"] == 4
    # 4px stage: the pyramid degenerates to a single 4px level
    assert list(out["per_level"]) == ["4"]
    assert np.isfinite(out["mean"])


def test_evaluate_cli_msssim(tiny_run, capsys):
    """--metric both keeps the SWD schema and adds the mode-collapse
    readout (generated-set pairwise MS-SSIM beside the real set's)."""
    from byogan_tpu.cli.evaluate import main

    ckpt, root = tiny_run
    main([ckpt, root, "-n", "8", "--patches", "8", "--metric", "both"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "swd_x1e3" and np.isfinite(out["mean"])
    div = out["msssim_diversity"]
    assert 0.0 <= div["fake"] <= 1.0 and 0.0 <= div["real"] <= 1.0


def test_msssim_detects_latent_collapse(tiny_run, capsys):
    """Squeezing the latent truncation toward 0 makes every sample come
    from (nearly) the same z — a synthetic mode collapse the diversity
    readout must flag with a clearly higher score than the healthy model's."""
    from byogan_tpu.cli.evaluate import main

    ckpt, root = tiny_run
    base = [ckpt, root, "-n", "8", "--patches", "8", "--metric", "msssim"]
    main(base + ["-t", "1e-3"])
    collapsed = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["msssim_diversity"]["fake"]
    main(base)
    healthy = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["msssim_diversity"]["fake"]
    assert collapsed > healthy + 0.1
    assert collapsed > 0.9


def test_plot_cli(tmp_path):
    """byogan-plot renders metrics.jsonl (dir or file path) to a PNG,
    including the eval subplot when eval records exist."""
    from byogan_tpu.cli.plot import main as plot_main

    m = tmp_path / "metrics.jsonl"
    recs = [
        {
            "iter": i, "stage": 1 + (i > 4), "epoch": 0,
            "c_loss": 2.0 / i, "g_loss": 1.0, "images_per_sec": 10.0,
        }
        for i in range(2, 10, 2)
    ]
    recs.append(
        {"kind": "eval", "iter": 8, "stage": 2, "swd": 300.0,
         "swd_ema": 280.0}
    )
    m.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    target = tmp_path / "curves.png"
    plot_main([str(m), "-o", str(target)])
    assert target.exists() and target.stat().st_size > 10_000
    # directory form resolves to its metrics.jsonl
    plot_main([str(tmp_path), "-o", str(tmp_path / "c2.png")])
    assert (tmp_path / "c2.png").exists()
    # eval records carrying the MS-SSIM readout grow a diversity twin axis
    recs[-1].update({"msssim": 0.4, "msssim_ema": 0.38, "msssim_real": 0.3})
    m.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    plot_main([str(m), "-o", str(tmp_path / "c3.png")])
    assert (tmp_path / "c3.png").stat().st_size > 10_000
