"""StableHLO deployment artifacts (byogan_tpu/deploy.py, byogan-export
--stablehlo): self-contained serving modules with weights baked in."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.core.random import synthesis_noise
from byogan_tpu.deploy import ExportedSampler, export_stablehlo
from byogan_tpu.train.checkpoint import save_checkpoint
from byogan_tpu.train.state import create_train_state
from tests.conftest import small_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator

    spec = ModelSpec(num_stages=3, channel_divisor=16, mapping_depth=2)
    config = small_config()
    state = create_train_state(config, build_generator(spec), build_critic(spec))
    state = state.replace(iters=jnp.int32(1), stage=3)
    return save_checkpoint(
        str(tmp_path_factory.mktemp("deploy")), state, alpha=None, model_spec=spec
    ), spec


def test_export_roundtrip_matches_direct_apply(ckpt, tmp_path):
    """deserialize(serialize(synth)) must equal the direct flax apply
    bit-for-bit on the same platform — the artifact IS the program."""
    path, spec = ckpt
    out = str(tmp_path / "gen.hlo")
    meta = export_stablehlo(
        path, out, batch=4, dtype="float32", platforms=("cpu",)
    )
    assert meta["resolution"] == 16 and meta["steps"] == 3
    assert meta["alpha"] is None

    s = ExportedSampler(out)
    assert s.in_shape == (4, meta["z_dim"])
    z = np.random.default_rng(0).standard_normal((4, meta["z_dim"]))
    got = s(z, seed=7)
    assert got.shape == (4, 16, 16, 3) and got.dtype == np.uint8

    # Independent oracle: rebuild the generator and replay the contract.
    from byogan_tpu.models.factory import build_generator
    from byogan_tpu.train.checkpoint import load_checkpoint

    save = load_checkpoint(path)
    gen = build_generator(spec)
    noise = synthesis_noise(jax.random.PRNGKey(7), 4, 3, dtype=jnp.float32)
    img = gen.apply(
        {"params": save["gen_params"]},
        jnp.asarray(z, jnp.float32),
        noise,
        steps=3,
        alpha=None,
    )
    want = np.asarray(
        jnp.clip(img.astype(jnp.float32) * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    )
    np.testing.assert_array_equal(got, want)


def test_export_is_self_contained_and_multiplatform(ckpt, tmp_path):
    """The blob must serve WITHOUT byogan_tpu importable (fresh process,
    package path stripped) and carry both cpu and tpu lowerings."""
    path, _ = ckpt
    out = str(tmp_path / "gen.hlo")
    meta = export_stablehlo(path, out, batch=2, dtype="float32")
    assert meta["platforms"] == ["cpu", "tpu"]
    sidecar = json.load(open(out + ".json"))
    assert sidecar["batch"] == 2

    code = f"""
import sys
sys.path = [p for p in sys.path if "repo" not in p]
for mod in list(sys.modules):
    assert not mod.startswith("byogan_tpu")
import jax, json
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax import export as jexport
exp = jexport.deserialize(bytearray(open({out!r}, "rb").read()))
z = np.zeros((2, {meta["z_dim"]}), np.float32)
frames = jax.jit(exp.call)(z, np.int32(0))
assert frames.shape == (2, 16, 16, 3), frames.shape
assert str(frames.dtype) == "uint8"
print("SELFCONTAINED_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert "SELFCONTAINED_OK" in proc.stdout, proc.stderr[-2000:]


def test_export_psi_bakes_truncation(ckpt, tmp_path):
    """--psi embeds the mean w: psi=0 must collapse every latent to the
    same (mean-w) frame; psi=None must not."""
    path, _ = ckpt
    free = str(tmp_path / "free.hlo")
    collapsed = str(tmp_path / "collapsed.hlo")
    export_stablehlo(path, free, batch=3, dtype="float32", platforms=("cpu",))
    export_stablehlo(
        path, collapsed, batch=3, dtype="float32", truncation_psi=0.0,
        platforms=("cpu",),
    )
    z = np.random.default_rng(1).standard_normal((3, 32))
    out_free = ExportedSampler(free)(z, seed=3)
    out_psi = ExportedSampler(collapsed)(z, seed=3)
    # psi=0: identical w for all latents -> identical frames (same noise
    # map per sample index is NOT shared, so compare via w-collapse: all
    # three frames equal each other only if w collapsed; noise differs per
    # sample, so instead check against a permuted-z call).
    out_psi_other_z = ExportedSampler(collapsed)(z[::-1], seed=3)
    np.testing.assert_array_equal(out_psi, out_psi_other_z)  # z irrelevant
    assert (out_free != out_psi).any()


def test_export_cli_stablehlo(ckpt, tmp_path):
    path, _ = ckpt
    out = str(tmp_path / "cli.hlo")
    from byogan_tpu.cli.export import main

    main([path, out, "--stablehlo", "--batch", "2", "--dtype", "float32",
          "--platforms", "cpu"])
    s = ExportedSampler(out)
    frames = s(np.zeros((2, 32), np.float32), seed=0)
    assert frames.shape == (2, 16, 16, 3)
    assert s.meta["dtype"] == "float32"


def test_export_ema_requires_ema_weights(ckpt, tmp_path):
    path, _ = ckpt
    with pytest.raises(ValueError, match="no EMA weights"):
        export_stablehlo(
            path, str(tmp_path / "x.hlo"), batch=2, use_ema=True,
            platforms=("cpu",),
        )


def test_exported_sampler_validates_z_shape(ckpt, tmp_path):
    """A batch/z_dim mismatch must be a clear ValueError naming the traced
    shape, not an opaque jax.export calling-convention failure."""
    path, _ = ckpt
    out = str(tmp_path / "gen.hlo")
    export_stablehlo(path, out, batch=4, dtype="float32", platforms=("cpu",))
    s = ExportedSampler(out)
    with pytest.raises(ValueError, match=r"\(4, 32\)"):
        s(np.zeros((3, 32), np.float32))
    with pytest.raises(ValueError, match="traced"):
        s(np.zeros((4, 16), np.float32))


def test_exported_sampler_sample_z_matches_training_distribution(ckpt, tmp_path):
    """sample_z draws the traced batch from the TRAINING truncated-normal
    (meta train_truncation) — the z distribution callers should use."""
    path, _ = ckpt
    out = str(tmp_path / "gen.hlo")
    export_stablehlo(
        path, out, batch=8, dtype="float32", truncation=0.5,
        platforms=("cpu",),
    )
    s = ExportedSampler(out)
    assert s.meta["train_truncation"] == 0.5
    z = s.sample_z(seed=11)
    assert z.shape == s.in_shape and z.dtype == np.float32
    assert np.abs(z).max() <= 0.5 + 1e-6  # truncated at train_truncation
    # deterministic per seed, usable directly
    np.testing.assert_array_equal(z, s.sample_z(seed=11))
    frames = s(z, seed=1)
    assert frames.shape[0] == 8


def test_export_cli_truncation_and_platform_strip(ckpt, tmp_path):
    """--truncation reaches the sidecar; --platforms tolerates spaces."""
    path, _ = ckpt
    out = str(tmp_path / "cli_t.hlo")
    from byogan_tpu.cli.export import main

    main([path, out, "--stablehlo", "--batch", "2", "--dtype", "float32",
          "--platforms", " cpu ,", "-t", "0.6", "--psi", "0.7"])
    meta = json.load(open(out + ".json"))
    assert meta["train_truncation"] == 0.6
    assert meta["platforms"] == ["cpu"]
