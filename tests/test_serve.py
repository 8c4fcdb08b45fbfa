"""Serving API: precompiled batched sampling, streaming PNG writer, mesh."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.serve import Sampler
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
        str(tmp_path_factory.mktemp("serve")), state, alpha=None, model_spec=spec
    )


def test_sampler_shapes_and_tiling(ckpt):
    s = Sampler(ckpt, batch=4, z_dim=32, dtype="float32", seed=0)
    assert s.resolution == 16
    out = s.sample(6)  # ragged: 2 compiled batches, tail trimmed
    assert out.shape == (6, 16, 16, 3)
    assert out.dtype == np.uint8


def test_sampler_params_committed_to_device(ckpt):
    """Checkpoint restores are numpy (device-agnostic, checkpoint.py); the
    Sampler must device_put them ONCE at construction.  Numpy leaves passed
    as jit arguments re-upload the whole parameter set every call — measured
    24 vs 203 img/s at 512px on the tunneled TPU host (RESULTS.md round 3)."""
    import jax

    s = Sampler(ckpt, batch=4, z_dim=32, dtype="float32", seed=0)
    for leaf in jax.tree.leaves(s._params):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_sampler_stream_writer(ckpt, tmp_path):
    s = Sampler(ckpt, batch=4, z_dim=32, dtype="float32", seed=1)
    n = s.save_stream(str(tmp_path / "out"), 5)
    assert n == 5
    files = sorted(glob.glob(str(tmp_path / "out" / "image_*.png")))
    assert len(files) == 5


def test_sampler_stream_formats(ckpt, tmp_path):
    """Opt-in jpeg/raw encode lanes (VERDICT r2 #7) write decodable frames
    that match the PNG lane's pixels (raw exactly; jpeg approximately)."""
    mk = lambda: Sampler(ckpt, batch=4, z_dim=32, dtype="float32", seed=3)
    s = mk()
    assert mk().save_stream(str(tmp_path / "jpg"), 5, format="jpeg") == 5
    assert mk().save_stream(str(tmp_path / "raw"), 5, format="raw") == 5
    jpgs = sorted(glob.glob(str(tmp_path / "jpg" / "image_*.jpg")))
    raws = sorted(glob.glob(str(tmp_path / "raw" / "image_*.npy")))
    assert len(jpgs) == 5 and len(raws) == 5

    # same seed -> same frames: raw must equal the sampler's uint8 output
    ref = Sampler(ckpt, batch=4, z_dim=32, dtype="float32", seed=3).sample(5)
    got = np.stack([np.load(p) for p in sorted(
        raws, key=lambda p: int(os.path.basename(p)[6:-4]))])
    np.testing.assert_array_equal(got, ref)

    from PIL import Image

    first = np.asarray(Image.open(jpgs[0]))
    assert first.shape == ref[0].shape
    # fresh-init 16px frames are saturated noise — JPEG's worst case; this
    # bounds gross corruption (wrong frame/channel order), not codec fidelity
    assert np.abs(first.astype(np.int32) - ref[0].astype(np.int32)).mean() < 64

    with pytest.raises(ValueError):
        s.save_stream(str(tmp_path / "bad"), 1, format="bmp")


def test_sampler_deterministic_given_seed(ckpt):
    a = Sampler(ckpt, batch=4, z_dim=32, dtype="float32", seed=7).sample(4)
    b = Sampler(ckpt, batch=4, z_dim=32, dtype="float32", seed=7).sample(4)
    np.testing.assert_array_equal(a, b)


def test_sampler_on_mesh(ckpt):
    from jax.sharding import PartitionSpec as P

    from byogan_tpu.parallel.mesh import make_mesh

    import jax

    mesh = make_mesh(data=4, model=1)
    s = Sampler(ckpt, batch=8, z_dim=32, dtype="float32", mesh=mesh, seed=2)
    # the compiled synthesis really shards the batch over the data axis
    # (z AND the per-stage noise maps are pinned, not left to propagation);
    # probe with a throwaway key so the sampler's own stream is untouched
    dev_out = s._synth(s._params, jax.random.PRNGKey(0))
    spec = dev_out.sharding.spec
    assert len(spec) >= 1 and spec[0] == "data", spec
    out = s.sample(8)
    assert out.shape == (8, 16, 16, 3)
    # mesh output matches the single-device sampler bit-for-bit
    single = Sampler(ckpt, batch=8, z_dim=32, dtype="float32", seed=2)
    np.testing.assert_array_equal(out, single.sample(8))


def test_sample_float_raw_range(ckpt):
    """sample_float returns raw-range float frames — no save quantization
    (the uint8 path saturates the negative half by design)."""
    s = Sampler(ckpt, batch=4, dtype="float32", seed=2)
    frames = s.sample_float(6)
    assert frames.shape == (6, s.resolution, s.resolution, 3)
    assert frames.dtype == np.float32
    assert np.isfinite(frames).all()
    # a fresh-init generator's raw output has mass below 0 that the uint8
    # path would have clipped away
    assert frames.min() < 0.0


def test_truncation_psi_mean_w_is_lazy(ckpt):
    """Sampler(truncation_psi=) must NOT run the 4096-latent mean-w forward
    at construction (a surprise multi-second compile on the tunneled TPU
    backend, VERDICT r2 weak #5) — it bills to the first request."""
    s = Sampler(ckpt, batch=2, z_dim=32, dtype="float32", seed=0,
                truncation_psi=0.6)
    assert s._w_mean is None  # constructor stayed cheap
    frames = s.sample(2)
    assert frames.shape == (2, 16, 16, 3)
    assert s._w_mean is not None  # computed at first synthesis trace
    # psi=1.0 is algebraically a no-op: same seed must match the plain path.
    a = Sampler(ckpt, batch=2, z_dim=32, dtype="float32", seed=7,
                truncation_psi=1.0).sample(2)
    b = Sampler(ckpt, batch=2, z_dim=32, dtype="float32", seed=7).sample(2)
    np.testing.assert_array_equal(a, b)
