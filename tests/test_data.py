"""Data layer: synthetic corpus -> prep pyramid -> stage loader."""

import os

import numpy as np
import pytest

from byogan_tpu.data.pipeline import (
    StageDataset,
    batches_per_epoch,
    make_stage_loader,
)
from byogan_tpu.data.prep import prepare_pyramid
from byogan_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    write_synthetic_dataset(root, n_images=10, size=16)
    prepare_pyramid(root, start_size=4, end_size=16)
    return root


def test_prep_layout(prepared):
    """Reference on-disk layout (prep.py:53): prepared/set_{k}/images/*.png"""
    assert os.path.isdir(os.path.join(prepared, "original", "images"))
    for k, size in ((1, 4), (2, 8), (3, 16)):
        set_dir = os.path.join(prepared, "prepared", f"set_{k}", "images")
        files = sorted(os.listdir(set_dir))
        assert len(files) == 10
        assert files[0].startswith("image-") and files[0].endswith(".png")
        from PIL import Image

        with Image.open(os.path.join(set_dir, files[0])) as im:
            assert im.size == (size, size)


def test_prep_skips_existing(prepared):
    """Re-running prep without overwrite leaves sets untouched (prep.py:55-60
    analogue)."""
    mark = os.path.join(prepared, "prepared", "set_1", "images", "image-0.png")
    before = os.path.getmtime(mark)
    prepare_pyramid(prepared, 4, 16)
    assert os.path.getmtime(mark) == before


def test_stage_loader_batches(prepared):
    ds = StageDataset(prepared, 2)
    assert len(ds) == 10
    batches = list(make_stage_loader(ds, batch_size=4, seed=1, epochs=2))
    # drop_remainder: 10 // 4 = 2 batches per epoch, 2 epochs
    assert len(batches) == 4
    for b in batches:
        assert b.shape == (4, 8, 8, 3)
        assert b.dtype == np.float32
        assert b.min() >= -1.0 and b.max() <= 1.0
    assert batches_per_epoch(10, 4) == 2


def test_loader_deterministic_given_seed(prepared):
    ds = StageDataset(prepared, 1)
    a = list(make_stage_loader(ds, 4, seed=7, epochs=1))
    b = list(make_stage_loader(ds, 4, seed=7, epochs=1))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_loader_cache_consistency(prepared):
    ds_cached = StageDataset(prepared, 2)
    ds_cached.maybe_cache()
    ds_cold = StageDataset(prepared, 2, cache_limit_bytes=0)
    assert not ds_cold.maybe_cache()
    idx = np.array([3, 1, 4])
    np.testing.assert_array_equal(
        ds_cached.get_batch_uint8(idx), ds_cold.get_batch_uint8(idx)
    )


def test_per_host_sharded_loader(prepared):
    """Multi-host data sharding: the concatenation of every simulated host's
    local batches equals the single-process global stream exactly (same
    shuffle, same flips), so each host decodes only its 1/P row slice."""
    ds = StageDataset(prepared, 2)
    kw = dict(batch_size=4, seed=5, epochs=2)
    full = list(make_stage_loader(ds, **kw))
    parts = [
        list(
            make_stage_loader(
                ds, process_index=p, process_count=2, **kw
            )
        )
        for p in range(2)
    ]
    assert len(parts[0]) == len(full) and len(parts[1]) == len(full)
    for b_full, b0, b1 in zip(full, parts[0], parts[1]):
        assert b0.shape[0] == 2 and b1.shape[0] == 2  # local rows = 4/2
        np.testing.assert_array_equal(np.concatenate([b0, b1]), b_full)

    with pytest.raises(ValueError, match="not divisible"):
        next(iter(make_stage_loader(ds, 5, process_count=2)))


def test_missing_dataset_raises(tmp_path):
    with pytest.raises(OSError, match="Did not detect prepared dataset"):
        StageDataset(str(tmp_path), 1)


def test_derived_stage_dataset(prepared, tmp_path):
    """A stage whose set is missing derives from the next higher set with
    prep's own bilinear filter (single multi-res source mode) — derived
    pixels must equal what prep.py actually wrote for that stage (within
    1 LSB of PIL's fixed-point resampling)."""
    import shutil

    from byogan_tpu.data.pipeline import open_stage_dataset

    root = str(tmp_path / "derived")
    shutil.copytree(prepared, root)
    shutil.rmtree(os.path.join(root, "prepared", "set_1"))

    direct = StageDataset(prepared, 1)
    derived = open_stage_dataset(root, 1)
    assert derived.derive_shift == 1
    idx = np.arange(len(direct))
    d = derived.get_batch_uint8(idx).astype(np.int16)
    want = direct.get_batch_uint8(idx).astype(np.int16)
    assert d.shape == want.shape
    assert np.abs(d - want).max() <= 1


def test_downsample_matches_pil_bilinear():
    """_downsample_u8 == PIL Image.resize(BILINEAR) for an exact 2x factor
    (the filter prep.py uses for every pyramid level), within 1 LSB."""
    from PIL import Image

    from byogan_tpu.data.pipeline import _downsample_u8

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    pil = np.asarray(
        Image.fromarray(img).resize((16, 16), Image.BILINEAR), dtype=np.int16
    )
    ours = _downsample_u8(img, 1).astype(np.int16)
    assert np.abs(ours - pil).max() <= 1


def test_open_stage_dataset_prefers_direct(prepared):
    from byogan_tpu.data.pipeline import open_stage_dataset

    ds = open_stage_dataset(prepared, 2)
    assert ds.derive_shift == 0


def test_loader_propagates_decode_errors(prepared, tmp_path):
    """A corrupt image must raise in the consumer, not silently truncate the
    epoch."""
    import shutil

    from byogan_tpu.data.pipeline import make_stage_loader

    root = str(tmp_path / "corrupt")
    shutil.copytree(prepared, root)
    victim = os.path.join(root, "prepared", "set_1", "images", "image-3.png")
    with open(victim, "wb") as f:
        f.write(b"garbage, not a png")
    ds = StageDataset(root, 1, cache_limit_bytes=0)  # force per-batch decode
    with pytest.raises(Exception):
        list(make_stage_loader(ds, batch_size=5, seed=0, epochs=1, cache=False))


def test_packed_stage_matches_decoded(prepared, tmp_path):
    """packed.npy memmap serves byte-identical batches with zero decode."""
    import shutil

    from byogan_tpu.data.pipeline import pack_stage

    root = str(tmp_path / "packed")
    shutil.copytree(prepared, root)
    direct = StageDataset(root, 2)
    idx = np.array([5, 0, 7, 2])
    want = direct.get_batch_uint8(idx)

    pack_stage(root, 2)
    ds = StageDataset(root, 2)
    assert ds._packed is not None
    assert len(ds) == len(direct)
    np.testing.assert_array_equal(ds.get_batch_uint8(idx), want)
    # ignores decode entirely: nuke the PNGs, reads still work
    for f in direct.files:
        os.remove(f)
    ds2 = StageDataset(root, 2)
    np.testing.assert_array_equal(ds2.get_batch_uint8(idx), want)


def test_device_normalize_lane_matches_f32_lane(prepared):
    """The uint8 transport lane (device_normalize=True) carries the same
    data: same shuffle/flip RNG stream, and host-normalizing its uint8
    output reproduces the f32 lane bit-exactly."""
    ds = StageDataset(prepared, 2)
    kw = dict(batch_size=4, seed=11, epochs=1)
    f32 = list(make_stage_loader(ds, **kw))
    u8 = list(make_stage_loader(ds, device_normalize=True, **kw))
    assert len(f32) == len(u8)
    for a, b in zip(f32, u8):
        assert b.dtype == np.uint8 and a.dtype == np.float32
        want = b.astype(np.float32) * (2.0 / 255.0) - 1.0
        assert (a == want).all()
