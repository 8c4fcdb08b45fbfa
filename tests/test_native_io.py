"""Native IO library: decode parity vs PIL, fused normalize, pipeline wiring."""

import os

import numpy as np
import pytest

from byogan_tpu.data import native

pytestmark = pytest.mark.skipif(
    native.load_library() is None, reason="native IO library unavailable"
)


@pytest.fixture(scope="module")
def png_files(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    out = []
    for i in range(5):
        a = rng.integers(0, 256, (12, 12, 3), np.uint8)
        p = str(tmp / f"img{i}.png")
        Image.fromarray(a).save(p)
        out.append((p, a))
    return out


def test_png_decode_bit_exact(png_files):
    for path, want in png_files:
        got = native.decode_image(path)
        np.testing.assert_array_equal(got, want)


def test_batch_decode(png_files):
    paths = [p for p, _ in png_files]
    batch = native.decode_batch(paths, 12, 12, threads=2)
    for j, (_, want) in enumerate(png_files):
        np.testing.assert_array_equal(batch[j], want)


def test_jpeg_decode_matches_pil(tmp_path):
    from PIL import Image

    yy, xx = np.mgrid[0:32, 0:32]
    smooth = np.stack(
        [(np.sin(xx / 9) * 120 + 128), yy * 4 % 256, (xx + yy) % 256], -1
    ).astype(np.uint8)
    p = str(tmp_path / "s.jpg")
    Image.fromarray(smooth).save(p, quality=92)
    got = native.decode_image(p)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_normalize_matches_numpy(png_files):
    batch = np.stack([a for _, a in png_files])
    flips = np.array([0, 1, 1, 0, 1], bool)
    got = native.normalize_batch(batch, flips)
    want = batch.astype(np.float32) * (2.0 / 255.0) - 1.0
    want[flips] = want[flips, :, ::-1]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_grayscale_and_palette_pngs(tmp_path):
    """prep may encounter odd PNG variants; all normalize to RGB."""
    from PIL import Image

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    pg = str(tmp_path / "gray.png")
    Image.fromarray(g, mode="L").save(pg)
    got = native.decode_image(pg)
    assert got.shape == (8, 8, 3)
    np.testing.assert_array_equal(got[..., 0], g)
    np.testing.assert_array_equal(got[..., 1], g)

    rgba = np.dstack([g, g, g, np.full_like(g, 255)])
    pa = str(tmp_path / "rgba.png")
    Image.fromarray(rgba, mode="RGBA").save(pa)
    got = native.decode_image(pa)
    assert got.shape == (8, 8, 3)


def test_decode_error_raises(tmp_path):
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png at all")
    with pytest.raises(OSError):
        native.decode_image(bad)


def test_jpeg_encode_write_error_raises():
    """A failing write during JPEG encode must raise OSError, not kill the
    process: libjpeg's default error_exit calls exit(); byogan_encode_jpeg
    overrides it with the same setjmp handler the decode path uses
    (byogan_io.cpp).  /dev/full accepts the fopen but fails every flush."""
    if not os.path.exists("/dev/full"):
        pytest.skip("no /dev/full on this platform")
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), np.uint8)
    with pytest.raises(OSError):
        native.encode_jpeg("/dev/full", img)
    # The library must remain usable after the recovered error.
    ok = np.zeros((8, 8, 3), np.uint8)
    assert native.encode_jpeg(os.devnull, ok) is True


def test_transparent_palette_png_decodes_to_rgb(tmp_path):
    """Palette/gray PNGs with a tRNS chunk must come out 3-channel (the tRNS
    -> alpha conversion adds a 4th channel that MUST be stripped; unstripped
    it overflows the RGB output buffer)."""
    from PIL import Image

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    rgb = np.dstack([g, g[::-1], g])
    pal = Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE)
    pal.info["transparency"] = 0
    p = str(tmp_path / "pal_trns.png")
    pal.save(p, transparency=0)
    got = native.decode_image(p)
    assert got is not None and got.shape == (8, 8, 3)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)
