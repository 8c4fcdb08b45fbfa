"""Image-grid/PNG parity vs torchvision (the reference's display path)."""

import numpy as np
import pytest

from byogan_tpu.core.grids import make_grid, to_uint8


def test_make_grid_matches_torchvision():
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")

    rng = np.random.default_rng(0)
    imgs = rng.random((7, 6, 5, 3)).astype(np.float32)  # ragged count (7)
    for nrow in (2, 3, 5, 8):
        want = (
            torchvision.utils.make_grid(
                torch.from_numpy(imgs.transpose(0, 3, 1, 2)), nrow=nrow
            )
            .numpy()
            .transpose(1, 2, 0)
        )
        got = make_grid(imgs, nrow=nrow)
        assert got.shape == want.shape, (nrow, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_to_uint8_matches_save_image_rounding():
    torch = pytest.importorskip("torch")

    x = np.linspace(-0.5, 1.5, 97, dtype=np.float32).reshape(1, 97, 1)
    # torchvision save_image rounding: mul(255).add_(0.5).clamp_(0,255).to(uint8)
    want = (
        torch.from_numpy(x).mul(255).add_(0.5).clamp_(0, 255).to(torch.uint8).numpy()
    )
    np.testing.assert_array_equal(to_uint8(x), want)
