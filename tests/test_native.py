"""Native C++ image preprocessing vs pure-Python reference."""

import numpy as np
import pytest

from diffusion_pullback_tpu.utils import native
from diffusion_pullback_tpu.utils.images import to_uint8


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_version(lib):
    assert lib.dpx_version() == 1


def test_crop_resize_normalize_range_and_shape(lib):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(77, 131, 3), dtype=np.uint8)
    out = native.crop_resize_normalize(img, 32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    # identity-size crop of a square image ≈ plain normalize
    sq = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = native.crop_resize_normalize(sq, 16)
    expect = sq.astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_crop_is_centered(lib):
    # black image with a white center square survives the crop
    img = np.zeros((64, 128, 3), np.uint8)
    img[:, 32:96] = 255
    out = native.crop_resize_normalize(img, 8)
    np.testing.assert_allclose(out, np.ones_like(out), atol=1e-5)


def test_upsample_matches_pil_bilinear(lib):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = native.crop_resize_normalize(img, 32)
    ref = PIL.fromarray(img).resize((32, 32), PIL.BILINEAR)
    ref = np.asarray(ref, np.float32) / 255.0 * 2 - 1
    # classic bilinear upsample on both sides — tight agreement
    assert np.abs(out - ref).mean() < 0.02


def test_downsample_close_to_pil(lib):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    out = native.crop_resize_normalize(img, 32)
    ref = PIL.fromarray(img).resize((32, 32), PIL.BILINEAR)
    ref = np.asarray(ref, np.float32) / 255.0 * 2 - 1
    # PIL's bilinear downsample uses an area-average support window; ours is
    # point-sampled bilinear — statistically close, not identical
    assert np.abs(out - ref).mean() < 0.2


def test_batch_to_grid_matches_python(lib):
    rng = np.random.default_rng(2)
    batch = rng.uniform(-1.2, 1.2, size=(5, 8, 8, 3)).astype(np.float32)
    grid = native.batch_to_grid(batch, nrow=2)
    assert grid.shape == (3 * 8, 2 * 8, 3)
    arr = to_uint8(batch)
    # spot-check tiles incl. clamping behaviour
    np.testing.assert_allclose(grid[:8, :8], arr[0], atol=1)
    np.testing.assert_allclose(grid[:8, 8:16], arr[1], atol=1)
    np.testing.assert_allclose(grid[16:24, :8], arr[4], atol=1)
    # unfilled cell is zero
    assert grid[16:24, 8:16].max() == 0
