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
    assert lib.dpx_version() >= 2


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


def test_native_decode_matches_pil(tmp_path):
    """Full-native decode (libjpeg/libpng + crop/resize/normalize) matches
    the PIL-decode + native-pixel-math path."""
    from PIL import Image

    from diffusion_pullback_tpu.utils import native
    from diffusion_pullback_tpu.utils.images import load_image

    if not native.has_codecs():
        import pytest

        pytest.skip("native lib built without jpeg/png codecs")

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, size=(91, 67, 3))).astype(np.uint8)
    png_p = str(tmp_path / "a.png")
    jpg_p = str(tmp_path / "b.jpg")
    Image.fromarray(img).save(png_p)
    Image.fromarray(img).save(jpg_p, quality=95)

    for p in (png_p, jpg_p):
        nat = native.decode_crop_resize(p, 32)
        assert nat is not None and nat.shape == (32, 32, 3)
        # PIL-decode reference (skip the native fast path load_image takes)
        ref_img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        ref = native.crop_resize_normalize(ref_img, 32)
        np.testing.assert_allclose(nat, ref, atol=2 / 255.0, err_msg=p)

    # threaded batch API + mixed-failure patch-up mask
    out = native.decode_batch([png_p, jpg_p] * 8, 32)
    assert out is not None
    batch, ok = out
    assert batch.shape == (16, 32, 32, 3) and ok.all()
    bad = str(tmp_path / "nope.jpg")
    open(bad, "wb").write(b"\xff\xd8garbage")
    batch, ok = native.decode_batch([png_p, bad], 32)
    assert ok.tolist() == [True, False]


def test_img_dataset_load_batch(tmp_path):
    from PIL import Image

    from diffusion_pullback_tpu.utils.datasets import ImgDataset

    rng = np.random.default_rng(1)
    for i in range(4):
        arr = rng.uniform(0, 255, size=(40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")
    ds = ImgDataset(str(tmp_path), 16)
    batch = ds.load_batch()
    assert batch.shape == (4, 16, 16, 3)
    for i in range(4):
        np.testing.assert_allclose(batch[i], ds[i][0], atol=2 / 255.0)


def test_native_basis_store_roundtrip(tmp_path):
    """.dpb store: atomic native write, zero-copy memmap load, BasisCache
    preference + npz fallback interop."""
    from diffusion_pullback_tpu.experiments import BasisCache, load_basis
    from diffusion_pullback_tpu.utils import native

    rng = np.random.default_rng(0)
    u = rng.normal(size=(24, 6)).astype(np.float32)
    s = rng.uniform(1, 3, size=(6,)).astype(np.float32)
    vT = rng.normal(size=(6, 48)).astype(np.float32)

    c = BasisCache(str(tmp_path))
    p = c.save("b", u, s, vT)
    got = c.load("b")
    assert got is not None
    for a, b in zip(got, (u, s, vT)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # load_basis reads the same file by path
    u2, s2, vT2 = load_basis(p)
    np.testing.assert_array_equal(np.asarray(vT2), vT)

    lib = native.get_lib()
    if lib is not None and hasattr(lib, "dpx_basis_write"):
        assert p.endswith(".dpb")
        # header survives a direct native read
        trio = native.basis_read(p)
        assert trio is not None and trio[0].shape == (24, 6)
        # corrupt magic → graceful failure
        bad = str(tmp_path / "bad.dpb")
        open(bad, "wb").write(b"\x00" * 64)
        assert native.basis_read(bad) is None

    # legacy npz files remain loadable through the same cache
    import os

    npz_only = BasisCache(str(tmp_path / "legacy"))
    npz_only._native = False
    p2 = npz_only.save("b", u, s, vT)
    assert p2.endswith(".npz")
    got2 = npz_only.load("b")
    np.testing.assert_array_equal(np.asarray(got2[2]), vT)


def test_benchmark_dataset(tmp_path):
    """Reference BenchmarkDataset semantics: train/test folder layout,
    integer ordering, stretch resize (no crop)."""
    from PIL import Image

    from diffusion_pullback_tpu.utils.datasets import BenchmarkDataset

    d = tmp_path / "raw_images" / "train" / "images"
    d.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in (2, 0, 10):
        arr = rng.uniform(0, 255, size=(30, 50, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    ds = BenchmarkDataset(str(tmp_path), img_size=16)
    assert len(ds) == 3
    assert ds.files == ["0.png", "2.png", "10.png"]  # integer ordering
    x = ds[0]
    assert x.shape == (1, 16, 16, 3)
    assert -1.0 <= x.min() and x.max() <= 1.0
