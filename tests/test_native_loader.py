"""Native C++ loader: PNG decode correctness vs PIL, prefetcher behavior."""

import os

import numpy as np
import pytest

from amos_slam_tpu.io import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory, ):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("pngs")
    rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(d / "rgb.png")
    gray = rng.integers(0, 255, (48, 64), dtype=np.uint8)
    Image.fromarray(gray).save(d / "gray.png")
    depth = rng.integers(0, 30000, (48, 64), dtype=np.uint16)
    Image.fromarray(depth).save(d / "depth.png")
    return d, rgb, gray, depth


def test_decode_rgb_png(png_dir):
    d, rgb, _, _ = png_dir
    g, dep, rgb_out = native_loader.decode_png(str(d / "rgb.png"))
    assert dep is None
    np.testing.assert_array_equal(rgb_out, rgb)
    want = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.float32)
    np.testing.assert_allclose(g, want, atol=1e-3)


def test_decode_gray_and_depth(png_dir):
    d, _, gray, depth = png_dir
    g, _, _ = native_loader.decode_png(str(d / "gray.png"))
    np.testing.assert_array_equal(g, gray.astype(np.float32))
    _, dep, _ = native_loader.decode_png(
        str(d / "depth.png"), depth_factor=5000.0, is_depth=True
    )
    np.testing.assert_allclose(dep, depth.astype(np.float32) / 5000.0, atol=1e-6)


def test_prefetch_loader(png_dir):
    d, rgb, _, depth = png_dir
    items = [
        (float(i), str(d / "rgb.png"), str(d / "depth.png")) for i in range(12)
    ]
    loader = native_loader.NativePrefetchLoader(items, n_workers=3, ahead=4)
    try:
        # out-of-order access works; data correct
        for i in (0, 5, 3, 11, 7):
            g, dep, rgb_out, t = loader[i]
            assert t == float(i)
            assert g.shape == (48, 64)
            np.testing.assert_allclose(
                dep, depth.astype(np.float32) / 5000.0, atol=1e-6
            )
            np.testing.assert_array_equal(rgb_out, rgb)
    finally:
        loader.close()


def test_decode_failure_raises(tmp_path):
    p = tmp_path / "junk.png"
    p.write_bytes(b"not a png at all")
    with pytest.raises(RuntimeError):
        native_loader.decode_png(str(p))


def test_tum_dataset_uses_native(png_dir, tmp_path):
    """TumRGBDDataset transparently uses the native prefetcher."""
    import shutil
    from amos_slam_tpu.io.tum import TumRGBDDataset

    d, rgb, _, depth = png_dir
    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    lines = []
    for i in range(4):
        shutil.copy(d / "rgb.png", root / "rgb" / f"{i}.png")
        shutil.copy(d / "depth.png", root / "depth" / f"{i}.png")
        lines.append(f"{i}.0 rgb/{i}.png {i}.0 depth/{i}.png")
    (root / "associations.txt").write_text("\n".join(lines) + "\n")

    ds = TumRGBDDataset(str(root))
    assert ds._native is not None
    g, dep, rgb_out, t = ds[2]
    assert t == 2.0
    np.testing.assert_array_equal(rgb_out, rgb)
    np.testing.assert_allclose(dep, depth.astype(np.float32) / 5000.0, atol=1e-6)
