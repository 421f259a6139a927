"""KITTI/EuRoC loader tests on fabricated directory trees."""

import os

import numpy as np
import pytest

from amos_slam_tpu.io.kitti import KittiStereoDataset, kitti_camera_config
from amos_slam_tpu.io.euroc import EurocMonoDataset, euroc_camera_config


@pytest.fixture()
def kitti_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    for i in range(3):
        for cam in ("image_0", "image_1"):
            img = rng.integers(0, 255, (376, 1241), dtype=np.uint8)
            Image.fromarray(img).save(seq / cam / f"{i:06d}.png")
    (seq / "times.txt").write_text("0.0\n0.1\n0.2\n")
    return seq


def test_kitti_loader(kitti_dir):
    ds = KittiStereoDataset(str(kitti_dir))
    assert len(ds) == 3
    l, r, t = ds[1]
    assert l.shape == (376, 1241)
    assert l.dtype == np.float32
    assert t == 0.1


def test_kitti_calibration():
    c0 = kitti_camera_config(0)
    assert abs(c0.fx - 718.856) < 1e-3
    assert c0.width == 1241
    c4 = kitti_camera_config(4)
    assert abs(c4.fx - 707.0912) < 1e-3


@pytest.fixture()
def euroc_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    data = tmp_path / "mav0" / "cam0" / "data"
    data.mkdir(parents=True)
    lines = ["#timestamp [ns],filename"]
    for i in range(3):
        ts = 1403636579763555584 + i * 50000000
        img = rng.integers(0, 255, (480, 752), dtype=np.uint8)
        Image.fromarray(img).save(data / f"{ts}.png")
        lines.append(f"{ts},{ts}.png")
    (tmp_path / "mav0" / "cam0" / "data.csv").write_text("\n".join(lines))
    return tmp_path


def test_euroc_loader(euroc_dir):
    ds = EurocMonoDataset(str(euroc_dir))
    assert len(ds) == 3
    g, t = ds[0]
    assert g.shape == (480, 752)
    assert abs(t - 1403636579.763555584) < 1e-3
    cfg = euroc_camera_config()
    assert abs(cfg.k1 + 0.28340811) < 1e-6
