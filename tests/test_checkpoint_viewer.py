import numpy as np
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.slam_map.checkpoint import save_map, load_map
from amos_slam_tpu.slam_map.slam_map import SlamMap
from amos_slam_tpu import viewer
from amos_slam_tpu.io import synthetic


@pytest.fixture(scope="module")
def run_slam():
    cfg = SystemConfig(
        map=MapConfig(max_keyframes=16, max_points=4096),
        tracking=TrackingConfig(max_map_points_local=1024),
        use_dynamics=False,
    )
    planes = synthetic.default_room(seed=13)
    poses = synthetic.orbit_trajectory(8, radius=0.08, advance=0.15)
    slam = System(cfg)
    for i, T in enumerate(poses):
        g, d = synthetic.render(planes, T)
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    return slam, cfg


def test_map_checkpoint_roundtrip(run_slam, tmp_path):
    slam, cfg = run_slam
    p = str(tmp_path / "map.npz")
    save_map(p, slam.map)

    m2 = SlamMap(cfg, slam.cam)
    load_map(p, m2)
    assert m2.n_kfs == slam.map.n_kfs
    assert m2.n_pts == slam.map.n_pts
    np.testing.assert_array_equal(
        np.asarray(m2.arrays.kf_pose), np.asarray(slam.map.arrays.kf_pose)
    )
    np.testing.assert_array_equal(m2.kf_obs_np, slam.map.kf_obs_np)
    # a local view built from the restored map works
    v = m2.local_view(0)
    assert int(v.valid.sum()) > 100


def test_viewer_artifacts(run_slam, tmp_path):
    slam, _ = run_slam
    prefix = str(tmp_path / "out")
    viewer.dump_map(slam, prefix)
    ply = open(prefix + "_map.ply").read()
    assert ply.startswith("ply")
    assert "element vertex" in ply
    kf = open(prefix + "_keyframes.txt").read().strip().splitlines()
    assert len(kf) == slam.map.n_kfs

    ok = viewer.plot_topdown(slam, path=str(tmp_path / "td.png"))
    if ok:
        import os

        assert os.path.getsize(tmp_path / "td.png") > 1000

    g, d = synthetic.render(synthetic.default_room(seed=13), np.eye(4))
    overlay = viewer.draw_frame(g, slam.last_feats)
    assert overlay.shape == (480, 640, 3)
    assert overlay.dtype == np.uint8
