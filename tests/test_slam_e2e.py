"""Full SLAM end-to-end: map + keyframes + local BA must beat raw odometry
drift on a synthetic sequence and keep a consistent map."""

import numpy as np
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System, TrackingState
from amos_slam_tpu.io import synthetic, evaluate


@pytest.fixture(scope="module")
def sequence():
    planes = synthetic.default_room(seed=1)
    poses = synthetic.orbit_trajectory(40, radius=0.15, advance=0.3)
    frames = [synthetic.render(planes, T) for T in poses]
    return poses, frames


def small_cfg():
    return SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
    )


def test_full_slam_tracks_and_maps(sequence):
    poses_gt, frames = sequence
    slam = System(small_cfg())
    for i, (g, d) in enumerate(frames):
        slam.track_rgbd(g, d, float(i) / 30.0)
    slam.shutdown()

    assert slam.state is TrackingState.OK
    # multiple keyframes created, landmarks in the map
    assert slam.map.n_kfs >= 2
    assert slam.map.n_pts > 300
    # tracking healthy: local-map inliers high throughout
    inl = [s["inliers"] for s in slam.stats[1:]]
    assert min(inl) > 50, (min(inl), inl)

    est = np.asarray(slam.poses_cw)
    gt = np.asarray(poses_gt)
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est), evaluate.positions_from_cw(gt)
    )
    assert ate < 0.015, f"ATE {ate:.4f} m"
    t_rpe, r_rpe = evaluate.rpe(est, gt)
    assert t_rpe < 0.008, t_rpe


def test_map_bookkeeping_consistency(sequence):
    poses_gt, frames = sequence
    slam = System(small_cfg())
    for i, (g, d) in enumerate(frames[:20]):
        slam.track_rgbd(g, d, float(i) / 30.0)
    slam.shutdown()

    m = slam.map
    # device/host observation mirrors agree
    dev_obs = np.array(m.arrays.kf_obs[: m.n_kfs])
    np.testing.assert_array_equal(dev_obs, m.kf_obs_np[: m.n_kfs])
    # every recorded observation points at an allocated landmark
    obs = dev_obs[dev_obs >= 0]
    assert obs.max() < m.n_pts
    # covisibility symmetric, zero diagonal
    c = m.covis[: m.n_kfs, : m.n_kfs]
    np.testing.assert_array_equal(c, c.T)
    assert (np.diag(c) == 0).all()
    # scratch slots never allocated
    assert not bool(m.arrays.pt_valid[m.M - 1])
    assert not bool(m.arrays.kf_valid[m.K - 1])
