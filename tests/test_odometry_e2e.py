"""End-to-end RGB-D odometry on a synthetic sequence: the minimum slice
(SURVEY.md section 7 stage 4) must recover the camera trajectory."""

import numpy as np
import pytest

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.frontend.tracking import RGBDOdometry
from amos_slam_tpu.io import synthetic, evaluate, trajectory


@pytest.fixture(scope="module")
def sequence():
    planes = synthetic.default_room(seed=1)
    poses = synthetic.orbit_trajectory(30, radius=0.15, advance=0.3)
    frames = [synthetic.render(planes, T) for T in poses]
    return poses, frames


def test_rgbd_odometry_recovers_trajectory(sequence, tmp_path):
    poses_gt, frames = sequence
    odo = RGBDOdometry(SystemConfig())
    for i, (gray, depth) in enumerate(frames):
        odo.track(gray, depth, timestamp=float(i) / 30.0)

    est = np.asarray(odo.poses_cw)
    gt = np.asarray(poses_gt)
    est_pos = evaluate.positions_from_cw(est)
    gt_pos = evaluate.positions_from_cw(gt)
    ate = evaluate.ate_rmse(est_pos, gt_pos)
    t_rpe, r_rpe = evaluate.rpe(est, gt)

    # healthy tracking throughout
    inliers = [s["inliers"] for s in odo.stats[1:]]
    assert min(inliers) > 50, (min(inliers), inliers[:5])
    assert ate < 0.02, f"ATE {ate:.4f} m"
    assert t_rpe < 0.01, f"RPE-t {t_rpe:.4f} m"

    # trajectory IO roundtrip (TUM format, like SaveTrajectoryTUM)
    path = tmp_path / "traj.txt"
    trajectory.save_tum(str(path), odo.timestamps, odo.poses_cw)
    ts, twc = trajectory.load_tum(str(path))
    assert len(ts) == len(frames)
    # loaded Twc must invert back to saved Tcw
    np.testing.assert_allclose(
        np.linalg.inv(twc[5]), est[5], atol=1e-6
    )


def test_ate_evaluator_known_offset(rng):
    gt = rng.standard_normal((50, 3))
    # rigidly transformed + noise
    from scipy.spatial.transform import Rotation as R
    Rm = R.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    est = (Rm @ gt.T).T + np.array([1.0, 2.0, 3.0])
    est += rng.normal(0, 0.01, est.shape)
    ate = evaluate.ate_rmse(est, gt)
    assert ate < 0.02
