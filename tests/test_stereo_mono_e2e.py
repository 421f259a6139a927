"""Stereo and monocular SLAM end-to-end on synthetic sequences."""

import numpy as np
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System, TrackingState
from amos_slam_tpu.io import synthetic, evaluate


def cfg_for(sensor):
    return SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=False,
        sensor=sensor,
    )


def test_stereo_slam_e2e():
    baseline = 0.075
    planes = synthetic.default_room(seed=9)
    poses = synthetic.orbit_trajectory(24, radius=0.1, advance=0.25)
    T_shift = np.eye(4)
    T_shift[0, 3] = -baseline

    slam = System(cfg_for("stereo"))
    for i, T in enumerate(poses):
        gl, _ = synthetic.render(planes, T)
        gr, _ = synthetic.render(planes, T_shift @ T)
        slam.track_stereo(gl, gr, i / 30.0)
    slam.shutdown()

    assert slam.state is TrackingState.OK
    est = np.asarray(slam.poses_cw)
    gt = np.asarray(poses)
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est), evaluate.positions_from_cw(gt)
    )
    assert ate < 0.02, f"stereo ATE {ate:.4f}"
    inl = [s["inliers"] for s in slam.stats[1:]]
    assert min(inl) > 50, min(inl)


def test_mono_slam_e2e():
    planes = synthetic.default_room(seed=11)
    # sideways sweep: strong parallax for initialization
    poses = synthetic.orbit_trajectory(30, radius=0.35, advance=0.15)

    slam = System(cfg_for("mono"))
    for i, T in enumerate(poses):
        g, _ = synthetic.render(planes, T)
        slam.track_monocular(g, i / 30.0)
    slam.shutdown()

    assert slam.state is TrackingState.OK
    assert slam.map.n_kfs >= 2
    assert slam.map.n_pts > 100
    # ATE up to scale (mono gauge): align with similarity
    est = np.asarray(slam.poses_cw)
    gt = np.asarray(poses)
    # only frames after initialization have meaningful poses
    init_frame = next(
        i for i, s in enumerate(slam.stats) if s.get("kf")
    )
    est = est[init_frame:]
    gt = gt[init_frame:]
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est),
        evaluate.positions_from_cw(gt),
        with_scale=True,
    )
    assert ate < 0.05, f"mono ATE (scale-aligned) {ate:.4f}"
