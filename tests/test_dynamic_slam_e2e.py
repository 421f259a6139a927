"""Anti-dynamics SLAM end-to-end: on a scene with a large moving object,
two-stage rejection must substantially beat the no-rejection baseline."""

import numpy as np
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.io import synthetic, evaluate


@pytest.fixture(scope="module")
def dynamic_sequence():
    n = 24
    poses = synthetic.orbit_trajectory(n, radius=0.1, advance=0.2)
    frames = []
    for i in range(n):
        t = i / 30.0
        planes, mover = synthetic.room_with_mover(seed=1, t=t, speed=1.5)
        g, d, ids = synthetic.render(planes, poses[i], return_ids=True)
        frames.append((g, d, ids == mover))
    return poses, frames


def run(frames, use_dynamics, seg=False):
    cfg = SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=use_dynamics,
        # ATE comparisons need run-to-run reproducibility: free-running
        # supervision makes keyframe timing depend on tunnel latency
        deterministic=True,
    )
    slam = System(cfg)
    for i, (g, d, mask) in enumerate(frames):
        slam.track_rgbd(g, d, i / 30.0, seg_mask=mask if seg else None)
    slam.shutdown()
    return slam


def ate(slam, poses_gt):
    est = np.asarray(slam.poses_cw)
    gt = np.asarray(poses_gt)
    return evaluate.ate_rmse(
        evaluate.positions_from_cw(est), evaluate.positions_from_cw(gt)
    )


def test_two_stage_rejection_beats_baseline(dynamic_sequence):
    poses_gt, frames = dynamic_sequence
    ate_dyn = ate(run(frames, use_dynamics=True), poses_gt)
    ate_off = ate(run(frames, use_dynamics=False), poses_gt)
    # the geometric stage alone should keep tracking accurate
    assert ate_dyn < 0.03, f"dynamic ATE {ate_dyn:.4f}"
    # and clearly beat the unprotected baseline on a dynamic scene
    assert ate_dyn < 0.7 * ate_off or ate_off < 0.02, (ate_dyn, ate_off)


def test_two_stage_on_dominant_mover():
    """A fast mover covering ~half the image (like a person crossing close
    to the camera in TUM walking): unprotected tracking degrades ~4x; the
    geometric stage keeps accuracy."""
    from amos_slam_tpu.io.synthetic import Plane, _block_texture

    n = 24
    poses = synthetic.orbit_trajectory(n, radius=0.1, advance=0.2)
    frames = []
    for i in range(n):
        t = i / 30.0
        planes = synthetic.default_room(seed=1)
        x0 = -1.5 + 2.0 * t
        planes.append(Plane(
            2, 1.6, (x0, x0 + 1.2, -1.2, 1.2),
            _block_texture(np.random.default_rng(99), block=6), tex_scale=90.0,
        ))
        g, d, ids = synthetic.render(planes, poses[i], return_ids=True)
        frames.append((g, d, ids == len(planes) - 1))

    ate_on = ate(run(frames, use_dynamics=True), poses)
    ate_off = ate(run(frames, use_dynamics=False), poses)
    assert ate_on < 0.01, f"two-stage ATE {ate_on:.4f}"
    assert ate_off > 2.0 * ate_on, (ate_on, ate_off)


def test_stage1_seg_mask_also_protects(dynamic_sequence):
    poses_gt, frames = dynamic_sequence
    slam = run(frames, use_dynamics=False, seg=True)  # stage 1 only
    a = ate(slam, poses_gt)
    assert a < 0.03, f"seg-only ATE {a:.4f}"
