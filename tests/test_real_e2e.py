"""Real-imagery end-to-end SLAM: the full System tracked over a sequence
rendered from the reference's shipped real TUM frame (io.warp_replay),
with exact ground truth -- the first non-synthetic e2e ATE in the suite
(round-4 VERDICT item 6). The harness plays the role of the reference's
rgbd_tum main + offline ATE evaluation
(/root/reference/Examples/RGB-D/rgbd_tum.cc:58-176)."""

import os

import numpy as np
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System, TrackingState
from amos_slam_tpu.io import synthetic, evaluate
from amos_slam_tpu.io.warp_replay import (
    load_reference_frame, plane_replay_sequence,
    real_room, real_room_with_mover,
)

pytestmark = pytest.mark.skipif(
    load_reference_frame() is None,
    reason="reference sample images not present",
)


def test_full_system_on_real_imagery():
    tex = load_reference_frame()
    cfg = SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=False,
        deterministic=True,
    )
    slam = System(cfg)
    n = 20
    gt = synthetic.orbit_trajectory(n, radius=0.04, advance=0.12)
    frames = plane_replay_sequence(tex, slam.cam, gt)

    for i, (g, d) in enumerate(frames):
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()

    assert slam.state is TrackingState.OK
    assert slam.map.n_kfs >= 1
    est = np.asarray(slam.corrected_poses_np())
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est),
        evaluate.positions_from_cw(np.asarray(gt)),
    )
    # real texture, exact geometry: sub-centimetre or the front end is
    # mis-tracking real image statistics
    assert ate < 0.01, f"real-imagery ATE {ate:.4f} m"


def test_full_system_on_real_room():
    """Multi-plane real-textured room: floor + walls + occluding box, all
    textured from crops of the reference's real TUM office frames -- real
    image statistics WITH depth discontinuities and occlusion (round-4
    verdict item 6), unlike the single-plane harness above."""
    planes = real_room(seed=3)
    cfg = SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=False,
        deterministic=True,
    )
    slam = System(cfg)
    n = 24
    gt = synthetic.orbit_trajectory(n, radius=0.1, advance=0.2)
    for i, T in enumerate(gt):
        g, d = synthetic.render(planes, T)
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()

    assert slam.state is TrackingState.OK
    est = np.asarray(slam.corrected_poses_np())
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est),
        evaluate.positions_from_cw(np.asarray(gt)),
    )
    assert ate < 0.02, f"real-room ATE {ate:.4f} m"


def test_two_stage_beats_baseline_on_real_textured_mover():
    """Dynamic rejection on a REAL-textured moving object (verdict item 6
    'done' criterion): the geometric two-stage path must beat the
    unprotected baseline when the mover carries real image texture, not
    just synthetic block noise."""
    n = 24
    gt = synthetic.orbit_trajectory(n, radius=0.1, advance=0.2)
    frames = []
    for i, T in enumerate(gt):
        planes, mover = real_room_with_mover(seed=3, t=i / 30.0, speed=1.5)
        g, d = synthetic.render(planes, T)
        frames.append((g, d))

    def run(use_dynamics):
        cfg = SystemConfig(
            map=MapConfig(max_keyframes=32, max_points=8192),
            tracking=TrackingConfig(max_map_points_local=2048),
            use_dynamics=use_dynamics,
            deterministic=True,
        )
        slam = System(cfg)
        for i, (g, d) in enumerate(frames):
            slam.track_rgbd(g, d, i / 30.0)
        slam.shutdown()
        est = np.asarray(slam.poses_cw)
        return evaluate.ate_rmse(
            evaluate.positions_from_cw(est),
            evaluate.positions_from_cw(np.asarray(gt)),
        )

    ate_dyn = run(True)
    ate_off = run(False)
    assert ate_dyn < 0.03, f"two-stage real-texture ATE {ate_dyn:.4f}"
    assert ate_dyn < 0.7 * ate_off or ate_off < 0.02, (ate_dyn, ate_off)


def test_plane_replay_geometry_self_consistent():
    """The renderer's own contract: identity pose reproduces the texture,
    and depth obeys the plane equation."""
    tex = load_reference_frame()
    from amos_slam_tpu.config import CameraConfig
    from amos_slam_tpu.geometry.camera import Camera

    cam = CameraConfig()
    g, d = plane_replay_sequence(tex, cam, [np.eye(4)])[0]
    # center crop matches the source exactly (no warp at identity)
    h, w = tex.shape
    sl = np.s_[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4]
    np.testing.assert_allclose(g[sl], tex[sl], atol=1e-3)
    # plane equation n.(z*K^-1 u) = d at a few pixels
    n = np.asarray([0.06, -0.04, 1.0])
    n = n / np.linalg.norm(n)
    for (px, py) in [(100, 100), (320, 240), (560, 400)]:
        r = np.asarray(
            [(px - cam.cx) / cam.fx, (py - cam.cy) / cam.fy, 1.0]
        )
        assert abs(n @ (d[py, px] * r) - 2.0) < 1e-6
