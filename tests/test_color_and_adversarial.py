"""CIELAB SLIC (color plumbing) + adversarial synthetic suites.

Round-2 coverage for two round-1 gaps:
* SLIC ran on grayscale+depth while the reference clusters in CIELAB
  (src/cluster.cc:88-146) -- a luma-matched, chroma-distinct mover was
  invisible to the superpixel stage;
* every accuracy number came from the single well-behaved plane-room
  scene -- no multi-mover, camera-shake, or chroma-adversarial suites.
"""

import numpy as np
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.io import synthetic, evaluate
from amos_slam_tpu.io.synthetic import Plane, _block_texture


def _ate(slam, poses_gt):
    est = np.asarray(slam.poses_cw)
    gt = np.asarray(poses_gt)
    return evaluate.ate_rmse(
        evaluate.positions_from_cw(est), evaluate.positions_from_cw(gt)
    )


def _cfg(use_dynamics):
    return SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=use_dynamics,
        deterministic=True,
    )


# ---------------------------------------------------------------- unit level
def test_rgb_to_lab_known_values():
    import jax.numpy as jnp
    from amos_slam_tpu.ops.slic import rgb_to_lab

    lab = np.asarray(rgb_to_lab(jnp.asarray(
        [[[255, 255, 255], [0, 0, 0], [255, 0, 0], [0, 255, 0]]],
        jnp.float32,
    )))
    np.testing.assert_allclose(lab[0, 0], [100.0, 0.0, 0.0], atol=0.02)
    np.testing.assert_allclose(lab[0, 1], [0.0, 0.0, 0.0], atol=0.02)
    # textbook sRGB/D65 values
    np.testing.assert_allclose(lab[0, 2], [53.24, 80.09, 67.20], atol=0.05)
    np.testing.assert_allclose(lab[0, 3], [87.73, -86.18, 83.18], atol=0.05)


def test_slic_lab_separates_chroma_only_regions():
    """Two regions with identical luma statistics but different chroma:
    Lab SLIC must respect the boundary; gray SLIC cannot see it at all."""
    import jax.numpy as jnp
    from amos_slam_tpu.ops.slic import slic_kmeans, rgb_to_lab

    rng = np.random.default_rng(3)
    H, W = 64, 128
    base = rng.uniform(100, 140, (H, W)).astype(np.float32)
    rgb = np.repeat(base[..., None], 3, axis=-1)
    rgb[:, :64, 0] *= 1.5
    rgb[:, :64, 2] *= 0.5
    rgb[:, 64:, 0] *= 0.5
    rgb[:, 64:, 2] *= 1.5
    depth = jnp.ones((H, W))
    lab = rgb_to_lab(jnp.asarray(rgb)) * 2.55
    r = slic_kmeans(lab, depth, cell=16, k=4)
    lbl = np.asarray(r.pixel_super)
    # no superpixel spans the chroma boundary
    straddle = (lbl[:, 60] == lbl[:, 67]).mean()
    assert straddle < 0.05, straddle


# ------------------------------------------------- luma-matched mover (mask)
def test_luma_matched_mover_needs_color():
    """A mover whose gray texture is statistically identical to the wall
    directly behind it (same generator, same contrast, near-same depth) but
    chroma-tinted: with the color frame supplied, the geometric stage's
    CIELAB superpixels isolate it and suppression must cover it."""
    import jax
    import jax.numpy as jnp
    from amos_slam_tpu.frontend.features import ORBPipeline
    from amos_slam_tpu.frontend.dynamics import compute_dynamics
    from amos_slam_tpu.ops.slic import dilate_mask

    n0 = 10
    poses = synthetic.orbit_trajectory(16, radius=0.08, advance=0.15)

    def scene(t):
        rng = np.random.default_rng(5)
        planes = [
            Plane(2, 5.0, (-4.0, 4.0, -3.0, 3.0), _block_texture(rng)),
            Plane(1, 1.6, (-4.0, 4.0, 0.0, 5.0), _block_texture(rng)),
            Plane(1, -1.6, (-4.0, 4.0, 0.0, 5.0), _block_texture(rng)),
            Plane(0, -2.5, (-3.0, 3.0, 0.0, 5.0), _block_texture(rng)),
            Plane(0, 2.5, (-3.0, 3.0, 0.0, 5.0), _block_texture(rng)),
        ]
        x0 = -1.0 + 1.8 * t
        # same texture GENERATOR as the walls (gray-statistically identical,
        # so gray SLIC cannot see its boundary), tiny depth offset (so the
        # position+depth k-means merges it with the wall), strong chroma
        # tint (luma-normalized by the renderer), texture anchored to the
        # moving bounds (a real mover, not a sliding window)
        planes.append(Plane(
            2, 4.75, (x0, x0 + 1.1, -1.0, 1.0),
            _block_texture(np.random.default_rng(99)),
            chroma=(1.6, 0.85, 0.55),
            tex_anchor=(x0, 0.0),
        ))
        return planes, len(planes) - 1

    frames = []
    for i in (n0, n0 + 1):
        planes, mid = scene(i / 30.0)
        g, d, ids, rgb = synthetic.render(
            planes, poses[i], return_ids=True, return_rgb=True
        )
        frames.append((g, d, ids == mid, rgb))

    g0, d0, _, _ = frames[0]
    g1, d1, m1, rgb1 = frames[1]
    cfg = SystemConfig()
    pipe = ORBPipeline(cfg.orb, cfg.camera)
    kp, _, _, _ = pipe.detect_keypoints(jnp.asarray(g0))

    def dyn(cur_rgb):
        return compute_dynamics(
            pipe.cam,
            jnp.asarray(g0), jnp.asarray(d0),
            jnp.asarray(g1), jnp.asarray(d1),
            jnp.zeros((480, 640), bool),
            jnp.asarray(poses[n0].astype(np.float32)),
            jnp.asarray(
                (poses[n0 + 1] @ np.linalg.inv(poses[n0])).astype(np.float32)
            ),
            kp.xy, kp.valid, 0,
            cur_rgb=cur_rgb,
        )

    res_rgb = dyn(jnp.asarray(rgb1.astype(np.float32)))
    sup = np.asarray(res_rgb.suppress_mask)
    mover = np.asarray(m1)
    recall = (sup & mover).sum() / max(mover.sum(), 1)
    # static scene outside the mover's trail must stay usable
    trail = np.asarray(dilate_mask(jnp.asarray(mover), radius=24))
    false_pos = (sup & ~trail).sum() / (~trail).sum()
    assert recall > 0.5, recall
    assert false_pos < 0.25, false_pos


# --------------------------------------------------------------- e2e suites
def test_two_movers_opposite_directions():
    """Two textured movers crossing in opposite directions: the cluster
    arbitration must reject both without suppressing the static scene."""
    n = 20
    poses = synthetic.orbit_trajectory(n, radius=0.08, advance=0.15)
    frames = []
    for i in range(n):
        t = i / 30.0
        planes = synthetic.default_room(seed=1)
        xa = -1.4 + 1.6 * t
        xb = 1.0 - 1.8 * t
        rng = np.random.default_rng(42)
        planes.append(Plane(
            2, 2.6, (xa, xa + 0.6, -1.0, 0.4),
            _block_texture(rng, block=6), tex_scale=90.0,
            tex_anchor=(xa, 0.0),   # texture rides the mover
        ))
        planes.append(Plane(
            2, 3.4, (xb, xb + 0.7, -0.3, 1.1),
            _block_texture(rng, block=6), tex_scale=90.0,
            tex_anchor=(xb, 0.0),
        ))
        g, d = synthetic.render(planes, poses[i])
        frames.append((g, d))

    slam = System(_cfg(use_dynamics=True))
    for i, (g, d) in enumerate(frames):
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    a = _ate(slam, poses)
    assert np.isfinite(a) and a < 0.03, a


def test_camera_shake():
    """High-frequency pose jitter (handheld shake): the motion model is
    wrong every frame; matching radii and the pose cascade must absorb it."""
    n = 24
    rng = np.random.default_rng(9)
    base = synthetic.orbit_trajectory(n, radius=0.08, advance=0.2)
    from scipy.spatial.transform import Rotation as R

    poses = []
    for i, T in enumerate(base):
        jT = np.eye(4)
        jT[:3, :3] = R.from_euler(
            "xyz", rng.normal(0, 0.012, 3)
        ).as_matrix()
        jT[:3, 3] = rng.normal(0, 0.012, 3)
        poses.append(jT @ T)
    planes = synthetic.default_room(seed=2)
    frames = [synthetic.render(planes, T) for T in poses]

    slam = System(_cfg(use_dynamics=False))
    for i, (g, d) in enumerate(frames):
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    a = _ate(slam, poses)
    assert np.isfinite(a) and a < 0.04, a
    # the system must never report LOST on shake alone
    assert all(s["inliers"] > 0 or s["matches"] > 0 for s in slam.stats[2:])
