"""Chunked (micro-batched) tracking: track_rgbd_chunk must match the
per-frame API's trajectory quality while dispatching W frames per program.

The chunk scan holds the local-map view fixed across W frames and resolves
keyframe decisions at chunk granularity (supervision lag <= 2W); ATE on the
synthetic room must stay in the same regime as the per-frame path
(tests/test_slam_e2e.py asserts < 2 cm there)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.system import System, TrackingState
from amos_slam_tpu.io import synthetic, evaluate


@pytest.fixture(scope="module")
def room_frames():
    n = 48
    planes = synthetic.default_room(seed=1)
    poses = synthetic.orbit_trajectory(n, radius=0.1, advance=0.25)
    frames = [synthetic.render(planes, T) for T in poses]
    return frames, np.asarray(poses)


def test_chunked_matches_per_frame_ate(room_frames):
    frames, gt = room_frames
    W = 8
    cfg = SystemConfig(use_dynamics=False)

    slam = System(cfg)
    for k in range(0, len(frames), W):
        g = jnp.stack([jnp.asarray(f[0]) for f in frames[k : k + W]])
        d = jnp.stack([jnp.asarray(f[1]) for f in frames[k : k + W]])
        ts = [i / 30.0 for i in range(k, k + g.shape[0])]
        slam.track_rgbd_chunk(g, d, ts)
    slam.shutdown()

    assert slam.state is TrackingState.OK
    est = np.asarray(slam.poses_np())
    assert est.shape[0] == len(frames)
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est), evaluate.positions_from_cw(gt)
    )
    assert ate < 0.02, f"chunked ATE {ate}"
    # keyframes were still created through the lagged supervision
    assert slam.map.n_kfs >= 2
    # stats accumulator was applied: the map saw nonzero visible counters
    vis = np.asarray(slam.map.arrays.pt_visible)
    assert vis.max() > 0


def test_chunked_dynamics_rejection():
    """Two-stage chunk program (make_dyn_chunk_fn): the geometric stage
    inside the W-frame scan must keep tracking accurate on a scene with a
    large mover (same contract as test_dynamic_slam_e2e, chunked)."""
    n, W = 24, 6
    poses = synthetic.orbit_trajectory(n, radius=0.1, advance=0.2)
    frames = []
    for i in range(n):
        planes, mover = synthetic.room_with_mover(
            seed=1, t=i / 30.0, speed=1.5
        )
        g, d, ids = synthetic.render(planes, poses[i], return_ids=True)
        frames.append((g, d, ids == mover))

    from amos_slam_tpu.config import MapConfig, TrackingConfig

    cfg = SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=True,
    )
    slam = System(cfg)
    for k in range(0, n, W):
        g = jnp.stack([jnp.asarray(f[0]) for f in frames[k : k + W]])
        d = jnp.stack([jnp.asarray(f[1]) for f in frames[k : k + W]])
        m = jnp.stack([jnp.asarray(f[2]) for f in frames[k : k + W]])
        ts = [i / 30.0 for i in range(k, k + W)]
        slam.track_rgbd_chunk(g, d, ts, seg_masks=m)
    slam.shutdown()
    est = np.asarray(slam.poses_np())
    assert est.shape[0] == n
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est),
        evaluate.positions_from_cw(np.asarray(poses)),
    )
    assert ate < 0.03, f"chunked two-stage ATE {ate}"


def test_chunk_fallback_paths(room_frames):
    """First chunk arrives before initialization: rows fall back to the
    per-frame path, later chunks take the scan; trajectory length is right."""
    frames, gt = room_frames
    cfg = SystemConfig(use_dynamics=False)
    slam = System(cfg)
    W = 6
    n = 18
    for k in range(0, n, W):
        g = jnp.stack([jnp.asarray(f[0]) for f in frames[k : k + W]])
        d = jnp.stack([jnp.asarray(f[1]) for f in frames[k : k + W]])
        ts = [i / 30.0 for i in range(k, k + W)]
        out = slam.track_rgbd_chunk(g, d, ts)
        assert out.shape == (W, 4, 4)
    slam.shutdown()
    assert len(slam.poses_np()) == n
    assert len(slam.timestamps) == n
