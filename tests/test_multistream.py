"""Multi-stream batched SLAM on an 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amos_slam_tpu.config import SystemConfig, ORBConfig, CameraConfig
from amos_slam_tpu.frontend.features import ORBPipeline
from amos_slam_tpu.io import synthetic
from amos_slam_tpu.parallel import multistream as ms


def tiny_setup():
    cam = CameraConfig(
        fx=120.0, fy=120.0, cx=64.0, cy=48.0, width=128, height=96, bf=10.0
    )
    orb = ORBConfig(
        n_features=96, max_kpts=128, n_levels=3, border=8, cell_size=8
    )
    return ORBPipeline(orb, cam)


def render_tiny(planes, Tcw):
    return synthetic.render(
        planes, Tcw, fx=120.0, fy=120.0, cx=64.0, cy=48.0, width=128, height=96
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multistream_sharded_step():
    S = 8
    pipeline = tiny_setup()
    mesh = ms.make_stream_mesh(jax.devices()[:S])
    planes = synthetic.default_room(seed=2)
    poses = synthetic.orbit_trajectory(3, radius=0.05, advance=0.05)

    frames = [
        np.stack([render_tiny(planes, T)[0] for _ in range(S)]) for T in poses
    ]
    depths = [
        np.stack([render_tiny(planes, T)[1] for _ in range(S)]) for T in poses
    ]

    state = ms.init_state(
        pipeline, jnp.asarray(frames[0]), jnp.asarray(depths[0])
    )
    views = ms.empty_views(S, 256)
    step = ms.shard_step(pipeline, mesh)
    r1 = jnp.asarray(10.0)
    r2 = jnp.asarray(6.0)
    for k in (1, 2):
        state, sup, heavy = step(
            state, jnp.asarray(frames[k]), jnp.asarray(depths[k]), views,
            r1, r2,
        )
    c = np.asarray(sup)
    assert c.shape == (S, 3)
    assert (c[:, 0] > 10).all(), c   # motion-model inliers per stream
    assert (c[:, 2] > 50).all(), c   # close-depth keypoints counted
    # all streams see identical input -> identical poses
    T = np.asarray(state.Tcw)
    np.testing.assert_allclose(T, np.broadcast_to(T[0], T.shape), atol=1e-5)
    # state sharded over the mesh
    shard_devs = {d for d in state.Tcw.devices()}
    assert len(shard_devs) == S


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multistream_live_maps():
    """8-stream SLAM (not odometry): per-stream keyframe insertion grows
    each stream's own map and refreshes its local view; poses stay accurate
    against ground truth over a trajectory long enough to force multiple
    keyframes per stream."""
    from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
    from amos_slam_tpu.io import evaluate

    S = 8
    cfg = SystemConfig(
        camera=CameraConfig(
            fx=120.0, fy=120.0, cx=64.0, cy=48.0, width=128, height=96,
            bf=10.0,
        ),
        orb=ORBConfig(
            n_features=96, max_kpts=128, n_levels=3, border=8, cell_size=8
        ),
        map=MapConfig(max_keyframes=16, max_points=4096),
        tracking=TrackingConfig(
            max_map_points_local=512, min_inliers_local_map=15
        ),
        use_dynamics=False,
    )
    mesh = ms.make_stream_mesh(jax.devices()[:S])
    slam = ms.MultiStreamSLAM(cfg, S, mesh)

    n = 14
    gt = synthetic.orbit_trajectory(n, radius=0.08, advance=0.22)
    # distinct scene per stream -> genuinely independent maps
    scenes = [synthetic.default_room(seed=20 + s) for s in range(S)]

    def batch(k):
        gs, ds = [], []
        for s in range(S):
            g, d = render_tiny(scenes[s], gt[k])
            gs.append(g)
            ds.append(d)
        return np.stack(gs), np.stack(ds)

    g0, d0 = batch(0)
    slam.initialize(g0, d0)
    est = [np.tile(np.eye(4), (S, 1, 1))]
    for k in range(1, n):
        g, d = batch(k)
        T, sup = slam.step(g, d)
        est.append(np.asarray(T))
    slam.flush()   # supervision is pipelined 1-2 steps behind dispatch

    # every stream's map grew beyond the bootstrap keyframe
    kfs = [m.n_kfs for m in slam.maps]
    assert all(k >= 2 for k in kfs), kfs
    # per-stream trajectory accuracy vs ground truth
    gt_pos = evaluate.positions_from_cw(np.asarray(gt))
    for s in range(S):
        es = np.stack([e[s] for e in est])
        ate = evaluate.ate_rmse(evaluate.positions_from_cw(es), gt_pos)
        assert ate < 0.08, f"stream {s}: ATE {ate:.4f} (kfs={kfs[s]})"
    # tiny 128x96 frames with a 96-feature budget track noisily; the
    # accuracy contract lives in the full-size e2e tests -- here the gates
    # bound gross failure while proving live per-stream map growth
    ates = [
        evaluate.ate_rmse(
            evaluate.positions_from_cw(np.stack([e[s] for e in est])), gt_pos
        )
        for s in range(S)
    ]
    assert float(np.median(ates)) < 0.04, ates


def test_init_state_buffers_are_distinct():
    """Donation-aliasing regression (round 5): donating ONE buffer
    referenced by TWO pytree leaves makes XLA alias a single donated input
    to two outputs -- a runtime 'INVALID_ARGUMENT: TPU backend error' on
    real TPUs (invisible on CPU, where donation is a no-op; this crashed
    the multistream bench for four rounds while shard_step still donated).
    init_state must materialize Tcw and velocity as separate buffers so
    any donating caller stays safe."""
    pipeline = tiny_setup()
    planes = synthetic.default_room(seed=5)
    g, d = render_tiny(planes, np.eye(4))
    S = 2
    state = ms.init_state(
        pipeline,
        jnp.stack([jnp.asarray(g, jnp.float32)] * S),
        jnp.stack([jnp.asarray(d, jnp.float32)] * S),
    )
    assert state.Tcw is not state.velocity
    assert (
        state.Tcw.unsafe_buffer_pointer()
        != state.velocity.unsafe_buffer_pointer()
    )
