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
        state, counts = step(
            state, jnp.asarray(frames[k]), jnp.asarray(depths[k]), views,
            r1, r2,
        )
    c = np.asarray(counts)
    assert c.shape == (S, 2)
    assert (c[:, 0] > 10).all(), c   # motion-model inliers per stream
    # all streams see identical input -> identical poses
    T = np.asarray(state.Tcw)
    np.testing.assert_allclose(T, np.broadcast_to(T[0], T.shape), atol=1e-5)
    # state sharded over the mesh
    shard_devs = {d for d in state.Tcw.devices()}
    assert len(shard_devs) == S
