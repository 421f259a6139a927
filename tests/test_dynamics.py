"""The two-stage dynamic rejection on a scene with a moving object."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.frontend.features import ORBPipeline
from amos_slam_tpu.frontend.dynamics import compute_dynamics
from amos_slam_tpu.io import synthetic


@pytest.fixture(scope="module")
def dynamic_pair():
    """Two frames: camera nearly static, one plane moving fast."""
    poses = synthetic.orbit_trajectory(20, radius=0.05, advance=0.1)
    out = []
    for i, t in [(3, 0.1), (4, 0.1333)]:
        planes, mover = synthetic.room_with_mover(seed=1, t=t, speed=3.0)
        g, d, ids = synthetic.render(planes, poses[i], return_ids=True)
        out.append((g, d, ids == mover, poses[i]))
    return out


def test_dynamics_flags_moving_object(dynamic_pair):
    (g0, d0, m0, T0), (g1, d1, m1, T1) = dynamic_pair
    cfg = SystemConfig()
    pipe = ORBPipeline(cfg.orb, cfg.camera)
    kp, _, _, _ = pipe.detect_keypoints(jnp.asarray(g0))
    flow_pts = kp.xy  # level-0 (x, y)

    res = compute_dynamics(
        pipe.cam,
        jnp.asarray(g0), jnp.asarray(d0),
        jnp.asarray(g1), jnp.asarray(d1),
        jnp.zeros((480, 640), bool),       # no semantic mask: stage 2 only
        jnp.asarray(T0.astype(np.float32)),
        # oracle constant-velocity model: T_pred = vel @ T0 = T1
        jnp.asarray((T1 @ np.linalg.inv(T0)).astype(np.float32)),
        flow_pts, kp.valid,
        0,
    )
    sup = np.asarray(res.suppress_mask)
    mover = np.asarray(m1)
    # most of the moving object is suppressed
    recall = (sup & mover).sum() / max(mover.sum(), 1)
    assert recall > 0.6, recall
    # Static background mostly kept. Points tracked from the mover's OLD
    # position are genuinely dynamic (the object's trail/disocclusion zone),
    # so the excusable region is the union of both footprints, dilated to
    # cluster granularity.
    from amos_slam_tpu.ops.slic import dilate_mask
    trail = np.asarray(
        dilate_mask(jnp.asarray(np.asarray(m0) | mover), radius=24)
    )
    false_pos = (sup & ~trail).sum() / (~trail).sum()
    assert false_pos < 0.25, false_pos
    # epipolar outliers concentrate on the mover's old-or-new footprint
    # (trail outliers legitimately land on disoccluded background)
    epi = np.asarray(res.epi_outlier)
    pts1 = np.asarray(res.flow_pts1)
    in_trail = trail[
        np.clip(pts1[:, 1].round().astype(int), 0, 479),
        np.clip(pts1[:, 0].round().astype(int), 0, 639),
    ]
    if epi.sum() >= 10:
        assert (epi & in_trail).sum() / epi.sum() > 0.5


def test_dynamics_clean_scene_no_suppression(rng):
    """Without moving objects and without a seg mask, (almost) nothing
    should be suppressed."""
    poses = synthetic.orbit_trajectory(10, radius=0.05, advance=0.1)
    planes = synthetic.default_room(seed=2)
    g0, d0 = synthetic.render(planes, poses[3])
    g1, d1 = synthetic.render(planes, poses[4])
    cfg = SystemConfig()
    pipe = ORBPipeline(cfg.orb, cfg.camera)
    kp, _, _, _ = pipe.detect_keypoints(jnp.asarray(g0))
    res = compute_dynamics(
        pipe.cam,
        jnp.asarray(g0), jnp.asarray(d0), jnp.asarray(g1), jnp.asarray(d1),
        jnp.zeros((480, 640), bool),
        jnp.asarray(poses[3].astype(np.float32)),
        jnp.asarray(
            (poses[4] @ np.linalg.inv(poses[3])).astype(np.float32)
        ),
        kp.xy, kp.valid,
        1,
    )
    frac = float(np.asarray(res.suppress_mask).mean())
    assert frac < 0.1, frac
