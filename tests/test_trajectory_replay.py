"""Replay-corrected full-frame trajectory export.

The reference's SaveTrajectoryTUM does not dump poses recorded at track
time: it replays each frame's *relative* pose Tcr against its reference
keyframe's CURRENT pose (src/System.cc:444-516, relative list built at
src/Tracking.cc:806-815), so loop-closure / global-BA corrections reach
every pre-loop frame. These tests pin down that contract for
System.corrected_poses_np:

  * a rigid correction applied to all keyframe poses moves every
    resolvable frame pose by exactly that correction;
  * a culled reference keyframe resolves through its recorded cull-time
    spanning-tree relative pose (KeyFrame::mTcp, src/System.cc:468-476)
    with NO change to the exported trajectory;
  * keyframe-slot compaction (uid indirection) leaves the export invariant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System, TrackingState
from amos_slam_tpu.io import synthetic
from amos_slam_tpu.geometry import se3


def small_cfg():
    return SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=False,
        # zero supervision lag: keyframe insertion lands on the exact frame
        # that triggered it, so reference-keyframe assignments are
        # reproducible run to run
        deterministic=True,
    )


@pytest.fixture(scope="module")
def tracked():
    planes = synthetic.default_room(seed=3)
    poses = synthetic.orbit_trajectory(24, radius=0.1, advance=0.3)
    frames = [synthetic.render(planes, T) for T in poses]
    slam = System(small_cfg())
    for i, (g, d) in enumerate(frames):
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    assert slam.state is TrackingState.OK
    assert slam.map.n_kfs >= 2
    return slam


def _delta():
    """A non-trivial rigid world-frame change (right-multiplies Tcw)."""
    w = np.asarray([0.1, -0.05, 0.2, 0.3, -0.2, 0.15], np.float32)
    return np.asarray(se3.se3_exp(jnp.asarray(w)), np.float64)


def test_rigid_correction_reaches_every_frame(tracked):
    slam = tracked
    refs_flat = []
    for T, u in zip(slam.poses_cw, slam.frame_refs):
        n = np.asarray(T).shape[0] if np.asarray(T).ndim == 3 else 1
        refs_flat.extend([u] * n)
    base = slam.corrected_poses_np()
    raw = slam.poses_np()
    assert len(base) == len(raw) == len(refs_flat)
    # uncorrected map: replay differs from raw only through local-BA motion
    # of the keyframes; both must be finite well-formed SE3
    for T in base:
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-6)

    D = _delta()
    m = slam.map
    m.arrays = m.arrays._replace(
        kf_pose=m.arrays.kf_pose @ jnp.asarray(D, jnp.float32)
    )
    m.version += 1
    corr = slam.corrected_poses_np()
    moved = 0
    for i, (u, Tb, Tc) in enumerate(zip(refs_flat, base, corr)):
        if u < 0:
            np.testing.assert_allclose(Tc, raw[i], atol=1e-5)
        else:
            np.testing.assert_allclose(Tc, Tb @ D, atol=2e-4)
            moved += 1
    assert moved >= len(base) - 3   # only the pre-init frames are exempt


def test_culled_reference_resolves_through_spanning_tree(tracked):
    slam = tracked
    m = slam.map
    before = slam.corrected_poses_np()
    # cull the tracker's own reference keyframe: the tail frames are
    # guaranteed to be anchored to it, so the replay must walk the
    # recorded cull chain
    s = slam.ref_kf
    assert m.kf_parent[s] >= 0 and int(m.slot_uid[s]) in set(slam.frame_refs)
    uid = int(m.slot_uid[s])
    m._remove_keyframe(s)
    m.version += 1
    assert uid in m.uid_cull
    after = slam.corrected_poses_np()
    # Tcp chains through the parent's current pose: the export is unchanged
    for Tb, Ta in zip(before, after):
        np.testing.assert_allclose(Ta, Tb, atol=2e-4)

    # slot compaction renumbers every slot; uid indirection keeps the
    # replay invariant
    lut = m.compact_keyframes()
    assert lut is not None
    slam.ref_kf = int(lut[slam.ref_kf]) if lut[slam.ref_kf] >= 0 else 0
    after2 = slam.corrected_poses_np()
    for Tb, Ta in zip(before, after2):
        np.testing.assert_allclose(Ta, Tb, atol=2e-4)


def test_save_trajectory_tum_uses_replay(tracked, tmp_path):
    from amos_slam_tpu.io import trajectory

    slam = tracked
    p = str(tmp_path / "traj.txt")
    slam.save_trajectory_tum(p)
    ts, poses = trajectory.load_tum(p)
    assert len(ts) == len(slam.timestamps)
    corr = slam.corrected_poses_np()
    # file stores Twc; compare positions
    want = np.stack([np.linalg.inv(T)[:3, 3] for T in corr])
    np.testing.assert_allclose(poses[:, :3, 3], want, atol=1e-5)
