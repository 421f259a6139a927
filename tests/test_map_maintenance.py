"""Keyframe culling, landmark fusion, and descriptor/normal refresh."""

import numpy as np
import jax.numpy as jnp
import pytest

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig
from amos_slam_tpu.system import System, TrackingState
from amos_slam_tpu.io import synthetic, evaluate


@pytest.fixture(scope="module")
def slam_run():
    cfg = SystemConfig(
        map=MapConfig(max_keyframes=32, max_points=8192),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=False,
    )
    planes = synthetic.default_room(seed=17)
    poses = synthetic.orbit_trajectory(36, radius=0.12, advance=0.3)
    slam = System(cfg)
    for i, T in enumerate(poses):
        g, d = synthetic.render(planes, T)
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    return slam, poses


def test_maintenance_keeps_tracking_accurate(slam_run):
    slam, poses = slam_run
    assert slam.state is TrackingState.OK
    est = np.asarray([np.asarray(T) for T in slam.poses_cw])
    gt = np.asarray(poses)
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est), evaluate.positions_from_cw(gt)
    )
    assert ate < 0.015, ate


def test_mirror_consistency_after_maintenance(slam_run):
    slam, _ = slam_run
    m = slam.map
    dev_obs = np.array(m.arrays.kf_obs[: m.n_kfs])
    np.testing.assert_array_equal(dev_obs, m.kf_obs_np[: m.n_kfs])
    # all recorded observations point at alive landmarks
    live = dev_obs[dev_obs >= 0]
    assert m.pt_alive[live].all()
    # fused/culled landmarks are gone from the device validity too
    dead = np.where(~m.pt_alive[: m.n_pts])[0]
    if len(dead):
        assert not np.array(m.arrays.pt_valid)[dead].any()


def test_refresh_landmarks_descriptor_vote(slam_run):
    slam, _ = slam_run
    m = slam.map
    # landmarks with >= 2 observations should carry one of their observed
    # descriptors (the median-Hamming vote picks an existing descriptor)
    obs = m.kf_obs_np[: m.n_kfs]
    ids, counts = np.unique(obs[obs >= 0], return_counts=True)
    multi = ids[counts >= 2][:20]
    desc_pt = np.array(m.arrays.pt_desc)
    desc_kf = np.array(m.arrays.kf_desc[: m.n_kfs])
    checked = 0
    for pid in multi:
        kfs, kps = np.where(obs == pid)
        cand = desc_kf[kfs, kps]
        if (cand.sum(axis=1) == 0).all():
            continue
        match = (cand == desc_pt[pid][None]).all(axis=1).any()
        assert match, pid
        checked += 1
    assert checked > 5


def test_global_refinement_recovers_perturbed_points(slam_run):
    import jax.numpy as jnp
    from amos_slam_tpu.loop.global_ba import run_global_refinement

    slam, poses = slam_run
    m = slam.map
    ids = np.where(m.pt_alive & (m.pt_obs_count >= 3))[0][:500]
    before = np.array(m.arrays.pt_pos)[ids]
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.05, before.shape).astype(np.float32)
    m.arrays = m.arrays._replace(
        pt_pos=m.arrays.pt_pos.at[jnp.asarray(ids.astype(np.int32))].set(
            jnp.asarray(before + noise)
        )
    )
    run_global_refinement(m, structure_iters=6)
    after = np.array(m.arrays.pt_pos)[ids]
    err_before = np.linalg.norm(noise, axis=1)
    err_after = np.linalg.norm(after - before, axis=1)
    # structure-only GN pulls perturbed landmarks back toward their multi-
    # view optimum. With only 3-5 short-baseline observations the depth
    # direction is weakly observable, so position recovery is partial;
    # the reprojection optimum itself (what BA minimizes) must be reached.
    assert np.median(err_after) < 0.6 * np.median(err_before), (
        np.median(err_after), np.median(err_before)
    )
    from amos_slam_tpu.loop.global_ba import harvest_observations
    from amos_slam_tpu.solvers.structure_only import refine_points
    kf_of, kp_of, cnt = harvest_observations(m, ids)
    a = m.arrays
    kf_j = jnp.asarray(kf_of.astype(np.int32))
    kp_j = jnp.asarray(kp_of.astype(np.int32))
    obs_valid = jnp.asarray(
        (np.arange(kf_of.shape[1])[None, :] < cnt[:, None]).astype(np.float32)
    )
    _, chi2 = refine_points(
        m.cam, a.pt_pos[jnp.asarray(ids.astype(np.int32))],
        a.pt_valid[jnp.asarray(ids.astype(np.int32))], a.kf_pose[kf_j],
        a.kf_xy[kf_j, kp_j], obs_valid, a.kf_inv_sigma2[kf_j, kp_j], iters=0,
    )
    assert float(jnp.median(chi2)) < 1.0  # at the reprojection optimum
