import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.geometry import se3
from amos_slam_tpu.geometry.camera import Camera
from amos_slam_tpu.solvers.local_ba import BAProblem, solve_local_ba


def build_problem(rng, K=8, M=256, O=256, n_fixed=2, noise_px=0.3,
                  pose_pert=0.02, point_pert=0.03, stereo_frac=0.5):
    cam = Camera.create(535.4, 539.2, 320.1, 247.6, bf=40.0)
    pts_gt = rng.uniform(-2.5, 2.5, (M, 3)).astype(np.float32)
    pts_gt[:, 2] = rng.uniform(2.0, 7.0, M)

    poses_gt = []
    for k in range(K):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.15 * k          # translate along x
        xi[4] = 0.02 * k          # slight yaw
        poses_gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    poses_gt = np.stack(poses_gt)

    obs_uv = np.zeros((K, O, 2), np.float32)
    obs_ur = np.full((K, O), -1.0, np.float32)
    obs_point = np.full((K, O), -1, np.int32)
    obs_valid = np.zeros((K, O), bool)
    for k in range(K):
        pc = (poses_gt[k, :3, :3] @ pts_gt.T).T + poses_gt[k, :3, 3]
        u = 535.4 * pc[:, 0] / pc[:, 2] + 320.1
        v = 539.2 * pc[:, 1] / pc[:, 2] + 247.6
        vis = (pc[:, 2] > 0.3) & (u > 10) & (u < 630) & (v > 10) & (v < 470)
        ids = np.where(vis)[0][:O]
        n = len(ids)
        obs_point[k, :n] = ids
        obs_uv[k, :n, 0] = u[ids] + rng.normal(0, noise_px, n)
        obs_uv[k, :n, 1] = v[ids] + rng.normal(0, noise_px, n)
        st = rng.uniform(size=n) < stereo_frac
        ur = u[ids] - 40.0 / pc[ids, 2] + rng.normal(0, noise_px, n)
        obs_ur[k, :n] = np.where(st, ur, -1.0)
        obs_valid[k, :n] = True

    # perturb free cameras and all points
    poses0 = poses_gt.copy()
    for k in range(n_fixed, K):
        dxi = rng.normal(0, pose_pert, 6).astype(np.float32)
        poses0[k] = np.asarray(se3.se3_exp(jnp.asarray(dxi))) @ poses_gt[k]
    pts0 = pts_gt + rng.normal(0, point_pert, (M, 3)).astype(np.float32)

    prob = BAProblem(
        kf_pose=jnp.asarray(poses0.astype(np.float32)),
        kf_free=jnp.asarray(np.arange(K) >= n_fixed),
        kf_valid=jnp.ones(K, bool),
        points=jnp.asarray(pts0),
        point_valid=jnp.ones(M, bool),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=jnp.ones((K, O), jnp.float32),
        obs_valid=jnp.asarray(obs_valid),
    )
    return cam, prob, poses_gt, pts_gt


def pose_err(T_est, T_gt):
    d = np.asarray(T_est) @ np.linalg.inv(T_gt)
    xi = np.asarray(se3.se3_log(jnp.asarray(d.astype(np.float32))))
    return np.linalg.norm(xi[:3]), np.linalg.norm(xi[3:])


def test_local_ba_converges(rng):
    cam, prob, poses_gt, pts_gt = build_problem(rng)
    res = jax.jit(lambda p: solve_local_ba(cam, p))(prob)
    # fixed cameras untouched
    np.testing.assert_allclose(
        np.asarray(res.kf_pose[:2]), np.asarray(prob.kf_pose[:2]), atol=1e-6
    )
    # free cameras recovered
    for k in range(2, 8):
        t_err, r_err = pose_err(res.kf_pose[k], poses_gt[k])
        assert t_err < 4e-3, (k, t_err)
        assert r_err < 2e-3, (k, r_err)
    # points recovered (only those actually observed >=2 times can improve)
    op = np.asarray(prob.obs_point)
    ov = np.asarray(prob.obs_valid)
    counts = np.bincount(op[ov].reshape(-1), minlength=pts_gt.shape[0])
    seen = counts >= 2
    perr = np.linalg.norm(np.asarray(res.points) - pts_gt, axis=1)
    perr0 = np.linalg.norm(np.asarray(prob.points) - pts_gt, axis=1)
    assert seen.sum() > 100
    # depth is the weak direction here (sigma_z ~ z^2/(f*B)*sigma_px ~ 1.3 cm
    # at z=5 m with a ~1 m baseline): expect CRLB-ish error, not zero.
    assert np.median(perr[seen]) < 0.02, np.median(perr[seen])
    assert np.median(perr[seen]) < 0.5 * np.median(perr0[seen])
    assert float(res.mean_chi2) < 3.0


def test_local_ba_with_outliers(rng):
    cam, prob, poses_gt, pts_gt = build_problem(rng, noise_px=0.3)
    # corrupt 10% of observations grossly
    uv = np.array(prob.obs_uv)
    valid = np.asarray(prob.obs_valid)
    n_out = 0
    for k in range(uv.shape[0]):
        ids = np.where(valid[k])[0]
        bad = ids[: len(ids) // 10]
        uv[k, bad] += 50.0
        n_out += len(bad)
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = solve_local_ba(cam, prob)
    for k in range(2, 8):
        t_err, r_err = pose_err(res.kf_pose[k], poses_gt[k])
        assert t_err < 8e-3, (k, t_err)
    # outliers classified out
    inl = np.asarray(res.obs_inlier)
    assert inl.sum() > 0.8 * (valid.sum() - n_out)


def test_local_ba_safe_on_empty():
    cam = Camera.create(500.0, 500.0, 320.0, 240.0, bf=40.0)
    K, M, O = 4, 16, 8
    prob = BAProblem(
        kf_pose=jnp.broadcast_to(jnp.eye(4), (K, 4, 4)),
        kf_free=jnp.zeros(K, bool),
        kf_valid=jnp.zeros(K, bool),
        points=jnp.zeros((M, 3)),
        point_valid=jnp.zeros(M, bool),
        obs_point=jnp.full((K, O), -1, jnp.int32),
        obs_uv=jnp.zeros((K, O, 2)),
        obs_ur=jnp.full((K, O), -1.0),
        obs_inv_sigma2=jnp.ones((K, O)),
        obs_valid=jnp.zeros((K, O), bool),
    )
    res = solve_local_ba(cam, prob)
    assert bool(jnp.isfinite(res.kf_pose).all())
    assert bool(jnp.isfinite(res.points).all())
