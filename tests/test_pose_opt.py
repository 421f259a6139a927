import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.geometry import se3
from amos_slam_tpu.geometry.camera import Camera, project
from amos_slam_tpu.solvers.pose_opt import PoseObs, optimize_pose


def make_problem(rng, n=256, n_outliers=40, noise=0.5, stereo_frac=0.5, pad=64):
    cam = Camera.create(535.4, 539.2, 320.1, 247.6, bf=40.0)
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 6.0, n)
    xi_true = np.array([0.1, -0.05, 0.2, 0.04, -0.03, 0.05], dtype=np.float32)
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi_true)))
    pc = (T_true[:3, :3] @ pts.T).T + T_true[:3, 3]
    uv = np.stack(
        [535.4 * pc[:, 0] / pc[:, 2] + 320.1, 539.2 * pc[:, 1] / pc[:, 2] + 247.6],
        axis=-1,
    )
    uv += rng.normal(0, noise, uv.shape)
    ur = uv[:, 0] - 40.0 / pc[:, 2] + rng.normal(0, noise, n)
    is_stereo = rng.uniform(size=n) < stereo_frac
    ur = np.where(is_stereo, ur, -1.0)
    # inject gross outliers
    out_idx = rng.choice(n, n_outliers, replace=False)
    uv[out_idx] += rng.uniform(20, 80, (n_outliers, 2)) * np.sign(
        rng.normal(size=(n_outliers, 2))
    )
    # padding
    total = n + pad
    obs = PoseObs(
        points_w=jnp.asarray(
            np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        ),
        uv=jnp.asarray(np.concatenate([uv.astype(np.float32), np.zeros((pad, 2), np.float32)])),
        u_right=jnp.asarray(np.concatenate([ur.astype(np.float32), -np.ones(pad, np.float32)])),
        inv_sigma2=jnp.ones(total, jnp.float32),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])),
    )
    return cam, obs, T_true, xi_true, out_idx


def pose_error(T_est, T_true):
    dT = np.asarray(T_est) @ np.linalg.inv(T_true)
    dxi = np.asarray(se3.se3_log(jnp.asarray(dT.astype(np.float32))))
    return np.linalg.norm(dxi[:3]), np.linalg.norm(dxi[3:])


def test_pose_opt_converges_from_perturbed_init(rng):
    cam, obs, T_true, xi_true, out_idx = make_problem(rng)
    xi0 = xi_true + np.array([0.05, -0.03, 0.04, 0.02, 0.01, -0.02], np.float32)
    T0 = se3.se3_exp(jnp.asarray(xi0))
    res = jax.jit(lambda t, o: optimize_pose(t, cam, o))(T0, obs)
    t_err, r_err = pose_error(res.Tcw, T_true)
    assert t_err < 5e-3, t_err
    assert r_err < 2e-3, r_err
    # inliers found, most outliers rejected
    inl = np.asarray(res.inlier)
    assert res.num_inliers > 150
    assert inl[out_idx].sum() <= 5
    # padding never counts as inlier
    assert not inl[256:].any()


def test_pose_opt_from_identity_large_motion(rng):
    cam, obs, T_true, _, _ = make_problem(rng, n_outliers=20)
    res = optimize_pose(jnp.eye(4), cam, obs)
    t_err, r_err = pose_error(res.Tcw, T_true)
    assert t_err < 1e-2 and r_err < 5e-3, (t_err, r_err)


def test_pose_opt_vmap_batch(rng):
    cam, obs, T_true, xi_true, _ = make_problem(rng, n=128, n_outliers=10, pad=0)
    batch_obs = jax.tree.map(lambda x: jnp.stack([x, x, x]), obs)
    T0 = jnp.stack([jnp.eye(4)] * 3)
    res = jax.vmap(lambda t, o: optimize_pose(t, cam, o))(T0, batch_obs)
    assert res.Tcw.shape == (3, 4, 4)
    for i in range(3):
        t_err, r_err = pose_error(res.Tcw[i], T_true)
        assert t_err < 1e-2 and r_err < 5e-3


def test_pose_opt_all_padding_is_safe():
    cam = Camera.create(500.0, 500.0, 320.0, 240.0, bf=40.0)
    n = 32
    obs = PoseObs(
        points_w=jnp.zeros((n, 3)),
        uv=jnp.zeros((n, 2)),
        u_right=-jnp.ones(n),
        inv_sigma2=jnp.ones(n),
        valid=jnp.zeros(n, bool),
    )
    res = optimize_pose(jnp.eye(4), cam, obs)
    assert bool(jnp.isfinite(res.Tcw).all())
    assert int(res.num_inliers) == 0
