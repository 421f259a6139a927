import numpy as np
import jax.numpy as jnp

from amos_slam_tpu.geometry import se3
from amos_slam_tpu.geometry.sim3 import Sim3, sim3_exp, sim3_log
from amos_slam_tpu.geometry import camera as cam_mod
from amos_slam_tpu.geometry.triangulate import triangulate_dlt, projection_matrix


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.standard_normal((16, 7)).astype(np.float32) * 0.5
    xi[0] = 0.0
    g = sim3_exp(jnp.asarray(xi))
    xi2 = sim3_log(g)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)


def test_sim3_compose_inverse(rng):
    xi = rng.standard_normal((8, 7)).astype(np.float32) * 0.5
    g = sim3_exp(jnp.asarray(xi))
    e = g.compose(g.inverse())
    np.testing.assert_allclose(np.asarray(e.s), np.ones(8), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e.t), np.zeros((8, 3)), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(e.R), np.tile(np.eye(3, dtype=np.float32), (8, 1, 1)), atol=1e-5
    )


def test_sim3_apply_scale():
    g = Sim3(R=jnp.eye(3), t=jnp.array([1.0, 0, 0]), s=jnp.asarray(2.0))
    pts = jnp.array([[1.0, 1.0, 1.0]])
    out = g.apply(pts)
    np.testing.assert_allclose(np.asarray(out), [[3.0, 2.0, 2.0]], atol=1e-6)


def _tum_cam():
    # TUM3.yaml intrinsics (reference Examples/RGB-D/TUM3.yaml)
    return cam_mod.Camera.create(535.4, 539.2, 320.1, 247.6, bf=40.0)


def test_project_backproject_roundtrip(rng):
    cam = _tum_cam()
    pts = rng.uniform(0.5, 5.0, (100, 3)).astype(np.float32)
    pts[:, 0] = (rng.uniform(0, 640, 100) - 320.1) / 535.4 * pts[:, 2]
    pts[:, 1] = (rng.uniform(0, 480, 100) - 247.6) / 539.2 * pts[:, 2]
    uv, z = cam_mod.project(cam, jnp.asarray(pts))
    back = cam_mod.backproject(cam, uv, z)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)


def test_undistort_roundtrip(rng):
    cam = cam_mod.Camera.create(
        517.3, 516.5, 318.6, 255.3,
        dist=[0.2624, -0.9531, -0.0054, 0.0026, 1.1633],  # TUM1-like coefficients
    )
    # Take undistorted normalized points, distort them, then check the
    # iterative undistortion recovers the originals.
    xy = rng.uniform(-0.3, 0.3, (50, 2)).astype(np.float32)
    xyd = cam_mod.distort_normalized(cam, jnp.asarray(xy))
    uv_raw = np.stack(
        [np.asarray(xyd)[:, 0] * 517.3 + 318.6, np.asarray(xyd)[:, 1] * 516.5 + 255.3],
        axis=-1,
    )
    uv_un = cam_mod.undistort_points(cam, jnp.asarray(uv_raw), iters=10)
    expect = np.stack([xy[:, 0] * 517.3 + 318.6, xy[:, 1] * 516.5 + 255.3], axis=-1)
    np.testing.assert_allclose(np.asarray(uv_un), expect, atol=0.05)


def test_triangulate_exact(rng):
    cam = _tum_cam()
    pts_w = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts_w[:, 2] += 4.0
    T1 = np.asarray(se3.se3_exp(jnp.zeros(6)))
    T2 = np.asarray(se3.se3_exp(jnp.asarray([0.3, 0.02, 0.01, 0.01, 0.05, 0.0], dtype=np.float32)))
    K = np.asarray(cam.K)
    P1 = projection_matrix(jnp.asarray(K), jnp.asarray(T1))
    P2 = projection_matrix(jnp.asarray(K), jnp.asarray(T2))
    x1, _ = cam_mod.project(cam, se3.transform_points(jnp.asarray(T1), jnp.asarray(pts_w)))
    x2, _ = cam_mod.project(cam, se3.transform_points(jnp.asarray(T2), jnp.asarray(pts_w)))
    X, res = triangulate_dlt(P1, P2, x1, x2)
    np.testing.assert_allclose(np.asarray(X), pts_w, atol=5e-2)
