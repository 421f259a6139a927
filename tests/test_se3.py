import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amos_slam_tpu.geometry import se3


def random_rotations(rng, n):
    """Uniform-ish random rotations via QR of Gaussians."""
    A = rng.standard_normal((n, 3, 3))
    Q, R = np.linalg.qr(A)
    # fix determinant to +1
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q.astype(np.float32)


def test_hat_vee_roundtrip(rng):
    phi = rng.standard_normal((16, 3)).astype(np.float32)
    out = se3.vee(se3.hat(jnp.asarray(phi)))
    np.testing.assert_allclose(out, phi, atol=1e-6)


def test_so3_exp_log_roundtrip(rng):
    phi = rng.standard_normal((64, 3)).astype(np.float32)
    # include tiny and largish angles
    phi[0] = 0.0
    phi[1] = [1e-7, 0, 0]
    phi[2] = [3.0, 0.4, -0.2]
    R = se3.so3_exp(jnp.asarray(phi))
    phi2 = se3.so3_log(R)
    R2 = se3.so3_exp(phi2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_so3_exp_matches_rodrigues(rng):
    phi = np.array([[0.3, -0.2, 0.5]], dtype=np.float32)
    theta = np.linalg.norm(phi)
    k = phi[0] / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=np.float32
    )
    R_np = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
    R = se3.so3_exp(jnp.asarray(phi))[0]
    np.testing.assert_allclose(np.asarray(R), R_np, atol=1e-6)


def test_so3_log_orthonormal_random(rng):
    R = random_rotations(rng, 32)
    phi = se3.so3_log(jnp.asarray(R))
    R2 = se3.so3_exp(phi)
    np.testing.assert_allclose(np.asarray(R2), R, atol=2e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.standard_normal((32, 6)).astype(np.float32) * 0.8
    xi[0] = 0.0
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=3e-5)


def test_se3_inverse_compose(rng):
    xi = rng.standard_normal((8, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    eye = se3.inv_T(T) @ T
    np.testing.assert_allclose(
        np.asarray(eye), np.tile(np.eye(4, dtype=np.float32), (8, 1, 1)), atol=1e-5
    )


def test_transform_points(rng):
    xi = rng.standard_normal((6,)).astype(np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    out = se3.transform_points(jnp.asarray(T), jnp.asarray(pts))
    expect = (T[:3, :3] @ pts.T).T + T[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = se3.rotmat_to_quat(jnp.asarray(R))
    R2 = se3.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    # canonical sign
    assert np.all(np.asarray(q)[:, 3] >= 0)


def test_quat_identity():
    q = se3.rotmat_to_quat(jnp.eye(3))
    np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-6)


def test_jit_and_vmap():
    xi = jnp.ones((4, 6)) * 0.1
    f = jax.jit(se3.se3_exp)
    T = f(xi)
    assert T.shape == (4, 4, 4)
    g = jax.vmap(se3.se3_log)
    assert g(T).shape == (4, 6)
