"""SO(3)/SE(3) Lie-group operations, batched and jit-friendly.

This is the nucleus of the g2o replacement (reference:
Thirdparty/g2o/g2o/types/se3quat.h, types_six_dof_expmap.h:59-174). Instead of
a hypergraph of pointer-linked vertices, poses here are plain arrays:

* rotation: 3x3 matrices (row-major, float32/float64)
* rigid transforms: 4x4 homogeneous matrices, camera convention T_cw
  (world->camera) exactly like the reference's ``Frame::mTcw``
* tangent vectors: ``[rho(3), phi(3)]`` translation-first, matching g2o's
  SE3Quat::exp ordering so published unit-test values carry over.

Every function broadcasts over arbitrary leading batch dimensions, making it
trivially ``vmap``-able and MXU-friendly (compose = batched 4x4 matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_P = jax.lax.Precision.HIGHEST  # tiny-matrix geometry must not drop to bf16 on TPU


# ---------------------------------------------------------------------------
# so(3)
# ---------------------------------------------------------------------------

def hat(phi: jax.Array) -> jax.Array:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric matrices."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(omega: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (...,3,3) -> (...,3)."""
    return jnp.stack(
        [omega[..., 2, 1], omega[..., 0, 2], omega[..., 1, 0]], axis=-1
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues' formula, (...,3) -> (...,3,3).

    Uses series expansions near theta=0 so it is safe under jit/grad.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle series fallbacks.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """Log map, (...,3,3) -> (...,3), robust over the full angle range.

    Goes through the quaternion representation: with q = (qv, qw), qw >= 0,
    theta = 2*atan2(|qv|, qw) and phi = theta * qv/|qv|. This is accurate even
    near theta = pi, where trace-based formulas lose the axis.
    """
    q = rotmat_to_quat(R)
    qv = q[..., :3]
    qw = q[..., 3]
    nv = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(nv, qw)
    small = nv < 1e-8
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(qw, _EPS),
        theta / jnp.where(small, 1.0, nv),
    )
    return qv * scale[..., None]


def _so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3), used by se3 exp (V matrix)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * (K @ K)


def _so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    half = theta * 0.5
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half) + _EPS)) / (theta2 + _EPS))
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot[..., None, None] * (K @ K)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi: jax.Array) -> jax.Array:
    """Exp map, (...,6) [rho, phi] -> (...,4,4) homogeneous transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho, precision=_P)
    return make_T(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """Log map, (...,4,4) -> (...,6) [rho, phi]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    phi = so3_log(R)
    Vinv = _so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t, precision=_P)
    return jnp.concatenate([rho, phi], axis=-1)


def make_T(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (...,4,4) from (...,3,3) and (...,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def inv_T(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform (...,4,4), exploiting orthogonality."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_P))


def orthonormalize(T: jax.Array) -> jax.Array:
    """Project the rotation block of (...,4,4) back onto SO(3).

    Quaternion roundtrip projection. Pose chains (velocity composition,
    iterative left-multiplied updates) amplify any non-orthonormality
    *exponentially* -- transpose-based inverses stop being inverses -- so
    every solver entry point cleans its input pose. Float32 makes this
    mandatory, not cosmetic.
    """
    R = quat_to_rotmat(rotmat_to_quat(T[..., :3, :3]))
    return make_T(R, T[..., :3, 3])


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (...,4,4) to points (...,N,3) -> (...,N,3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision=_P) + t[..., None, :]


# ---------------------------------------------------------------------------
# Quaternions (TUM trajectory convention: qx qy qz qw, Hamilton)
# ---------------------------------------------------------------------------

def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,4) as (qx, qy, qz, qw), qw >= 0.

    Branch-free Shepperd's method (all four candidates, pick the best) so it
    is jit/vmap safe. Matches the output convention of the reference's
    trajectory writer (src/System.cc:429 via Converter::toQuaternion).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_i^2 values
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe(x):
        return jnp.sqrt(jnp.clip(x, _EPS, None)) * 0.5

    # candidate quats (x, y, z, w), each assuming its component is largest
    cw = jnp.stack(
        [(m21 - m12), (m02 - m20), (m10 - m01), qw2], axis=-1
    ) / (4.0 * _safe(qw2))[..., None]
    cx = jnp.stack(
        [qx2, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * _safe(qx2))[..., None]
    cy = jnp.stack(
        [(m01 + m10), qy2, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * _safe(qy2))[..., None]
    cz = jnp.stack(
        [(m02 + m20), (m12 + m21), qz2, (m10 - m01)], axis=-1
    ) / (4.0 * _safe(qz2))[..., None]

    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # (...,4,4)
    scores = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(
        cands, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: qw >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(...,4) (qx,qy,qz,qw) -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
