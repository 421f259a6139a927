"""Batched two-view triangulation.

Replaces the reference's per-point SVD triangulation
(Initializer::Triangulate, src/Initializer.cc:1461; and the inline SVD in
LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:313). Here the DLT
system is solved for an entire padded batch of correspondences at once; the
4x4 symmetric eigenproblem maps to batched linalg on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve batched symmetric 3x3 systems by the adjugate (elementwise
    only -- lax.linalg lowers to slow loops for tiny batched systems)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def triangulate_dlt(P1: jax.Array, P2: jax.Array, x1: jax.Array, x2: jax.Array):
    """Linear (DLT) triangulation.

    Args:
      P1, P2: (...,3,4) projection matrices (K [R|t]).
      x1, x2: (...,N,2) pixel observations in each view.

    Returns:
      (...,N,3) world points, and (...,N) a residual quality score
      (smallest singular value of the DLT system; lower = better
      conditioned solution).
    """
    # Rows of A: x*P[2]-P[0], y*P[2]-P[1] for each view -> (...,N,4,4)
    def two_rows(P, x):
        P = P[..., None, :, :]  # broadcast over N
        r0 = x[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r1 = x[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = two_rows(P1, x1)
    a2, a3 = two_rows(P2, x2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (...,N,4,4)

    # Inhomogeneous DLT: scene points are finite (w=1), so instead of the
    # 4x4 null-vector eigenproblem (jnp.linalg.eigh lowers to Jacobi sweeps
    # -- ~30 ms for 4096 batched 4x4s on v5e, measured) solve the 3-unknown
    # least squares A[:, :3] X = -A[:, 3] by 3x3 normal equations, which is
    # pure elementwise math. Points at infinity (w ~ 0) would be the only
    # loss, and those fail the parallax gate downstream regardless.
    # HIGHEST precision: on TPU the default bf16 matmul loses ~3 decimal
    # digits, which is fatal for DLT conditioning (pixel coords ~1e2-1e3).
    # Rows are normalized so the residual is comparable across points.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    Am = A[..., :3]
    b = -A[..., 3]
    AtA = jnp.einsum(
        "...ki,...kj->...ij", Am, Am, precision=jax.lax.Precision.HIGHEST
    )
    Atb = jnp.einsum(
        "...ki,...k->...i", Am, b, precision=jax.lax.Precision.HIGHEST
    )
    tr = jnp.einsum("...ii->...", AtA)
    ridge = (1e-7 * tr + 1e-12)[..., None, None] * jnp.eye(3, dtype=A.dtype)
    Xw = _solve3x3(AtA + ridge, Atb)
    # residual quality score: ||A [X;1]||^2 (lower = better conditioned)
    r = (
        jnp.einsum("...ki,...i->...k", Am, Xw, precision=jax.lax.Precision.HIGHEST)
        - b
    )
    w0 = jnp.sum(r * r, axis=-1)
    return Xw, w0


def projection_matrix(K: jax.Array, Tcw: jax.Array) -> jax.Array:
    """K (...,3,3) and Tcw (...,4,4) -> P (...,3,4)."""
    return K @ Tcw[..., :3, :4]
