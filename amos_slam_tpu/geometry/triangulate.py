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

    # Null vector of A = eigvector of A^T A with smallest eigenvalue.
    # HIGHEST precision: on TPU the default bf16 matmul loses ~3 decimal
    # digits, which is fatal for DLT conditioning (pixel coords ~1e2-1e3).
    AtA = jnp.einsum(
        "...ki,...kj->...ij", A, A, precision=jax.lax.Precision.HIGHEST
    )
    w, V = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = V[..., :, 0]
    Xw = X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) < 1e-12, 1e-12, X[..., 3:])
    return Xw, w[..., 0]


def projection_matrix(K: jax.Array, Tcw: jax.Array) -> jax.Array:
    """K (...,3,3) and Tcw (...,4,4) -> P (...,3,4)."""
    return K @ Tcw[..., :3, :4]
