"""New-landmark triangulation between keyframe pairs.

Replaces LocalMapping::CreateNewMapPoints (reference src/LocalMapping.cc:313:
epipolar-constrained ORB matching against the best covisible keyframes via
SearchForTriangulation, SVD triangulation, cheirality/reprojection/scale
checks). TPU-native: candidate matching is the usual masked Hamming matrix
with an *epipolar-distance mask* computed from the known relative pose
(the reference's ComputeF12 + CheckDistEpipolarLine, src/LocalMapping.cc:743);
triangulation is the batched DLT.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from ..geometry.triangulate import triangulate_dlt
from ..ops import hamming
from ..solvers.fundamental import epipolar_distance

_P = jax.lax.Precision.HIGHEST


class TriangulationResult(NamedTuple):
    points_w: jax.Array   # (N, 3) per new-KF keypoint slot
    match_j: jax.Array    # (N,) matched keypoint index in the other KF (-1)
    good: jax.Array       # (N,) bool passes all checks


def _fundamental_from_poses(K: jax.Array, T1: jax.Array, T2: jax.Array):
    """F12 such that x2^T F x1 = 0 for pixel coords (ComputeF12)."""
    T21 = T2 @ se3.inv_T(T1)
    R, t = T21[:3, :3], T21[:3, 3]
    E = se3.hat(t) @ R
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


@functools.partial(jax.jit, static_argnames=("max_dist",))
def triangulate_pair(
    cam: Camera,
    # new keyframe (1)
    xy1, desc1, valid1, unmatched1, angle1, T1,
    # neighbour keyframe (2)
    xy2, desc2, valid2, unmatched2, angle2, T2,
    min_parallax_cos: float = 0.9998,
    epi_th: float = 1.5,
    reproj_th2: float = 5.991,
    max_dist: int = 50,
) -> TriangulationResult:
    K = cam.K
    F12 = _fundamental_from_poses(K, T1, T2)

    d = hamming.hamming_matrix(desc1, desc2)
    ok = (valid1 & unmatched1)[:, None] & (valid2 & unmatched2)[None, :]
    # epipolar gate on every candidate pair: distance of xy2[j] to the
    # epipolar line of xy1[i] -- computed densely then masked.
    o1 = jnp.concatenate([xy1, jnp.ones((xy1.shape[0], 1))], -1)
    lines = jnp.einsum("ij,nj->ni", F12, o1, precision=_P)      # (N,3) in im2
    o2 = jnp.concatenate([xy2, jnp.ones((xy2.shape[0], 1))], -1)
    num = jnp.abs(jnp.einsum("ni,mi->nm", lines, o2, precision=_P))
    den = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)[:, None]
    epi_ok = num / jnp.maximum(den, 1e-9) < epi_th
    res = hamming.match(
        hamming.apply_mask(d, ok & epi_ok),
        max_dist=max_dist, nn_ratio=0.75, mutual=True,
        angle_q=angle1, angle_t=angle2,
    )

    j = jnp.maximum(res.idx, 0)
    P1 = K @ T1[:3]
    P2 = K @ T2[:3]
    X, _ = triangulate_dlt(P1, P2, xy1, xy2[j])

    # checks: cheirality both views, reprojection, parallax
    pc1 = se3.transform_points(T1, X)
    pc2 = se3.transform_points(T2, X)

    def reproj_err2(P, X, x):
        o = jnp.ones((X.shape[0], 1), X.dtype)
        y = jnp.einsum("ij,nj->ni", P, jnp.concatenate([X, o], -1), precision=_P)
        uv = y[:, :2] / jnp.maximum(y[:, 2:], 1e-9)
        return jnp.sum((uv - x) ** 2, axis=-1)

    e1 = reproj_err2(P1, X, xy1)
    e2 = reproj_err2(P2, X, xy2[j])
    c1 = se3.inv_T(T1)[:3, 3]
    c2 = se3.inv_T(T2)[:3, 3]
    r1 = X - c1
    r2 = X - c2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
    )
    good = (
        res.valid
        & (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05)
        & (e1 < reproj_th2) & (e2 < reproj_th2)
        & (cosp < min_parallax_cos)
        & jnp.isfinite(X).all(axis=-1)
    )
    return TriangulationResult(points_w=X, match_j=res.idx, good=good)
