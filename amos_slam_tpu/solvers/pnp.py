"""Batched-hypothesis PnP under RANSAC.

Replaces the reference's EPnP-in-adaptive-RANSAC relocalization solver
(PnPsolver, src/PnPsolver.cc:120-366) and the cv::solvePnPRansac call in the
dynamic stage (src/Tracking.cc:1006: 500 iterations, P3P). TPU-native form:
every RANSAC hypothesis solves simultaneously --

  * minimal solver: 6-point DLT for [R|t] with known intrinsics, projected
    onto SE(3) by batched SVD (Procrustes). Same output contract as
    EPnP/P3P minimal samples (a candidate pose from few points); a 6-point
    sample needs more hypotheses for the same outlier rate, which costs
    nothing when all hypotheses are one batched einsum;
  * scoring: one (Hyp, N) reprojection pass;
  * refinement: the winner's inliers feed the robust GN of pose_opt (the
    reference's PnPsolver::Refine).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from .pose_opt import PoseObs, optimize_pose
from .robust import chol_solve_unrolled, inv3x3

_P = jax.lax.Precision.HIGHEST


def _smallest_eigvec(A: jax.Array, iters: int = 2) -> jax.Array:
    """Batched smallest-eigenvector of small SPD matrices by inverse
    iteration with the unrolled Cholesky solver.

    jnp.linalg.eigh on a (H, 12, 12) batch lowers to Jacobi sweeps on TPU
    (~10 ms for 512 matrices); the DLT only needs the near-null vector, and
    (A + eps I)^-1 amplifies the null component by ~lambda_2/(eps*tr) >~ 1e6
    per step -- two solves land at working precision. The matrix is
    factorized ONCE (the n^3/3-op part of the unrolled Cholesky) and only
    the n^2-op backsolve repeats per iteration: the factorization was ~60%
    of this whole solver's op count, and on TPU these tiny-batch unrolled
    kernels are op-count-bound, not FLOP-bound.
    """
    from .robust import chol_factor_unrolled, chol_backsolve_unrolled

    n = A.shape[-1]
    tr = jnp.einsum("...ii->...", A)
    Ad = A + (1e-9 * tr + 1e-12)[..., None, None] * jnp.eye(n, dtype=A.dtype)
    L = chol_factor_unrolled(Ad)
    x = jnp.ones(A.shape[:-1], A.dtype)
    for _ in range(iters):
        x = chol_backsolve_unrolled(L, x)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-30)
    return x


def _det3(A: jax.Array) -> jax.Array:
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def _polar_so3(M: jax.Array, iters: int = 8):
    """Batched polar decomposition M ~= R P, elementwise only (a batched
    3x3 SVD costs milliseconds on TPU). Determinant-scaled Newton iteration
    X <- (g X + (g X)^-T)/2 with g = |det X|^(-1/3), which converges for
    arbitrarily ill-conditioned hypotheses (plain Newton stalls when the
    singular values are spread, and a non-orthonormal 'R' is a free linear
    map that overfits RANSAC scoring with garbage poses). A final
    Gram-Schmidt guarantees R in SO(3) regardless. Returns
    (R, mean-singular-value)."""
    frob = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True))
    X = M / jnp.maximum(frob / jnp.sqrt(3.0), 1e-12)
    for _ in range(iters):
        g = 1.0 / jnp.cbrt(jnp.maximum(jnp.abs(_det3(X)), 1e-12))
        Xg = X * g[..., None, None]
        X = 0.5 * (Xg + jnp.swapaxes(inv3x3(Xg), -1, -2))
    # exact projection: orthonormalize columns, right-handed
    c0 = X[..., :, 0]
    c0 = c0 / jnp.maximum(jnp.linalg.norm(c0, axis=-1, keepdims=True), 1e-12)
    c1 = X[..., :, 1]
    c1 = c1 - jnp.sum(c1 * c0, axis=-1, keepdims=True) * c0
    c1 = c1 / jnp.maximum(jnp.linalg.norm(c1, axis=-1, keepdims=True), 1e-12)
    c2 = jnp.cross(c0, c1)
    R = jnp.stack([c0, c1, c2], axis=-1)
    P = jnp.einsum("...ji,...jk->...ik", R, M, precision=_P)  # R^T M (sym)
    scale = jnp.einsum("...ii->...", P) / 3.0
    return R, scale


def _dlt_pose(X: jax.Array, xn: jax.Array) -> jax.Array:
    """Batched 6+-point DLT: (H, S, 3) world pts, (H, S, 2) *normalized*
    image coords -> (H, 4, 4) Tcw with R projected onto SO(3).

    Solves for P = [R|t] up to scale from x ~ P X, then Procrustes-projects
    the leading 3x3 onto a rotation and rescales t accordingly.
    """
    Hn, S = X.shape[:2]
    zeros = jnp.zeros((Hn, S, 4), X.dtype)
    Xh = jnp.concatenate([X, jnp.ones((Hn, S, 1), X.dtype)], axis=-1)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    # rows: [X 0 -u X ; 0 X -v X]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)               # (H, 2S, 12)
    AtA = jnp.einsum("hni,hnj->hij", A, A, precision=_P)
    p = _smallest_eigvec(AtA).reshape(Hn, 3, 4)

    M = p[..., :3]
    # sign: points must be in front (positive depth for the sample centroid)
    Xc = jnp.mean(X, axis=1)
    z = jnp.einsum("hj,hj->h", M[:, 2, :], Xc, precision=_P) + p[:, 2, 3]
    sgn = jnp.where(z < 0, -1.0, 1.0)
    M = M * sgn[:, None, None]
    t = p[..., 3] * sgn[:, None]

    R, scale = _polar_so3(M)
    t = t / jnp.maximum(scale, 1e-9)[:, None]
    return se3.make_T(R, t)


class PnPResult(NamedTuple):
    Tcw: jax.Array
    inliers: jax.Array
    num_inliers: jax.Array
    ok: jax.Array          # () bool: enough inliers to trust


def ransac_pnp(
    cam: Camera,
    points_w: jax.Array,     # (N, 3)
    uv: jax.Array,           # (N, 2) pixel observations
    valid: jax.Array,        # (N,)
    key: jax.Array,
    n_hyp: int = 512,
    sample: int = 6,
    inlier_th_px: float = 2.0,
    min_inliers: int = 12,
    refine: bool = True,
) -> PnPResult:
    N = points_w.shape[0]
    xn = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], axis=-1
    )
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, sample), p=probs)
    T_h = _dlt_pose(points_w[idx], xn[idx])             # (H,4,4)

    # score all hypotheses against all points
    pc = jnp.einsum("hij,nj->hni", T_h[:, :3, :3], points_w, precision=_P) \
        + T_h[:, None, :3, 3]
    z = pc[..., 2]
    u = cam.fx * pc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy
    err = jnp.sqrt((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2)
    inl = (err < inlier_th_px) & (z > 0.05) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    Tcw = T_h[best]
    inliers = inl[best]

    if refine:
        obs = PoseObs(
            points_w=points_w,
            uv=uv,
            u_right=jnp.full((N,), -1.0),
            inv_sigma2=jnp.ones((N,)),
            valid=inliers,
        )
        opt = optimize_pose(Tcw, cam, obs, rounds=2, iters_per_round=4,
                            unroll=True)
        # re-classify against the refined pose
        pc1 = se3.transform_points(opt.Tcw, points_w)
        z1 = pc1[..., 2]
        u1 = cam.fx * pc1[..., 0] / jnp.maximum(z1, 1e-6) + cam.cx
        v1 = cam.fy * pc1[..., 1] / jnp.maximum(z1, 1e-6) + cam.cy
        e1 = jnp.sqrt((u1 - uv[:, 0]) ** 2 + (v1 - uv[:, 1]) ** 2)
        inl1 = (e1 < inlier_th_px) & (z1 > 0.05) & valid
        better = jnp.sum(inl1) >= jnp.sum(inliers)
        Tcw = jnp.where(better, opt.Tcw, Tcw)
        inliers = jnp.where(better, inl1, inliers)

    n = jnp.sum(inliers)
    return PnPResult(
        Tcw=Tcw, inliers=inliers, num_inliers=n, ok=n >= min_inliers
    )
