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

_P = jax.lax.Precision.HIGHEST


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
    _, V = jnp.linalg.eigh(AtA)
    p = V[..., :, 0].reshape(Hn, 3, 4)

    M = p[..., :3]
    # sign: points must be in front (positive depth for the sample centroid)
    Xc = jnp.mean(X, axis=1)
    z = jnp.einsum("hj,hj->h", M[:, 2, :], Xc, precision=_P) + p[:, 2, 3]
    sgn = jnp.where(z < 0, -1.0, 1.0)
    M = M * sgn[:, None, None]
    t = p[..., 3] * sgn[:, None]

    U, S_, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = U @ (D[..., :, None] * Vt)
    scale = jnp.sum(S_ * D, axis=-1) / 3.0              # mean singular value
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
        opt = optimize_pose(Tcw, cam, obs, rounds=2, iters_per_round=8)
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
