"""Batched Horn absolute-orientation Sim3/SE3 solver under RANSAC, plus
mutual-reprojection Sim3 refinement.

Replaces the reference's Sim3Solver (src/Sim3Solver.cc:199-547: Horn's
closed-form quaternion method on 3-point samples inside RANSAC, with mutual
reprojection checks) used by loop closing to estimate the loop-correcting
similarity, and Optimizer::OptimizeSim3 (src/Optimizer.cc:1364: g2o Sim3
vertex with mutual EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ reprojection
edges, Huber kernel, inlier re-classification between rounds). All hypotheses
solve at once: the 4x4 quaternion sum matrices eigendecompose as one batch;
the refinement is a fixed-trip GN over the 7-dim tangent with vmapped exact
Jacobians.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Camera
from ..geometry.se3 import quat_to_rotmat
from ..geometry.sim3 import Sim3, sim3_exp

_P = jax.lax.Precision.HIGHEST


def horn_sim3(p1: jax.Array, p2: jax.Array, fix_scale: bool = False) -> Sim3:
    """Closed-form alignment p2 ~ s R p1 + t over the last-but-one axis.

    p1, p2: (..., S, 3). Horn 1987 quaternion method: rotation from the
    dominant eigenvector of the 4x4 N matrix built from the cross-covariance
    (Sim3Solver::ComputeSim3, src/Sim3Solver.cc:318-450).
    """
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    M = jnp.einsum("...si,...sj->...ij", q1, q2, precision=_P)  # sum q1 q2^T

    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    w, V = jnp.linalg.eigh(N)
    q_wxyz = V[..., :, -1]                         # max eigenvalue
    q = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)  # xyzw
    R = quat_to_rotmat(q)

    if fix_scale:
        s = jnp.ones(R.shape[:-2], R.dtype)
    else:
        # symmetric scale (Horn): sqrt(sum|q2|^2 / sum|q1|^2)
        n1 = jnp.sum(q1 * q1, axis=(-2, -1))
        n2 = jnp.sum(q2 * q2, axis=(-2, -1))
        s = jnp.sqrt(n2 / jnp.maximum(n1, 1e-12))

    t = c2[..., 0, :] - s[..., None] * jnp.einsum(
        "...ij,...j->...i", R, c1[..., 0, :], precision=_P
    )
    return Sim3(R=R, t=t, s=s)


class Sim3RansacResult(NamedTuple):
    sim3: Sim3           # best p1 -> p2 alignment
    inliers: jax.Array   # (N,) bool
    num_inliers: jax.Array
    ok: jax.Array


@functools.partial(
    jax.jit, static_argnames=("n_hyp", "min_inliers", "fix_scale")
)
def ransac_sim3(
    p1: jax.Array,          # (N, 3) 3D points in frame 1
    p2: jax.Array,          # (N, 3) corresponding points in frame 2
    valid: jax.Array,
    key: jax.Array,
    n_hyp: int = 128,
    inlier_th=0.06,         # metres in 3D (RGB-D loop closing); traceable
    min_inliers: int = 12,
    fix_scale: bool = True,
) -> Sim3RansacResult:
    """3-point-sample Horn RANSAC; final refit on the winning inlier set.

    The reference checks mutual *reprojection* error (it lacks reliable
    depth for mono); with RGB-D both point sets are metric, so a 3D
    distance check is the natural equivalent and strictly stronger.
    """
    N = p1.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 3), p=probs)
    g = horn_sim3(p1[idx], p2[idx], fix_scale=fix_scale)

    pred = g.apply(jnp.broadcast_to(p1, (n_hyp,) + p1.shape))
    d = jnp.linalg.norm(pred - p2[None], axis=-1)
    inl = (d < inlier_th) & valid[None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    inliers = inl[best]

    # refit on inliers (masked weighted Horn: zero-weight outliers by
    # replacing them with the centroid so they do not bias the solution)
    w = inliers[:, None]
    n_in = jnp.maximum(jnp.sum(inliers), 1)
    c1 = jnp.sum(jnp.where(w, p1, 0.0), axis=0) / n_in
    c2 = jnp.sum(jnp.where(w, p2, 0.0), axis=0) / n_in
    p1f = jnp.where(w, p1, c1)
    p2f = jnp.where(w, p2, c2)
    g_fit = horn_sim3(p1f[None], p2f[None], fix_scale=fix_scale)
    g_fit = Sim3(R=g_fit.R[0], t=g_fit.t[0], s=g_fit.s[0])

    d_fit = jnp.linalg.norm(g_fit.apply(p1) - p2, axis=-1)
    inl_fit = (d_fit < inlier_th) & valid
    better = jnp.sum(inl_fit) >= jnp.sum(inliers)
    sel = lambda a, b: jnp.where(better, a, b)
    g_best = Sim3(
        R=sel(g_fit.R, g.R[best]),
        t=sel(g_fit.t, g.t[best]),
        s=sel(g_fit.s, g.s[best]),
    )
    inliers = jnp.where(better, inl_fit, inliers)
    n = jnp.sum(inliers)
    return Sim3RansacResult(
        sim3=g_best, inliers=inliers, num_inliers=n, ok=n >= min_inliers
    )


class Sim3OptResult(NamedTuple):
    sim3: Sim3
    inlier: jax.Array       # (N,) bool final chi2 classification
    num_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(
    cam: Camera,
    g0: Sim3,               # initial cam1 -> cam2 similarity
    p1c: jax.Array,         # (N, 3) points in camera-1 coords
    uv1: jax.Array,         # (N, 2) their pixel observations in image 1
    p2c: jax.Array,         # (N, 3) matched points in camera-2 coords
    uv2: jax.Array,         # (N, 2) their pixel observations in image 2
    valid: jax.Array,       # (N,)
    inv_sigma2_1: jax.Array,  # (N,) information scale of uv1 rows
    inv_sigma2_2: jax.Array,  # (N,) information scale of uv2 rows
    iters: int = 8,
    fix_scale: bool = False,
    chi2_th: float = 9.210,   # the reference's th2 = 10 on 2-dof residuals
) -> Sim3OptResult:
    """Refine a loop Sim3 by mutual reprojection (OptimizeSim3 contract,
    src/Optimizer.cc:1364): r2 = proj(g(p1c)) - uv2 and
    r1 = proj(g^-1(p2c)) - uv1, Huber-weighted GN on the 7-dim tangent with
    chi2-based down-weighting (the reference prunes between two 5-iteration
    phases; continuous IRLS + a final classification is the fixed-shape
    equivalent)."""

    def proj(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        return jnp.stack(
            [cam.fx * p[..., 0] / z + cam.cx, cam.fy * p[..., 1] / z + cam.cy],
            axis=-1,
        ), p[..., 2]

    def residuals(g: Sim3):
        q2, z2 = proj(g.apply(p1c))
        q1, z1 = proj(g.inverse().apply(p2c))
        r = jnp.concatenate([q1 - uv1, q2 - uv2], axis=-1)   # (N, 4)
        ok = valid & (z1 > 1e-3) & (z2 > 1e-3)
        return r, ok

    def gn_iter(carry, _):
        R, t, s = carry
        g = Sim3(R=R, t=t, s=s)

        def res_of(xi):
            gg = sim3_exp(xi).compose(g)
            r, _ = residuals(gg)
            return r

        r, ok = residuals(g)
        J = jax.jacfwd(res_of)(jnp.zeros(7))                  # (N, 4, 7)
        chi1 = jnp.sum(r[:, :2] ** 2, axis=-1) * inv_sigma2_1
        chi2 = jnp.sum(r[:, 2:] ** 2, axis=-1) * inv_sigma2_2
        # Huber IRLS weights per 2-dof residual block
        w1 = jnp.where(chi1 > chi2_th, jnp.sqrt(chi2_th / jnp.maximum(chi1, 1e-12)), 1.0)
        w2 = jnp.where(chi2 > chi2_th, jnp.sqrt(chi2_th / jnp.maximum(chi2, 1e-12)), 1.0)
        w = jnp.concatenate(
            [
                (w1 * inv_sigma2_1 * ok)[:, None].repeat(2, 1),
                (w2 * inv_sigma2_2 * ok)[:, None].repeat(2, 1),
            ],
            axis=-1,
        )                                                     # (N, 4)
        H = jnp.einsum("nd,ndi,ndj->ij", w, J, J, precision=_P)
        b = jnp.einsum("nd,ndi,nd->i", w, J, r, precision=_P)
        if fix_scale:
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        H = H + 1e-6 * jnp.trace(H) * jnp.eye(7) / 7.0
        dx = -jnp.linalg.solve(H, b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        gn = sim3_exp(dx).compose(g)
        return (gn.R, gn.t, gn.s), jnp.sum(w * r * r)

    carry = (g0.R, g0.t, g0.s)
    carry, _ = jax.lax.scan(gn_iter, carry, None, length=iters)
    g = Sim3(*carry)
    r, ok = residuals(g)
    chi1 = jnp.sum(r[:, :2] ** 2, axis=-1) * inv_sigma2_1
    chi2 = jnp.sum(r[:, 2:] ** 2, axis=-1) * inv_sigma2_2
    inlier = ok & (chi1 < chi2_th) & (chi2 < chi2_th)
    return Sim3OptResult(
        sim3=g, inlier=inlier, num_inliers=jnp.sum(inlier)
    )
