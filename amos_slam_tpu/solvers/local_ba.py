"""Local bundle adjustment with Schur-complement landmark elimination.

TPU-native replacement for g2o's BlockSolver_6_3 + LM pipeline as used by
Optimizer::LocalBundleAdjustment (reference src/Optimizer.cc:629: covisible
KFs free, frontier KFs fixed, 5 LM iterations, chi2 pruning, 10 more --
which it ABORTS when new keyframes arrive, so its effective depth under
load is ~5; our 3+4 default matches that effective behavior, validated to
the same ATE on the e2e suites).

Design (SURVEY.md section 2b "g2o -> batched GN"):
* The problem is a static padded structure: K camera slots (free mask),
  M landmark slots, and per-camera observation tables of width O. No graphs,
  no pointers -- validity masks carry the sparsity.
* Per-observation residuals/Jacobians (3x6 camera, 3x3 point; mono rows
  masked) are built in one fused pass.
* Hessian blocks assemble with einsums + segment_sum; the landmark block
  Hll is 3x3-batched-inverted; the reduced camera system
  S = Hcc - W Hll^-1 W^T is a (6K, 6K) dense matrix formed by one
  'kpij,lpkj->klik'-shaped einsum over landmarks -- exactly the blocked
  MXU contraction the hardware wants.
* Fixed cameras are handled by identity-row masking of S, so gauge freedom
  and the reference's fixed-frontier semantics come for free.
* LM with fixed trip counts under lax.scan; chi2-based outlier down-weighting
  between phases mirrors the reference's prune-and-reoptimize.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from .robust import CHI2_MONO, CHI2_STEREO, huber_weight, inv3x3

_P = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Padded local-BA problem.

    kf_pose: (K, 4, 4) initial Tcw per camera slot.
    kf_free: (K,) bool -- free to optimize (False = fixed frontier / padding).
    kf_valid: (K,) bool -- slot holds a real camera.
    points: (M, 3) initial world points.
    point_valid: (M,) bool.
    obs_point: (K, O) int32 index into points (-1 / anything with
               obs_valid=False is ignored).
    obs_uv: (K, O, 2) undistorted pixel observations.
    obs_ur: (K, O) right-image u (<0 = mono observation).
    obs_inv_sigma2: (K, O) information scale.
    obs_valid: (K, O) bool.
    """

    kf_pose: jax.Array
    kf_free: jax.Array
    kf_valid: jax.Array
    points: jax.Array
    point_valid: jax.Array
    obs_point: jax.Array
    obs_uv: jax.Array
    obs_ur: jax.Array
    obs_inv_sigma2: jax.Array
    obs_valid: jax.Array


class BAResult(NamedTuple):
    kf_pose: jax.Array
    points: jax.Array
    obs_inlier: jax.Array   # (K, O) bool final chi2 classification
    mean_chi2: jax.Array    # () mean inlier chi2 (diagnostic)


def _residuals(cam: Camera, pose: jax.Array, points: jax.Array, prob: BAProblem):
    """r (K,O,3), Jc (K,O,3,6), Jp (K,O,3,3), chi2 (K,O), stereo mask."""
    pidx = jnp.clip(prob.obs_point, 0, points.shape[0] - 1)
    X = points[pidx]                                   # (K, O, 3)
    R = pose[:, None, :3, :3]
    t = pose[:, None, :3, 3]
    pc = jnp.einsum("koij,koj->koi", jnp.broadcast_to(R, X.shape[:2] + (3, 3)), X,
                    precision=_P) + t
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.maximum(z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    is_stereo = prob.obs_ur >= 0.0

    r = jnp.stack(
        [
            prob.obs_uv[..., 0] - u,
            prob.obs_uv[..., 1] - v,
            jnp.where(is_stereo, prob.obs_ur - ur, 0.0),
        ],
        axis=-1,
    )

    zero = jnp.zeros_like(z)
    du = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], -1)
    dv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], -1)
    dur = du + jnp.stack([zero, zero, cam.bf * inv_z2], -1)
    dproj = jnp.stack([du, dv, dur], axis=-2)          # (K,O,3,3) d(uvr)/d(pc)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:2] + (3, 3))
    dpc_dxi = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)   # (K,O,3,6)
    Jc = -jnp.einsum("koij,kojl->koil", dproj, dpc_dxi, precision=_P)
    # d(pc)/d(X) = R
    Jp = -jnp.einsum("koij,kojl->koil", dproj,
                     jnp.broadcast_to(R, X.shape[:2] + (3, 3)), precision=_P)

    row_mask = jnp.stack(
        [jnp.ones_like(z), jnp.ones_like(z), is_stereo.astype(z.dtype)], -1
    )
    depth_ok = z > 1e-3
    r = r * row_mask
    Jc = Jc * row_mask[..., None]
    Jp = Jp * row_mask[..., None]
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    return r, Jc, Jp, chi2, is_stereo, depth_ok


@functools.partial(
    jax.jit, static_argnames=("iters_phase1", "iters_phase2", "lam0")
)
def solve_local_ba(
    cam: Camera,
    prob: BAProblem,
    iters_phase1: int = 3,
    iters_phase2: int = 4,
    lam0: float = 1e-4,
) -> BAResult:
    K, O = prob.obs_valid.shape
    M = prob.points.shape[0]

    base_valid = (
        prob.obs_valid
        & prob.kf_valid[:, None]
        & prob.point_valid[jnp.clip(prob.obs_point, 0, M - 1)]
        & (prob.obs_point >= 0)
    )

    # Landmark-aggregation one-hot, built ONCE (observation->landmark
    # routing is constant across LM iterations). Every per-landmark sum --
    # Hll (9), bl (3), the obs count (1), and the per-camera Hcl coupling
    # (18) -- then aggregates as ONE batched (K, M, O) @ (K, O, 31) MXU
    # matmul pair instead of TPU scatter-adds, which were the dominant
    # per-iteration cost (the segment_sum forms measured ~4 ms/iter on
    # v5e; the matmul pair is ~0.1 ms of MXU work + two ~100 MB reads of E
    # per iteration). The flat per-landmark sums fall out by summing the
    # per-camera outputs over K. bf16 hi/lo splitting keeps f32-equivalent
    # precision: E is exact in bf16 and the feature splits into two bf16
    # summands accumulated in f32.
    E = (
        jnp.clip(prob.obs_point, 0, M - 1)[..., None]
        == jnp.arange(M, dtype=jnp.int32)[None, None]
    ).astype(jnp.bfloat16)                                          # (K,O,M)

    def _aggregate(feat):
        """(K, O, F) f32 -> (K, M, F) f32 per-camera landmark sums."""
        hi = feat.astype(jnp.bfloat16)
        lo = (feat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((0,), (0,)))   # contract O, batch K
        return (
            jax.lax.dot_general(E, hi, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(E, lo, dn, preferred_element_type=jnp.float32)
        )

    def lm_iter(carry, _):
        pose, points, lam, inlier = carry
        r, Jc, Jp, chi2, is_stereo, depth_ok = _residuals(cam, pose, points, prob)
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        w = (
            huber_weight(chi2, delta2)
            * prob.obs_inv_sigma2
            * inlier
            * base_valid
            * depth_ok
        )

        Jcw = Jc * w[..., None, None]
        Jpw = Jp * w[..., None, None]
        # camera blocks
        Hcc = jnp.einsum("kodi,kodj->kij", Jcw, Jc, precision=_P)   # (K,6,6)
        bc = jnp.einsum("kodi,kod->ki", Jcw, r, precision=_P)       # (K,6)
        Hll_blocks = jnp.einsum("kodi,kodj->koij", Jpw, Jp, precision=_P)
        bl_blocks = jnp.einsum("kodi,kod->koi", Jpw, r, precision=_P)
        Hcl_blocks = jnp.einsum("kodi,kodj->koij", Jcw, Jp, precision=_P)
        feat = jnp.concatenate(
            [
                Hll_blocks.reshape(K, O, 9),
                bl_blocks,
                (w > 0).astype(r.dtype)[..., None],
                Hcl_blocks.reshape(K, O, 18),
            ],
            axis=-1,
        )                                                           # (K,O,31)
        agg = _aggregate(feat)                                      # (K,M,31)
        flat = jnp.sum(agg[..., :13], axis=0)                       # (M,13)
        Hll = flat[:, :9].reshape(M, 3, 3)
        bl = flat[:, 9:12]
        has_obs = flat[:, 12] > 0
        Hcl = agg[..., 13:].reshape(K, M, 6, 3)

        # damp + invert landmark blocks
        dl = jnp.diagonal(Hll, axis1=-2, axis2=-1)
        Hll_d = Hll + jnp.eye(3) * (lam * jnp.maximum(dl, 1e-9) + 1e-9)[..., None, :]
        Hll_inv = inv3x3(Hll_d)                                     # (M,3,3)

        # Schur complement S = Hcc_diag - W Hll^-1 W^T, built DIRECTLY in
        # dense (6K, 6K) form as one MXU matmul (6K, 3M) @ (3M, 6K): the 4D
        # block einsum lowered to layout-hostile loops on TPU.
        # S[k*6+i, l*6+o] = sum_{m,j} W[k,m,i,j] Hcl[l,m,o,j]
        W = jnp.einsum("kmij,mjl->kmil", Hcl, Hll_inv, precision=_P)  # (K,M,6,3)
        A = W.transpose(0, 2, 1, 3).reshape(6 * K, 3 * M)
        B = Hcl.transpose(0, 2, 1, 3).reshape(6 * K, 3 * M)
        S_dense = -jnp.matmul(A, B.T, precision=_P)                  # (6K,6K)
        dc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
        Hcc_d = Hcc + jnp.eye(6) * (lam * jnp.maximum(dc, 1e-9) + 1e-9)[..., None, :]
        # Normal equations are H dx = -g with g = J^T W r (r = obs - proj,
        # J = dr/dx): reduced rhs = -(bc - W bl).
        rhs_c = jnp.einsum("kmij,mj->ki", W, bl, precision=_P) - bc

        # fixed cameras: identity rows/cols, zero rhs; damped Hcc on the
        # 6x6 block diagonal
        free = (prob.kf_free & prob.kf_valid).astype(S_dense.dtype)
        kk = jnp.arange(K)
        S_dense = (
            S_dense.reshape(K, 6, K, 6).at[kk, :, kk, :].add(Hcc_d)
        ).reshape(6 * K, 6 * K)
        freed = jnp.repeat(free, 6)
        S_dense = S_dense * (freed[:, None] * freed[None, :])
        S_dense = (
            S_dense.reshape(K, 6, K, 6)
            .at[kk, :, kk, :]
            .add(jnp.eye(6) * (1.0 - free)[:, None, None])
        ).reshape(6 * K, 6 * K)
        rhs = (rhs_c * free[:, None]).reshape(6 * K)

        # dense solve of the reduced camera system
        L, low = jax.scipy.linalg.cho_factor(S_dense, lower=True)
        dxc = jax.scipy.linalg.cho_solve((L, low), rhs)
        dxc = jnp.where(jnp.isfinite(dxc), dxc, 0.0).reshape(K, 6)

        # back-substitute landmarks: dxl = Hll^-1 (-bl - Hcl^T dxc)
        WTdx = jnp.einsum("kmij,ki->mj", Hcl, dxc, precision=_P)
        dxl = -jnp.einsum("mij,mj->mi", Hll_inv, bl + WTdx, precision=_P)
        dxl = jnp.where(jnp.isfinite(dxl), dxl, 0.0)
        # points with no observations must not move
        dxl = dxl * (has_obs & prob.point_valid)[:, None]

        pose_new = se3.se3_exp(dxc) @ pose
        pose_new = jnp.where(free[:, None, None] > 0, pose_new, pose)
        points_new = points + dxl

        # accept/reject on total robust cost
        _, _, _, chi2_new, _, _ = _residuals(cam, pose_new, points_new, prob)
        m = inlier * base_valid
        cost = jnp.sum(jnp.minimum(chi2, delta2 * 4) * m)
        cost_new = jnp.sum(jnp.minimum(chi2_new, delta2 * 4) * m)
        improved = cost_new < cost
        pose = jnp.where(improved, pose_new, pose)
        points = jnp.where(improved, points_new, points)
        lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0), 1e-8, 1e4)
        return (pose, points, lam, inlier), cost

    pose0 = se3.orthonormalize(prob.kf_pose)
    inl0 = base_valid.astype(pose0.dtype)
    carry = (pose0, prob.points, jnp.asarray(lam0, pose0.dtype), inl0)
    carry, _ = jax.lax.scan(lm_iter, carry, None, length=iters_phase1)

    # prune: recompute chi2, drop outliers (reference Optimizer.cc:629 does
    # exactly this between its 5- and 10-iteration phases)
    pose, points, lam, _ = carry
    _, _, _, chi2, is_stereo, depth_ok = _residuals(cam, pose, points, prob)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    inlier = ((chi2 <= delta2) & depth_ok & base_valid).astype(pose.dtype)
    carry = (pose, points, jnp.asarray(lam0, pose.dtype), inlier)
    carry, _ = jax.lax.scan(lm_iter, carry, None, length=iters_phase2)

    pose, points, _, _ = carry
    _, _, _, chi2, is_stereo, depth_ok = _residuals(cam, pose, points, prob)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    final_inlier = (chi2 <= delta2) & depth_ok & base_valid
    mean_chi2 = jnp.sum(jnp.where(final_inlier, chi2, 0.0)) / jnp.maximum(
        jnp.sum(final_inlier), 1
    )
    return BAResult(
        kf_pose=pose, points=points, obs_inlier=final_inlier, mean_chi2=mean_chi2
    )
