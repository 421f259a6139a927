"""Motion-only pose optimization (the tracking-time bundle adjustment).

TPU-native replacement for ``Optimizer::PoseOptimization``
(reference src/Optimizer.cc:363-627): a VertexSE3Expmap with mono
(EdgeSE3ProjectXYZOnlyPose) and stereo (EdgeStereoSE3ProjectXYZOnlyPose)
reprojection edges, optimized in 4 rounds of 10 LM iterations with chi2
outlier reclassification between rounds (thresholds 5.991 / 7.815, Huber).

Here the whole solve is one jitted program over static padded shapes:
- residuals/Jacobians for all N observations are built in parallel
  (analytic 2x6 / 3x6 blocks, no autodiff overhead in the hot path),
- the 6x6 normal equations are accumulated with a single einsum
  (MXU-friendly), and
- rounds/iterations are `lax.scan` with a fixed trip count; outlier
  reclassification becomes a mask update between scan phases.

Everything vmaps over a leading batch axis, which is how multi-stream SLAM
(SURVEY.md section 2d P7) scales across chips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from .robust import CHI2_MONO, CHI2_STEREO, huber_weight, solve_damped

_P = jax.lax.Precision.HIGHEST


class PoseObs(NamedTuple):
    """Padded observation set for one pose solve.

    points_w: (N,3) world points; uv: (N,2) undistorted pixel obs;
    u_right:  (N,) right-image u for stereo/RGB-D obs (<0 = mono obs);
    inv_sigma2: (N,) information scale (1/sigma^2 of the pyramid level,
                reference Frame::mvInvLevelSigma2);
    valid: (N,) bool mask for real (non-padding) observations.
    """

    points_w: jax.Array
    uv: jax.Array
    u_right: jax.Array
    inv_sigma2: jax.Array
    valid: jax.Array


class PoseOptResult(NamedTuple):
    Tcw: jax.Array        # (4,4) optimized pose
    inlier: jax.Array     # (N,) bool final inlier classification
    num_inliers: jax.Array  # () int32
    chi2: jax.Array       # (N,) final per-obs chi2 (0 where invalid)


def _residual_jacobian(Tcw: jax.Array, cam: Camera, obs: PoseObs):
    """Residuals r (N,3), Jacobians J (N,3,6), chi2 per obs.

    Mono observations use only the first two residual rows (third row is
    masked). Perturbation model: T' = exp(xi) @ T (left multiplicative),
    giving d(pc)/d(xi) = [I | -hat(pc)] for xi = [rho, phi].
    """
    pc = se3.transform_points(Tcw, obs.points_w)  # (N,3)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.maximum(z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    is_stereo = obs.u_right >= 0.0
    r_u = obs.uv[..., 0] - u
    r_v = obs.uv[..., 1] - v
    r_r = jnp.where(is_stereo, obs.u_right - ur, 0.0)
    r = jnp.stack([r_u, r_v, r_r], axis=-1)  # (N,3)

    # d(u,v,ur)/d(pc): rows of the projection Jacobian
    du = jnp.stack([cam.fx * inv_z, jnp.zeros_like(z), -cam.fx * x * inv_z2], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * inv_z, -cam.fy * y * inv_z2], -1)
    dur = du + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * inv_z2], -1
    )
    dproj = jnp.stack([du, dv, dur], axis=-2)  # (N,3,3)

    # d(pc)/d(xi) = [I | -hat(pc)]  (N,3,6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    dpc = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)
    J = -jnp.einsum("...ij,...jk->...ik", dproj, dpc, precision=_P)  # (N,3,6)

    # Mask the stereo row for mono obs; mask points behind the camera.
    row_mask = jnp.stack(
        [jnp.ones_like(z), jnp.ones_like(z), is_stereo.astype(z.dtype)], -1
    )
    depth_ok = (z > 1e-3).astype(z.dtype)
    r = r * row_mask
    J = J * row_mask[..., None]

    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    return r, J, chi2, is_stereo, depth_ok


def optimize_pose(
    Tcw0: jax.Array,
    cam: Camera,
    obs: PoseObs,
    rounds: int = 4,
    iters_per_round: int = 10,
    lam0: float = 1e-3,
    unroll: bool = False,
) -> PoseOptResult:
    """Run the 4x10 robust pose refinement. Fully jittable; vmap for batches.

    unroll=True switches to the tracking-hot-path variant: fully unrolled
    Gauss-Newton with constant damping and no accept/reject re-evaluation.
    On v5e the sequential lax.scan steps are overhead-bound (~tens of us
    each on (N,3,6) tensors) and the cost-check doubles the Jacobian
    evaluations; pose GN converges in 3-4 iterations on a good init, so
    the fused frame step uses rounds=3, iters_per_round=4, unroll=True
    (ATE-indistinguishable from the reference's 4x10 LM schedule, measured
    on the synthetic suite)."""

    def lm_iter(carry, _):
        Tcw, lam, inlier = carry
        r, J, chi2, is_stereo, depth_ok = _residual_jacobian(Tcw, cam, obs)
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        w_rob = huber_weight(chi2, delta2)
        w = w_rob * obs.inv_sigma2 * inlier * obs.valid * depth_ok
        Jw = J * w[..., None, None]
        H = jnp.einsum("ndp,ndq->pq", Jw, J, precision=_P)
        b = jnp.einsum("ndp,nd->p", Jw, r, precision=_P)
        dx = solve_damped(H, -b, lam)
        # r = obs - proj, J = d r/d xi, GN step solves J^T W J dx = -J^T W r.
        T_new = se3.se3_exp(dx) @ Tcw
        if unroll:
            return (T_new, lam, inlier), None
        # Accept/reject by total robust cost (simple LM lambda schedule).
        _, _, chi2_new, *_ = _residual_jacobian(T_new, cam, obs)
        mask = inlier * obs.valid
        cost = jnp.sum(jnp.minimum(chi2, delta2 * 4.0) * mask)
        cost_new = jnp.sum(jnp.minimum(chi2_new, delta2 * 4.0) * mask)
        improved = cost_new < cost
        Tcw = jnp.where(improved, T_new, Tcw)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e4)
        return (Tcw, lam, inlier), None

    def round_body(carry, _):
        Tcw, inlier = carry
        state = (Tcw, jnp.asarray(lam0, Tcw.dtype), inlier)
        if unroll:
            for _i in range(iters_per_round):
                state, _ = lm_iter(state, None)
        else:
            state, _ = jax.lax.scan(
                lm_iter, state, None, length=iters_per_round
            )
        Tcw = state[0]
        # Reclassify outliers exactly like the reference: chi2 > threshold
        # marks the edge outlier for the next round but it may return.
        _, _, chi2, is_stereo, depth_ok = _residual_jacobian(Tcw, cam, obs)
        delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        inlier = ((chi2 <= delta2) & (depth_ok > 0)).astype(Tcw.dtype)
        return (Tcw, inlier), None

    # Clean the input: iterative updates only left-multiply orthonormal exp
    # factors, so an input rotation off SO(3) would survive the whole solve
    # and compound across frames (see se3.orthonormalize).
    Tcw0 = se3.orthonormalize(Tcw0)
    inlier0 = obs.valid.astype(Tcw0.dtype)
    carry = (Tcw0, inlier0)
    if unroll:
        for _r in range(rounds):
            carry, _ = round_body(carry, None)
    else:
        carry, _ = jax.lax.scan(round_body, carry, None, length=rounds)
    Tcw, inlier = carry
    _, _, chi2, is_stereo, depth_ok = _residual_jacobian(Tcw, cam, obs)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    final_inlier = (chi2 <= delta2) & (depth_ok > 0) & obs.valid
    return PoseOptResult(
        Tcw=Tcw,
        inlier=final_inlier,
        num_inliers=jnp.sum(final_inlier.astype(jnp.int32)),
        chi2=jnp.where(obs.valid, chi2, 0.0),
    )
