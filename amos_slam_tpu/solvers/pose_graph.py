"""Pose-graph optimization (essential graph) with padded edge lists.

Replaces Optimizer::OptimizeEssentialGraph (reference src/Optimizer.cc:1017:
g2o Sim3 vertices + EdgeSim3 over spanning tree, covisibility, and loop
edges, 20 LM iterations). TPU-native form: E padded relative-pose edges over
K padded pose slots; per-edge residuals AND their exact 7x14 Jacobians
(forward-mode autodiff through the Sim3 exp/log chain, vmapped over edges)
evaluate in parallel; the Gauss-Newton normal system assembles by
scatter-add of 7x7 blocks into a dense (7K, 7K) matrix and solves with one
Cholesky on the MXU. For a session's keyframe count (<= 512) dense beats
any sparse structure on this hardware.

Residual for edge (i, j) with measurement S_ji:
    r(xi_i, xi_j) = sim3_log(S_ji^-1 * (exp(xi_j) S_j) * (exp(xi_i) S_i)^-1)
evaluated at xi = 0; fix_scale=True (RGB-D/stereo) pins the scale tangent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.sim3 import Sim3, sim3_exp, sim3_log

_P = jax.lax.Precision.HIGHEST


class PoseGraphProblem(NamedTuple):
    R: jax.Array          # (K, 3, 3) world->camera rotations
    t: jax.Array          # (K, 3)
    s: jax.Array          # (K,) scales (1 for SE3)
    pose_valid: jax.Array  # (K,)
    pose_fixed: jax.Array  # (K,) bool
    edge_i: jax.Array     # (E,) int32
    edge_j: jax.Array     # (E,) int32
    edge_R: jax.Array     # (E, 3, 3) measured S_ji = S_j * S_i^-1
    edge_t: jax.Array     # (E, 3)
    edge_s: jax.Array     # (E,)
    edge_w: jax.Array     # (E,) weight (0 = padding)


class PoseGraphResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    s: jax.Array
    final_err: jax.Array


def _edge_res_tangent(xi2, Si: Sim3, Sj: Sim3, Sm: Sim3):
    """Residual as a function of the stacked perturbation (14,) [xi_i, xi_j]."""
    gi = sim3_exp(xi2[:7]).compose(Si)
    gj = sim3_exp(xi2[7:]).compose(Sj)
    rel = gj.compose(gi.inverse())
    return sim3_log(Sm.inverse().compose(rel))


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale", "lam"))
def optimize_pose_graph(
    prob: PoseGraphProblem,
    iters: int = 20,
    fix_scale: bool = True,
    lam: float = 1e-5,
) -> PoseGraphResult:
    K = prob.R.shape[0]
    E = prob.edge_i.shape[0]
    D = 7

    res_and_jac = jax.vmap(
        lambda Si_R, Si_t, Si_s, Sj_R, Sj_t, Sj_s, Sm_R, Sm_t, Sm_s: (
            lambda f: (f(jnp.zeros(14)), jax.jacfwd(f)(jnp.zeros(14)))
        )(
            lambda xi: _edge_res_tangent(
                xi,
                Sim3(Si_R, Si_t, Si_s),
                Sim3(Sj_R, Sj_t, Sj_s),
                Sim3(Sm_R, Sm_t, Sm_s),
            )
        )
    )

    def gn_iter(carry, _):
        R, t, s = carry
        r, J = res_and_jac(
            R[prob.edge_i], t[prob.edge_i], s[prob.edge_i],
            R[prob.edge_j], t[prob.edge_j], s[prob.edge_j],
            prob.edge_R, prob.edge_t, prob.edge_s,
        )                                                   # (E,7), (E,7,14)
        Ji = J[..., :7]                                     # d r / d xi_i
        Jj = J[..., 7:]
        w = prob.edge_w
        if fix_scale:
            Ji = Ji.at[..., 6].set(0.0)
            Jj = Jj.at[..., 6].set(0.0)

        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]
        # gradient
        g = jnp.zeros((K, D))
        g = g.at[prob.edge_i].add(jnp.einsum("edp,ed->ep", Jiw, r, precision=_P))
        g = g.at[prob.edge_j].add(jnp.einsum("edp,ed->ep", Jjw, r, precision=_P))
        # Hessian blocks
        Hii = jnp.einsum("edp,edq->epq", Jiw, Ji, precision=_P)
        Hjj = jnp.einsum("edp,edq->epq", Jjw, Jj, precision=_P)
        Hij = jnp.einsum("edp,edq->epq", Jiw, Jj, precision=_P)
        H = jnp.zeros((K, K, D, D))
        H = H.at[prob.edge_i, prob.edge_i].add(Hii)
        H = H.at[prob.edge_j, prob.edge_j].add(Hjj)
        H = H.at[prob.edge_i, prob.edge_j].add(Hij)
        H = H.at[prob.edge_j, prob.edge_i].add(jnp.swapaxes(Hij, -1, -2))

        free = (prob.pose_valid & ~prob.pose_fixed).astype(H.dtype)
        H = H * (free[:, None, None, None] * free[None, :, None, None])
        g = g * free[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(K * D, K * D)
        # clamp fixed/padded vars + scale rows if fix_scale, via unit diagonal
        diag_fix = jnp.kron(1.0 - free, jnp.ones(D))
        if fix_scale:
            scale_rows = jnp.tile(
                jnp.eye(D)[6] * free[:, None], (1, 1)
            ).reshape(-1)
            diag_fix = jnp.maximum(diag_fix, scale_rows)
        Hd = Hd + jnp.diag(diag_fix) + lam * jnp.eye(K * D)
        rhs = (-g).reshape(-1) * (1.0 - diag_fix)

        L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), rhs).reshape(K, D)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        upd = sim3_exp(dx)
        cur = Sim3(R=R, t=t, s=s)
        new = upd.compose(cur)
        Tn = se3.orthonormalize(se3.make_T(new.R, new.t))
        return (Tn[..., :3, :3], Tn[..., :3, 3], new.s), jnp.sum(
            r * r * w[:, None]
        )

    carry = (prob.R, prob.t, prob.s)
    carry, errs = jax.lax.scan(gn_iter, carry, None, length=iters)
    R, t, s = carry
    return PoseGraphResult(R=R, t=t, s=s, final_err=errs[-1])
