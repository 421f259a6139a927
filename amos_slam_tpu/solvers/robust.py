"""Robust kernels and weighted normal-equation helpers.

Replaces g2o's RobustKernelHuber/Cauchy (reference:
Thirdparty/g2o/g2o/core/robust_kernel_impl.cpp) in iteratively-reweighted
least-squares form: instead of modifying chi2 inside a graph, we compute a
per-residual weight w(e) = rho'(e2)/1 applied to the normal equations. For
Gauss-Newton/LM with static trip counts this is exactly equivalent at the
fixed point and maps cleanly onto batched einsums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# chi2 thresholds at 95% for 2/3 DoF, used by the reference for mono/stereo
# edges (src/Optimizer.cc:405-447: deltaMono=sqrt(5.991), deltaStereo=sqrt(7.815))
CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def huber_weight(chi2: jax.Array, delta2: float) -> jax.Array:
    """IRLS weight for the Huber kernel given squared error ``chi2``.

    rho(e2) = e2 for e2 <= delta2 else 2*delta*sqrt(e2) - delta2;
    weight = rho'(e2) = 1 or delta/sqrt(e2).
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, 1.0, delta / e)


def cauchy_weight(chi2: jax.Array, delta2: float) -> jax.Array:
    return 1.0 / (1.0 + chi2 / delta2)


def weighted_normal_eq(J: jax.Array, r: jax.Array, w: jax.Array):
    """Accumulate H = sum w J^T J and b = sum w J^T r over residual blocks.

    Args:
      J: (..., N, D, P) Jacobian blocks (D = residual dim, P = params).
      r: (..., N, D) residuals.
      w: (..., N) per-block scalar weights (robust weight * validity mask
         * information scale).
    Returns:
      H (..., P, P), b (..., P).
    """
    hp = jax.lax.Precision.HIGHEST
    Jw = J * w[..., None, None]
    H = jnp.einsum("...ndp,...ndq->...pq", Jw, J, precision=hp)
    b = jnp.einsum("...ndp,...nd->...p", Jw, r, precision=hp)
    return H, b


def solve_damped(H: jax.Array, b: jax.Array, lam: jax.Array) -> jax.Array:
    """Solve (H + lam*diag(H)) dx = b with a safe Cholesky fallback.

    Levenberg-Marquardt style diagonal damping (g2o's
    OptimizationAlgorithmLevenberg, core/optimization_algorithm_levenberg.cpp).
    """
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    damp = lam[..., None] * jnp.maximum(diag, 1e-9)
    Hd = H + jnp.eye(H.shape[-1], dtype=H.dtype) * damp[..., None, :]
    # cho_solve is batched and MXU-friendly; singular systems fall back to 0
    # step via the nan check in the caller.
    L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
    dx = jax.scipy.linalg.cho_solve((L, low), b[..., None])[..., 0]
    return jnp.where(jnp.isfinite(dx), dx, 0.0)
