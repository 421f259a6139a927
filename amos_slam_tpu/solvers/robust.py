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


def chol_factor_unrolled(Hd: jax.Array):
    """Batched unrolled Cholesky factor of a small SPD matrix.

    Returns the lower factor as a list-of-lists of (...,) scalars, to be
    consumed by :func:`chol_backsolve_unrolled`. Splitting factor from solve
    matters where one matrix is solved against several right-hand sides
    (inverse iteration): the factorization is the n^3/3-op part.
    """
    n = Hd.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = Hd[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = Hd[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def chol_backsolve_unrolled(L, b: jax.Array) -> jax.Array:
    """Solve L L^T x = b given an unrolled factor (n^2-op part)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def chol_solve_unrolled(Hd: jax.Array, b: jax.Array) -> jax.Array:
    """Batched SPD solve with a fully unrolled Cholesky (static small n).

    On TPU, lapack-style cho_factor on a single small matrix lowers to a
    sequential blocked loop with hundreds of microseconds of fixed latency;
    called inside every GN iteration of the pose solvers that adds up to
    milliseconds per frame. Unrolled, the ~n^3/3 scalar operations fuse into
    the surrounding program as straight-line elementwise code. Broadcasts
    over any leading batch dims.
    """
    return chol_backsolve_unrolled(chol_factor_unrolled(Hd), b)


def inv3x3(A: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate / determinant).

    jnp.linalg.inv on a (M, 3, 3) batch lowers to batched LU on TPU --
    milliseconds for a few thousand matrices; the adjugate form is pure
    elementwise arithmetic and fuses away.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) > eps, det, eps)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return adj * inv_det[..., None, None]


def _solve6_block(Hd: jax.Array, b: jax.Array) -> jax.Array:
    """Batched SPD 6x6 solve by 2x2-block Schur elimination over 3x3 blocks.

    [[A, B], [Bt, C]] x = [b1, b2]  via  S = C - Bt A^-1 B:
    two closed-form 3x3 inverses + four 3x3 matmuls -- ~20 fused ops versus
    ~110 for the unrolled 6x6 Cholesky. The pose solvers run one of these
    per GN iteration (12+ iterations per fused frame), where op count, not
    FLOPs, is the cost on TPU.
    """
    A = Hd[..., :3, :3]
    B = Hd[..., :3, 3:]
    C = Hd[..., 3:, 3:]
    b1 = b[..., :3]
    b2 = b[..., 3:]
    Ainv = inv3x3(A)
    AinvB = Ainv @ B
    S = C - jnp.swapaxes(B, -1, -2) @ AinvB
    Sinv = inv3x3(S)
    Ainvb1 = jnp.einsum("...ij,...j->...i", Ainv, b1)
    rhs2 = b2 - jnp.einsum("...ji,...j->...i", AinvB, b1)
    x2 = jnp.einsum("...ij,...j->...i", Sinv, rhs2)
    x1 = Ainvb1 - jnp.einsum("...ij,...j->...i", AinvB, x2)
    return jnp.concatenate([x1, x2], axis=-1)


def solve_damped(H: jax.Array, b: jax.Array, lam: jax.Array) -> jax.Array:
    """Solve (H + lam*diag(H)) dx = b with a safe Cholesky fallback.

    Levenberg-Marquardt style diagonal damping (g2o's
    OptimizationAlgorithmLevenberg, core/optimization_algorithm_levenberg.cpp).
    """
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    damp = lam[..., None] * jnp.maximum(diag, 1e-9)
    Hd = H + jnp.eye(H.shape[-1], dtype=H.dtype) * damp[..., None, :]
    if H.shape[-1] == 6:
        dx = _solve6_block(Hd, b)
    elif H.shape[-1] <= 8:
        dx = chol_solve_unrolled(Hd, b)
    else:
        L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), b[..., None])[..., 0]
    return jnp.where(jnp.isfinite(dx), dx, 0.0)
