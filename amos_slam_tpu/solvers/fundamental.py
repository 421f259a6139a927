"""Batched fundamental-matrix and homography estimation under RANSAC.

Replaces cv::findFundamentalMat in the dynamic stage (reference
src/Tracking.cc:927,945 -- run twice: RANSAC, then refit on inliers) and the
Initializer's parallel H/F threads (src/Initializer.cc:174-187: 200 RANSAC
iterations each). TPU-native shape: hypotheses are a leading batch axis --
all minimal samples solve simultaneously (batched SVD/eigh), all
hypothesis-x-point scores evaluate as one (Hyp, N) pass, and the reference's
two std::threads for H vs F become two entries in the same program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_P = jax.lax.Precision.HIGHEST


def _normalize_points(x: jax.Array, valid: jax.Array):
    """Hartley normalization: zero-mean, mean |.| = 1 (per set).

    x: (N, 2); returns (xn, T) with T (3,3) the normalizing transform.
    Mirrors Initializer::Normalize (src/Initializer.cc:1501).
    """
    w = valid.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    d = jnp.abs(x - mean) * w[:, None]
    md = jnp.maximum(jnp.sum(d, axis=0) / n, 1e-6)
    s = 1.0 / md
    xn = (x - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], x.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return xn, T


def _f_from_8(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched 8-point algorithm: (H, 8, 2) x2 -> (H, 3, 3) rank-2 F.

    x2^T F x1 = 0; nullspace via eigh of A^T A (9x9, batched); rank-2
    enforcement via batched 3x3 SVD (Initializer::ComputeF21,
    src/Initializer.cc:~770).
    """
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )  # (H, 8, 9)
    AtA = jnp.einsum("hni,hnj->hij", A, A, precision=_P)
    _, V = jnp.linalg.eigh(AtA)
    f = V[..., :, 0]
    F = f.reshape(f.shape[:-1] + (3, 3))
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., :, None] * Vt)


def epipolar_distance(F: jax.Array, x1: jax.Array, x2: jax.Array):
    """Symmetric epipolar distances: (..., 3, 3) F, (N, 2) points ->
    (..., N) max of point-to-line distances in both images (the quantity the
    reference thresholds at 0.5/1.0 px, src/Tracking.cc:939,1143)."""
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    l2 = jnp.einsum("...ij,nj->...ni", F, p1, precision=_P)        # lines in im2
    l1 = jnp.einsum("...ji,nj->...ni", F, p2, precision=_P)        # lines in im1
    num = jnp.abs(jnp.sum(l2 * p2, axis=-1))
    d2 = num / jnp.maximum(
        jnp.sqrt(l2[..., 0] ** 2 + l2[..., 1] ** 2), 1e-9
    )
    d1 = num / jnp.maximum(
        jnp.sqrt(l1[..., 0] ** 2 + l1[..., 1] ** 2), 1e-9
    )
    return jnp.maximum(d1, d2)


class FundamentalResult(NamedTuple):
    F: jax.Array          # (3, 3)
    inliers: jax.Array    # (N,) bool
    num_inliers: jax.Array
    dist: jax.Array       # (N,) epipolar distance under the final F


def ransac_fundamental(
    x1: jax.Array,
    x2: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    n_hyp: int = 256,
    inlier_th: float = 1.0,
    refit: bool = True,
) -> FundamentalResult:
    """Batched-hypothesis F-RANSAC with masked least-squares refit.

    The reference's two-pass scheme (findFundamentalMat on all, then again
    on inliers) maps to: best-of-H hypotheses, then one weighted 8-point
    solve over all inliers.
    """
    N = x1.shape[0]
    x1n, T1 = _normalize_points(x1, valid)
    x2n, T2 = _normalize_points(x2, valid)

    # sample 8 valid indices per hypothesis (with replacement across the
    # valid set -- collisions are rare and merely waste a hypothesis)
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 8), p=probs)
    F_h = _f_from_8(x1n[idx], x2n[idx])                      # (H,3,3)

    d = epipolar_distance(F_h, x1n, x2n)                     # (H,N) normalized
    # thresholds live in pixel units: scale by the mean normalization factor
    s = 0.5 * (T1[0, 0] + T1[1, 1])
    th_n = inlier_th * s
    inl = (d < th_n) & valid[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    F_best = F_h[best]
    inliers = inl[best]

    if refit:
        w = inliers.astype(x1.dtype)
        u1, v1 = x1n[:, 0], x1n[:, 1]
        u2, v2 = x2n[:, 0], x2n[:, 1]
        one = jnp.ones_like(u1)
        A = jnp.stack(
            [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
        )
        AtA = jnp.einsum("ni,nj->ij", A * w[:, None], A, precision=_P)
        _, V = jnp.linalg.eigh(AtA)
        F_ls = V[:, 0].reshape(3, 3)
        U, S, Vt = jnp.linalg.svd(F_ls)
        F_ls = U @ (S.at[2].set(0.0)[:, None] * Vt)
        # keep the refit only if it does not lose inliers
        d_ls = epipolar_distance(F_ls, x1n, x2n)
        inl_ls = (d_ls < th_n) & valid
        better = jnp.sum(inl_ls) >= jnp.sum(inliers)
        F_best = jnp.where(better, F_ls, F_best)
        inliers = jnp.where(better, inl_ls, inliers)

    # denormalize: F = T2^T Fn T1, distances recomputed in pixel units
    F_px = T2.T @ F_best @ T1
    F_px = F_px / jnp.maximum(jnp.abs(F_px[2, 2]), 1e-12)
    d_px = epipolar_distance(F_px, x1, x2)
    return FundamentalResult(
        F=F_px,
        inliers=inliers,
        num_inliers=jnp.sum(inliers),
        dist=jnp.where(valid, d_px, jnp.inf),
    )
