"""Monocular map initialization: batched H/F RANSAC + motion recovery.

Replaces the reference's Initializer (src/Initializer.cc:68-1845): 200
RANSAC iterations computing a homography (4-pt DLT) and a fundamental
matrix (8-pt) in two parallel std::threads, model selection by score ratio
RH = SH/(SH+SF) > 0.40, then ReconstructH (Faugeras's 8 solutions) or
ReconstructF (4 E-decompositions), each validated by triangulating and
counting cheirality+parallax-consistent points (CheckRT).

TPU-native: the two "threads" are two hypothesis batches inside ONE jitted
program; all 8+4 motion candidates are checked by one batched triangulation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from ..geometry.triangulate import triangulate_dlt
from .fundamental import (
    _f_from_8, _normalize_points, epipolar_distance, ransac_fundamental,
)

_P = jax.lax.Precision.HIGHEST
CHI2_H = 5.991
CHI2_F = 3.841


def _h_from_4(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched 4-point DLT homography: (H, 4, 2) x2 -> (H, 3, 3)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)               # (H, 8, 9)
    AtA = jnp.einsum("hni,hnj->hij", A, A, precision=_P)
    _, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    return h.reshape(h.shape[:-1] + (3, 3))


def _h_transfer_error(Hm: jax.Array, x1: jax.Array, x2: jax.Array):
    """Symmetric transfer errors under H: (..., N) squared px errors both ways."""
    def apply(H, x):
        o = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        p = jnp.concatenate([x, o], axis=-1)
        y = jnp.einsum("...ij,nj->...ni", H, p, precision=_P)
        return y[..., :2] / jnp.where(
            jnp.abs(y[..., 2:]) < 1e-9, 1e-9, y[..., 2:]
        )

    Hinv = jnp.linalg.inv(Hm)
    e12 = jnp.sum((apply(Hm, x1) - x2) ** 2, axis=-1)
    e21 = jnp.sum((apply(Hinv, x2) - x1) ** 2, axis=-1)
    return e12, e21


class InitResult(NamedTuple):
    ok: jax.Array          # () bool
    used_h: jax.Array      # () bool which model was selected
    Tcw2: jax.Array        # (4, 4) pose of frame 2 (frame 1 = identity)
    points: jax.Array      # (N, 3) triangulated points
    point_ok: jax.Array    # (N,) triangulation validity
    num_good: jax.Array


def _check_rt(R, t, cam: Camera, x1, x2, match_ok, th2=16.0):
    """Triangulate under (R, t) and score (Initializer::CheckRT,
    src/Initializer.cc:1578): cheirality in both views, reprojection, and
    parallax. Returns (score, points, good_mask)."""
    K = cam.K
    T1 = jnp.eye(4)
    T2 = se3.make_T(R, t)
    P1 = K @ T1[:3]
    P2 = K @ T2[:3]
    X, _ = triangulate_dlt(P1, P2, x1, x2)
    z1 = X[:, 2]
    pc2 = se3.transform_points(T2, X)
    z2 = pc2[:, 2]

    def reproj(P, X):
        o = jnp.ones((X.shape[0], 1), X.dtype)
        y = jnp.einsum("ij,nj->ni", P, jnp.concatenate([X, o], -1), precision=_P)
        return y[:, :2] / jnp.maximum(y[:, 2:], 1e-9)

    e1 = jnp.sum((reproj(P1, X) - x1) ** 2, axis=-1)
    e2 = jnp.sum((reproj(P2, X) - x2) ** 2, axis=-1)

    # parallax between viewing rays
    c2 = -R.T @ t
    r1 = X
    r2 = X - c2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
    )
    good = (
        match_ok
        & (z1 > 0) & (z2 > 0)
        & (e1 < th2) & (e2 < th2)
        & (cosp < 0.99998)
    )
    return jnp.sum(good), X, good


def initialize_two_view(
    cam: Camera,
    x1: jax.Array,         # (N, 2) undistorted kps in frame 1
    x2: jax.Array,         # (N, 2) matched kps in frame 2
    valid: jax.Array,
    key: jax.Array,
    n_hyp: int = 256,
    min_good: int = 50,
    min_parallax_deg: float = 1.0,
) -> InitResult:
    N = x1.shape[0]
    k1, k2 = jax.random.split(key)
    x1n, T1 = _normalize_points(x1, valid)
    x2n, T2 = _normalize_points(x2, valid)
    s = 0.5 * (T1[0, 0] + T1[1, 1])

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)

    # ---- F branch -----------------------------------------------------
    idxF = jax.random.choice(k1, N, shape=(n_hyp, 8), p=probs)
    F_h = _f_from_8(x1n[idxF], x2n[idxF])
    dF = epipolar_distance(F_h, x1n, x2n) / s              # px both images
    # reference SF: sum over points of (th - e^2) clamped
    sF = jnp.sum(
        jnp.where(
            (dF * dF < CHI2_F) & valid[None], CHI2_H - dF * dF * 1.0, 0.0
        ),
        axis=-1,
    )
    bestF = jnp.argmax(sF)
    SF = sF[bestF]
    F = T2.T @ F_h[bestF] @ T1

    # ---- H branch -----------------------------------------------------
    idxH = jax.random.choice(k2, N, shape=(n_hyp, 4), p=probs)
    H_h = _h_from_4(x1n[idxH], x2n[idxH])
    e12, e21 = _h_transfer_error(H_h, x1n, x2n)
    e12, e21 = e12 / (s * s), e21 / (s * s)
    sH = jnp.sum(
        jnp.where((e12 < CHI2_H) & valid[None], CHI2_H - e12, 0.0)
        + jnp.where((e21 < CHI2_H) & valid[None], CHI2_H - e21, 0.0),
        axis=-1,
    )
    bestH = jnp.argmax(sH)
    SH = sH[bestH]
    Hm = jnp.linalg.inv(T2) @ H_h[bestH] @ T1

    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40

    # match masks under the chosen model
    dF_px = epipolar_distance(F, x1, x2)
    f_ok = (dF_px * dF_px < CHI2_F * 2) & valid
    e12p, e21p = _h_transfer_error(Hm, x1, x2)
    h_ok = (e12p < CHI2_H * 2) & (e21p < CHI2_H * 2) & valid

    # ---- motion candidates ---------------------------------------------
    K = cam.K
    Kinv = jnp.linalg.inv(K)

    # From F: E = K^T F K; 4 candidates
    E = K.T @ F @ K
    U, S_, Vt = jnp.linalg.svd(E)
    # enforce det(U), det(Vt) = +1
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-9)
    f_cands = [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]

    # From H: Faugeras via SVD of A = K^-1 H K
    A = Kinv @ Hm @ K
    Ua, Sa, Vta = jnp.linalg.svd(A)
    d1, d2, d3 = Sa[0], Sa[1], Sa[2]
    sgn = jnp.linalg.det(Ua) * jnp.linalg.det(Vta)
    # x1/x3 magnitudes (Faugeras); guard degenerate equal singular values
    eps = 1e-8
    x1m = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0, None))
    x3m = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0, None))
    h_cands = []
    for e1s in (1.0, -1.0):
        for e3s in (1.0, -1.0):
            x1v, x3v = e1s * x1m, e3s * x3m
            # case d' = +d2
            st = (d1 - d3) * x1v * x3v / jnp.maximum(d2, eps)
            ct = (d1 * x3v * x3v + d3 * x1v * x1v) / jnp.maximum(d2, eps)
            # normalize (numerical)
            nrm = jnp.maximum(jnp.sqrt(st * st + ct * ct), eps)
            st, ct = st / nrm, ct / nrm
            Rp = jnp.array(
                [[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]]
            )
            tp = jnp.stack([(d1 - d3) * x1v, 0.0 * d1, -(d1 - d3) * x3v])
            R = sgn * Ua @ Rp @ Vta
            t = Ua @ tp
            t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
            h_cands.append((R, t))

    # ---- evaluate all candidates with the proper match mask -------------
    def eval_cands(cands, ok_mask):
        scores, Xs, goods = [], [], []
        for (R, t) in cands:
            sc, X, good = _check_rt(R, t, cam, x1, x2, ok_mask)
            scores.append(sc)
            Xs.append(X)
            goods.append(good)
        scores = jnp.stack(scores)
        best = jnp.argmax(scores)
        return (
            scores[best],
            jnp.stack(Xs)[best],
            jnp.stack(goods)[best],
            best,
            jnp.stack([se3.make_T(R, t) for (R, t) in cands])[best],
        )

    fs, fX, fgood, _, fT = eval_cands(f_cands, f_ok)
    hs, hX, hgood, _, hT = eval_cands(h_cands, h_ok)

    num_good = jnp.where(use_h, hs, fs)
    Tcw2 = jnp.where(use_h, hT, fT)
    points = jnp.where(use_h, hX, fX)
    point_ok = jnp.where(use_h, hgood, fgood)
    ok = num_good >= min_good
    return InitResult(
        ok=ok, used_h=use_h, Tcw2=Tcw2, points=points,
        point_ok=point_ok & ok, num_good=num_good,
    )
