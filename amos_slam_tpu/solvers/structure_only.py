"""Structure-only refinement: per-landmark GN with poses fixed.

One half of the global-BA decomposition (see loop/global_ba.py). With
camera poses held fixed, every landmark's 3-parameter problem is
independent -- the perfect TPU shape: M simultaneous 3x3 Gauss-Newton
solves, observations gathered as padded (M, OBS) tables.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from .robust import CHI2_MONO, huber_weight, inv3x3

_P = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("iters",))
def refine_points(
    cam: Camera,
    points: jax.Array,      # (M, 3) initial positions
    point_valid: jax.Array,  # (M,)
    poses: jax.Array,       # (M, OBS, 4, 4) observing keyframe poses
    uv: jax.Array,          # (M, OBS, 2) pixel observations
    obs_valid: jax.Array,   # (M, OBS)
    inv_sigma2: jax.Array,  # (M, OBS)
    iters: int = 4,
):
    """Returns (refined_points (M,3), mean_chi2 per point (M,))."""

    R = poses[..., :3, :3]
    t = poses[..., :3, 3]

    def step(X, _):
        pc = jnp.einsum("moij,mj->moi", R, X, precision=_P) + t
        z = jnp.maximum(pc[..., 2], 1e-6)
        u = cam.fx * pc[..., 0] / z + cam.cx
        v = cam.fy * pc[..., 1] / z + cam.cy
        r = jnp.stack([uv[..., 0] - u, uv[..., 1] - v], axis=-1)  # (M,OBS,2)
        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        w = (
            huber_weight(chi2, CHI2_MONO)
            * inv_sigma2
            * obs_valid
            * (pc[..., 2] > 1e-3)
        )
        zero = jnp.zeros_like(z)
        inv_z = 1.0 / z
        du = jnp.stack([cam.fx * inv_z, zero, -cam.fx * pc[..., 0] * inv_z**2], -1)
        dv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * pc[..., 1] * inv_z**2], -1)
        dproj = jnp.stack([du, dv], axis=-2)                   # (M,OBS,2,3)
        J = -jnp.einsum("moij,mojk->moik", dproj, R, precision=_P)
        Jw = J * w[..., None, None]
        H = jnp.einsum("modi,modj->mij", Jw, J, precision=_P)  # (M,3,3)
        g = jnp.einsum("modi,mod->mi", Jw, r, precision=_P)
        H = H + jnp.eye(3) * 1e-6
        dx = -jnp.einsum("mij,mj->mi", inv3x3(H), g, precision=_P)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        has = jnp.sum(w, axis=-1) > 0
        X = jnp.where((point_valid & has)[:, None], X + dx, X)
        return X, None

    X, _ = jax.lax.scan(step, points, None, length=iters)
    # final chi2
    pc = jnp.einsum("moij,mj->moi", R, X, precision=_P) + t
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    chi2 = ((uv[..., 0] - u) ** 2 + (uv[..., 1] - v) ** 2) * inv_sigma2
    n = jnp.maximum(jnp.sum(obs_valid, -1), 1)
    return X, jnp.sum(jnp.where(obs_valid > 0, chi2, 0.0), -1) / n
