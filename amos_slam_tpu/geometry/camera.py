"""Pinhole camera model with OpenCV-style radial-tangential distortion.

Replaces the scattered intrinsics handling of the reference (fx/fy/cx/cy +
DistCoef read in Tracking's ctor, undistortion in Frame::UndistortKeyPoints,
src/Frame.cc:1052; projection in Frame::isInFrustum, src/Frame.cc:761).
Everything is batched over arbitrary leading dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    """Static camera parameters (a pytree of scalars).

    dist = (k1, k2, p1, p2, k3); bf = baseline * fx for stereo/RGB-D
    (reference ``Camera.bf`` YAML key); depth_th separates close/far points
    (reference ``ThDepth * baseline``).
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array  # (5,)
    bf: jax.Array
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, dist=None, bf=0.0, width=640, height=480):
        d = jnp.zeros(5, jnp.float32) if dist is None else jnp.asarray(dist, jnp.float32)
        if d.shape[0] < 5:
            d = jnp.concatenate([d, jnp.zeros(5 - d.shape[0], jnp.float32)])
        return Camera(
            fx=jnp.float32(fx), fy=jnp.float32(fy),
            cx=jnp.float32(cx), cy=jnp.float32(cy),
            dist=d, bf=jnp.float32(bf), width=int(width), height=int(height),
        )

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )


def project(cam: Camera, pts_c: jax.Array, eps: float = 1e-6):
    """Camera-frame points (...,3) -> pixel coords (...,2) and depth (...,).

    No distortion is applied: like the reference, matching operates on
    undistorted keypoints (mvKeysUn), so projection is pure pinhole.
    """
    z = pts_c[..., 2]
    inv_z = 1.0 / jnp.maximum(z, eps)
    u = cam.fx * pts_c[..., 0] * inv_z + cam.cx
    v = cam.fy * pts_c[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(cam: Camera, pts_c: jax.Array, eps: float = 1e-6):
    """Returns (u, v, u_right) like the reference's stereo edges."""
    uv, z = project(cam, pts_c, eps)
    ur = uv[..., 0] - cam.bf / jnp.maximum(z, eps)
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def backproject(cam: Camera, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Undistorted pixels (...,2) + depth (...,) -> camera-frame points (...,3).

    Reference: Frame::UnprojectStereo (src/Frame.cc) / ComputeStereoFromRGBD.
    """
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def distort_normalized(cam: Camera, xy: jax.Array) -> jax.Array:
    """Apply the 5-coefficient distortion to normalized coords (...,2)."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Camera, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Undistort raw pixel keypoints (...,2) -> undistorted pixels (...,2).

    Fixed-point iteration (the standard cv::undistortPoints scheme) with a
    static trip count — jit-friendly replacement for
    Frame::UndistortKeyPoints (src/Frame.cc:1052).
    """
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy0 = jnp.stack([x0, y0], axis=-1)

    # unrolled (a lax.fori_loop here cost ~2.5 ms for 1024 points on v5e --
    # per-iteration loop overhead dwarfs the elementwise math; unrolled, XLA
    # fuses the whole fixed-point iteration into one kernel)
    xy = xy0
    for _ in range(iters):
        d = distort_normalized(cam, xy) - xy
        xy = xy0 - d
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def in_image(cam: Camera, uv: jax.Array, border: float = 0.0) -> jax.Array:
    """Visibility mask for pixel coords (...,2)."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= border)
        & (u < cam.width - border)
        & (v >= border)
        & (v < cam.height - border)
    )
