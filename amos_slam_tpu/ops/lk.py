"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for cv::calcOpticalFlowPyrLK as used by the dynamic
stage (reference src/Tracking.cc:896: 5 pyramid levels, 22x22 windows) and
the LK helper (include/LK.h:32). All N tracks advance together: per level,
template patches/gradients gather once, then a fixed number of GN updates
solve the 2x2 flow systems for the whole batch in parallel. Bilinear
sampling is 4 gathers; everything is static-shaped.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _dyadic_pyramid(img: jax.Array, levels: int):
    """List of (H/2^l, W/2^l) images, 2x2 average-pool downsampling."""
    out = [img]
    for _ in range(levels - 1):
        p = out[-1]
        h, w = p.shape
        h2, w2 = h // 2, w // 2
        p = p[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))
        out.append(p)
    return out


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Sample img at float coords (any shape), clamped borders."""
    H, W = img.shape
    y = jnp.clip(y, 0.0, H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[yy * W + xx]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


class FlowResult(NamedTuple):
    pts1: jax.Array     # (N, 2) tracked (x, y) positions in image 2
    valid: jax.Array    # (N,) bool: converged, in-bounds, low residual
    err: jax.Array      # (N,) mean |I1 - I2| over the window (SAD/px)


def lk_flow(
    img0: jax.Array,
    img1: jax.Array,
    pts0: jax.Array,          # (N, 2) float32 (x, y) in img0
    pts_valid: jax.Array,     # (N,) bool
    levels: int = 4,
    win_half: int = 7,
    iters: int = 10,
    max_err: float = 20.0,
) -> FlowResult:
    """Track pts0 from img0 to img1. Returns positions in img1.

    Window is (2*win_half+1)^2 (=15x15 default; the reference uses 22x22 --
    configure win_half=10 for parity). The validity gate folds in the
    reference's neighborhood-SAD and border filters (src/Tracking.cc:902-924).
    """
    pyr0 = _dyadic_pyramid(img0, levels)
    pyr1 = _dyadic_pyramid(img1, levels)
    N = pts0.shape[0]
    w = win_half
    dy, dx = jnp.meshgrid(
        jnp.arange(-w, w + 1, dtype=jnp.float32),
        jnp.arange(-w, w + 1, dtype=jnp.float32),
        indexing="ij",
    )

    # flow estimate in level-0 coordinates, refined coarse-to-fine
    g = jnp.zeros((N, 2), jnp.float32)   # accumulated displacement (x, y)

    for lvl in range(levels - 1, -1, -1):
        scale = 0.5 ** lvl
        I0, I1 = pyr0[lvl], pyr1[lvl]
        p0 = pts0 * scale                    # (N,2) (x,y) at this level
        base_y = p0[:, 1:2, None] + dy[None]  # (N, P, P)
        base_x = p0[:, 0:1, None] + dx[None]

        T = _bilinear(I0, base_y, base_x)     # template patches
        # spatial gradients of the template (central differences)
        Tx = 0.5 * (
            _bilinear(I0, base_y, base_x + 1) - _bilinear(I0, base_y, base_x - 1)
        )
        Ty = 0.5 * (
            _bilinear(I0, base_y + 1, base_x) - _bilinear(I0, base_y - 1, base_x)
        )
        Gxx = jnp.sum(Tx * Tx, axis=(1, 2))
        Gxy = jnp.sum(Tx * Ty, axis=(1, 2))
        Gyy = jnp.sum(Ty * Ty, axis=(1, 2))
        det = Gxx * Gyy - Gxy * Gxy
        inv_ok = det > 1e-6
        det = jnp.where(inv_ok, det, 1.0)

        def body(_, gl):
            qy = base_y + (gl[:, 1] * scale)[:, None, None]
            qx = base_x + (gl[:, 0] * scale)[:, None, None]
            I = _bilinear(I1, qy, qx)
            It = I - T
            bx = jnp.sum(It * Tx, axis=(1, 2))
            by = jnp.sum(It * Ty, axis=(1, 2))
            dxe = (Gyy * bx - Gxy * by) / det
            dye = (Gxx * by - Gxy * bx) / det
            step = jnp.stack([-dxe, -dye], axis=-1) / scale
            step = jnp.where(inv_ok[:, None], step, 0.0)
            step = jnp.clip(step, -32.0, 32.0)
            return gl + step

        g = jax.lax.fori_loop(0, iters, body, g)

    # final validity: residual + bounds
    H, W = img0.shape
    p1 = pts0 + g
    qy = pts0[:, 1:2, None] + dy[None] + g[:, 1][:, None, None]
    qx = pts0[:, 0:1, None] + dx[None] + g[:, 0][:, None, None]
    I = _bilinear(img1, qy, qx)
    T0 = _bilinear(img0, pts0[:, 1:2, None] + dy[None], pts0[:, 0:1, None] + dx[None])
    err = jnp.mean(jnp.abs(I - T0), axis=(1, 2))
    inb = (
        (p1[:, 0] >= w + 1) & (p1[:, 0] < W - w - 1)
        & (p1[:, 1] >= w + 1) & (p1[:, 1] < H - w - 1)
    )
    valid = pts_valid & inb & (err < max_err)
    return FlowResult(pts1=p1, valid=valid, err=err)
