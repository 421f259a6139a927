"""Rectified stereo matching: left keypoints -> subpixel disparity/depth.

Replaces Frame::ComputeStereoMatches (reference src/Frame.cc:1179-1574):
per left keypoint, candidate right keypoints in a +-2-row band are matched
by descriptor distance, then refined to subpixel by an 11x11 SAD sweep
(+-5 px) with parabola interpolation. TPU-native: the row-band candidate
walk is a masked (N, M) Hamming matrix; the SAD sweep is one gathered
(N, 11, W, W) tensor contraction over all keypoints at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hamming


class StereoMatchResult(NamedTuple):
    u_right: jax.Array   # (N,) refined right-image u (<0 = no match)
    depth: jax.Array     # (N,) bf / disparity (<0 = no match)
    valid: jax.Array     # (N,)


def match_stereo(
    left_desc: jax.Array,     # (N, 256)
    left_xy: jax.Array,       # (N, 2) level-0 coords
    left_level: jax.Array,    # (N,)
    left_valid: jax.Array,
    right_desc: jax.Array,    # (M, 256)
    right_xy: jax.Array,
    right_level: jax.Array,
    right_valid: jax.Array,
    left_img: jax.Array,      # (H, W) blurred level-0 image
    right_img: jax.Array,
    bf: jax.Array,
    min_z: jax.Array,         # min depth -> max disparity = bf / min_z
    max_dist: int = 100,
    win: int = 5,
    sweep: int = 5,
) -> StereoMatchResult:
    H, W = left_img.shape
    scale_l = 1.2 ** left_level.astype(jnp.float32)

    # row-band + disparity window (reference: +-2 rows scaled by level,
    # disparity in (0, bf/minZ])
    dv = jnp.abs(left_xy[:, 1:2] - right_xy[None, :, 1])
    band = dv <= 2.0 * scale_l[:, None]
    disp = left_xy[:, 0:1] - right_xy[None, :, 0]
    max_disp = bf / jnp.maximum(min_z, 1e-3)
    dmask = (disp > 0.0) & (disp <= max_disp)
    level_ok = jnp.abs(
        left_level[:, None] - right_level[None, :]
    ) <= 1
    mask = band & dmask & level_ok & left_valid[:, None] & right_valid[None, :]

    dist = hamming.hamming_matrix(left_desc, right_desc)
    res = hamming.match(
        hamming.apply_mask(dist, mask), max_dist=max_dist, mutual=False
    )
    j = jnp.maximum(res.idx, 0)
    u_r0 = right_xy[j, 0]

    # subpixel SAD sweep around the candidate
    r = win
    gy, gx = jnp.meshgrid(
        jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"
    )

    def patch(img, cy, cx):
        yy = jnp.clip(cy[:, None, None] + gy[None], 0, H - 1).astype(jnp.int32)
        xx = jnp.clip(cx[:, None, None] + gx[None], 0, W - 1).astype(jnp.int32)
        return img.reshape(-1)[yy * W + xx]

    ly = jnp.round(left_xy[:, 1]).astype(jnp.int32)
    lx = jnp.round(left_xy[:, 0]).astype(jnp.int32)
    T = patch(left_img, ly, lx)                          # (N, P, P)
    # normalize by center intensity like the reference's IL - center trick
    T = T - T[:, r : r + 1, r : r + 1]

    sads = []
    base_x = jnp.round(u_r0).astype(jnp.int32)
    for off in range(-sweep, sweep + 1):
        Rp = patch(right_img, ly, base_x + off)
        Rp = Rp - Rp[:, r : r + 1, r : r + 1]
        sads.append(jnp.sum(jnp.abs(T - Rp), axis=(1, 2)))
    sad = jnp.stack(sads, axis=-1)                        # (N, 2*sweep+1)
    best = jnp.argmin(sad, axis=-1)
    # parabola subpixel: x* = best + 0.5*(L - R)/(L - 2C + R)
    c = jnp.take_along_axis(sad, best[:, None], 1)[:, 0]
    l = jnp.take_along_axis(
        sad, jnp.clip(best - 1, 0, 2 * sweep)[:, None], 1
    )[:, 0]
    rr = jnp.take_along_axis(
        sad, jnp.clip(best + 1, 0, 2 * sweep)[:, None], 1
    )[:, 0]
    denom = l - 2 * c + rr
    frac = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (l - rr) / denom, 0.0)
    frac = jnp.clip(frac, -1.0, 1.0)
    interior = (best > 0) & (best < 2 * sweep)
    u_ref = base_x.astype(jnp.float32) + (
        best.astype(jnp.float32) - sweep + jnp.where(interior, frac, 0.0)
    )

    disparity = left_xy[:, 0] - u_ref
    ok = res.valid & (disparity > 0.1) & (disparity <= max_disp)
    depth = jnp.where(ok, bf / jnp.maximum(disparity, 0.1), -1.0)
    return StereoMatchResult(
        u_right=jnp.where(ok, u_ref, -1.0),
        depth=depth,
        valid=ok,
    )
