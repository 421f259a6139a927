"""Vectorized FAST-9/16 corner detection with spatially balanced selection.

TPU-native replacement for the reference's per-cell cv::FAST + quadtree
redistribution (ORBextractor::ComputeKeyPointsOctTree,
src/ORBextractor.cc:1052; DistributeOctTree :706). Design:

* The segment test runs for *all pixels at once*: 16 statically-shifted
  copies of the image give the Bresenham-circle differences as a (16, H, W)
  tensor; a "min over 9 consecutive (circular)" reduction and a max over the
  16 arc starts produce the exact FAST corner *margin* (the largest
  threshold t at which the pixel is still a corner) in one fused VPU pass.
  Corner-at-threshold-t == margin > t, which subsumes the reference's
  iniThFAST/minThFAST retry logic.
* 3x3 non-max suppression via reduce_window.
* Spatial balancing: the quadtree's output contract is "at most one keypoint
  per leaf cell, strongest first, N total". We realize the same contract
  MXU/VPU-natively: one winner per fixed cell (segment argmax by reshape),
  then a global top-k over cell winners.

Everything is static-shaped; keypoint counts are padded with validity masks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, circularly ordered (dy, dx).
CIRCLE16: Tuple[Tuple[int, int], ...] = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def fast_margin(img: jax.Array) -> jax.Array:
    """Per-pixel FAST-9 corner margin (H, W), 0 where not a corner at t=0.

    margin = max over the two polarities of
             max over 16 arc starts of
             min over the 9 contiguous circle differences.
    """
    shifted = jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for (dy, dx) in CIRCLE16],
        axis=0,
    )  # (16, H, W); shifted[k][y,x] = img[y+dy, x+dx]
    d = shifted - img[None]  # circle minus center

    def arc_margin(diff):
        # min over each window of 9 consecutive entries (circular) -> (16,H,W)
        m = diff
        for i in range(1, 9):
            m = jnp.minimum(m, jnp.roll(diff, -i, axis=0))
        return jnp.max(m, axis=0)

    bright = arc_margin(d)        # circle brighter than center
    dark = arc_margin(-d)         # circle darker than center
    return jnp.maximum(jnp.maximum(bright, dark), 0.0)


def nms3x3(score: jax.Array) -> jax.Array:
    """Keep only local maxima in a 3x3 window (score elsewhere -> 0)."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= mx, score, 0.0)


class LevelKeypoints(NamedTuple):
    yx: jax.Array       # (K, 2) float32 pixel coords at this level
    score: jax.Array    # (K,)
    valid: jax.Array    # (K,) bool


def detect_level(
    img: jax.Array,
    active_hw: Tuple[int, int],
    budget: int,
    min_th: float,
    border: int,
    cell: int = 16,
) -> LevelKeypoints:
    """Detect up to ``budget`` spatially balanced corners on one level.

    ``img`` may be a zero-padded full-size slot; ``active_hw`` is the level's
    true static extent.
    """
    return select_from_margin(
        nms3x3(fast_margin(img)), active_hw, budget, min_th, border, cell
    )


def select_from_margin(
    margin: jax.Array,
    active_hw: Tuple[int, int],
    budget: int,
    min_th: float,
    border: int,
    cell: int = 16,
) -> LevelKeypoints:
    """Spatially balanced top-k selection from a precomputed NMS'd margin
    map (use with the Pallas margin kernel, ops/pallas/fast_pallas.py)."""
    H, W = margin.shape
    h, w = active_hw

    # Mask borders and the padding region.
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    margin = jnp.where(ok & (margin > min_th), margin, 0.0)

    # One winner per (cell x cell) block.
    ch, cw = -(-H // cell), -(-W // cell)
    pad_h, pad_w = ch * cell - H, cw * cell - W
    m = jnp.pad(margin, ((0, pad_h), (0, pad_w)))
    blocks = m.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(
        ch, cw, cell * cell
    )
    cell_best = jnp.max(blocks, axis=-1)            # (ch, cw)
    cell_arg = jnp.argmax(blocks, axis=-1)          # (ch, cw)

    flat_score = cell_best.reshape(-1)
    k = min(budget, flat_score.shape[0])
    top_score, top_idx = jax.lax.top_k(flat_score, k)

    cy = top_idx // cw
    cx = top_idx % cw
    iy = cell_arg.reshape(-1)[top_idx] // cell
    ix = cell_arg.reshape(-1)[top_idx] % cell
    y = cy * cell + iy
    x = cx * cell + ix

    valid = top_score > 0.0
    yx = jnp.stack([y, x], axis=-1).astype(jnp.float32)
    if k < budget:  # pad to the static budget
        pad = budget - k
        yx = jnp.concatenate([yx, jnp.zeros((pad, 2), jnp.float32)])
        top_score = jnp.concatenate([top_score, jnp.zeros(pad)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return LevelKeypoints(yx=yx, score=top_score, valid=valid)
