"""Keypoint orientation (intensity centroid) and rotated-BRIEF descriptors.

TPU-native replacement for IC_Angle + computeOrbDescriptor (reference
src/ORBextractor.cc:108, :173). Differences by design, not accident:

* The 256-pair sampling pattern is *generated* (seeded Gaussian pairs, the
  original BRIEF recipe) rather than the learned OpenCV table. The framework
  is self-consistent -- descriptors only ever match against descriptors
  produced here -- so pattern identity with OpenCV is not required for SLAM
  accuracy, and a generated pattern keeps this implementation clean-room.
* Descriptors are stored as {0,1} int8 *bitplanes* (N, 256), the TPU-native
  layout: Hamming distance then becomes an int8 matmul on the MXU
  (see ops/hamming.py) instead of XOR+popcount loops. A packed uint32 (N, 8)
  form is provided for storage/BoW.
* All per-keypoint sampling is expressed as one flat gather into the stacked
  (L, H, W) pyramid, indexed (level, y, x).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

PATCH_R = 15          # IC_Angle patch radius (reference HALF_PATCH_SIZE)
PATTERN_CLIP = 13     # max |coordinate| of BRIEF sample points


def make_brief_pattern(seed: int, n_bits: int = 256) -> np.ndarray:
    """(n_bits, 2, 2) int32: two (x, y) sample points per bit.

    Gaussian BRIEF pattern (sigma = patch/5), clipped to +-PATTERN_CLIP,
    deterministic in ``seed``. Duplicate-pair collisions are statistically
    negligible (and harmless).
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, (2 * PATTERN_CLIP + 1) / 5.0, size=(n_bits, 2, 2))
    return np.clip(np.round(pts), -PATTERN_CLIP, PATTERN_CLIP).astype(np.int32)


def _flat_take(pyr_flat: jax.Array, H: int, W: int, level, y, x):
    """Gather pyr[(level, y, x)] with clamped coordinates."""
    y = jnp.clip(y, 0, H - 1)
    x = jnp.clip(x, 0, W - 1)
    idx = (level * H + y) * W + x
    return jnp.take(pyr_flat, idx)


def compute_orientations(
    pyr: jax.Array, level: jax.Array, yx: jax.Array
) -> jax.Array:
    """Intensity-centroid angles (radians) for keypoints.

    Exact circular-patch moments via prefix sums: for each column offset dx
    of the radius-15 disc, the column's contribution to m10 is
    dx * (vertical box sum of height 2*b(dx)+1), and a vertical box sum is
    one difference of the column-prefix-summed pyramid. m01 is symmetric
    with horizontal prefix sums. That is 4*31 gathers per keypoint instead
    of 31*31 (patch version: 8 ms on v5e; this: ~1 ms). Results match the
    reference IC_Angle sums exactly (src/ORBextractor.cc:108, same per-
    column extents as its umax table).

    (A dense 31x31 convolution was also tried: 16x slower than even the
    patch gathers -- XLA lowers single-channel large-kernel convs poorly.)

    Args:
      pyr: (L, H, W) stacked pyramid (unblurred, like the reference).
      level: (N,) int32 pyramid level per keypoint.
      yx: (N, 2) float32 keypoint coords at that level.
    Returns:
      (N,) float32 angle in radians.
    """
    L, H, W = pyr.shape
    r = PATCH_R
    dxs = np.arange(-r, r + 1)
    bs = np.floor(np.sqrt(r * r - dxs * dxs + 1e-9)).astype(np.int64)

    # exclusive prefix sums (shape (L, H+1, W) / (L, H, W+1)) so a box sum
    # over rows [a, b] is Pv[b+1] - Pv[a]
    Pv = jnp.concatenate(
        [jnp.zeros((L, 1, W), pyr.dtype), jnp.cumsum(pyr, axis=1)], axis=1
    )
    Ph = jnp.concatenate(
        [jnp.zeros((L, H, 1), pyr.dtype), jnp.cumsum(pyr, axis=2)], axis=2
    )

    y0 = jnp.round(yx[:, 0]).astype(jnp.int32)
    x0 = jnp.round(yx[:, 1]).astype(jnp.int32)

    dx_j = jnp.asarray(dxs, jnp.int32)          # (31,)
    b_j = jnp.asarray(bs, jnp.int32)

    # m10: columns x0+dx, rows [y0-b, y0+b] via vertical prefix sums
    xx = jnp.clip(x0[:, None] + dx_j[None], 0, W - 1)          # (N, 31)
    ytop = jnp.clip(y0[:, None] - b_j[None], 0, H)             # (N, 31)
    ybot = jnp.clip(y0[:, None] + b_j[None] + 1, 0, H)
    flatV = Pv.reshape(-1)
    base = level[:, None] * (H + 1) * W
    colsum = (
        flatV[base + ybot * W + xx] - flatV[base + ytop * W + xx]
    )
    m10 = jnp.sum(colsum * dx_j[None].astype(pyr.dtype), axis=1)

    # m01: rows y0+dy, cols [x0-b, x0+b] via horizontal prefix sums
    yy = jnp.clip(y0[:, None] + dx_j[None], 0, H - 1)
    xleft = jnp.clip(x0[:, None] - b_j[None], 0, W)
    xright = jnp.clip(x0[:, None] + b_j[None] + 1, 0, W)
    flatH = Ph.reshape(-1)
    baseH = level[:, None] * H * (W + 1)
    rowsum = (
        flatH[baseH + yy * (W + 1) + xright]
        - flatH[baseH + yy * (W + 1) + xleft]
    )
    m01 = jnp.sum(rowsum * dx_j[None].astype(pyr.dtype), axis=1)
    return jnp.arctan2(m01, m10)


def compute_descriptors(
    blurred_pyr: jax.Array,
    level: jax.Array,
    yx: jax.Array,
    angle: jax.Array,
    pattern: jax.Array,
) -> jax.Array:
    """Rotated BRIEF bitplane descriptors.

    Args:
      blurred_pyr: (L, H, W) Gaussian-blurred pyramid.
      level: (N,) int32; yx: (N, 2) float32 level coords; angle: (N,) rad.
      pattern: (256, 2, 2) int32 from :func:`make_brief_pattern`.
    Returns:
      (N, 256) int8 in {0, 1}.
    """
    L, H, W = blurred_pyr.shape
    flat = blurred_pyr.reshape(-1)
    c, s = jnp.cos(angle), jnp.sin(angle)                  # (N,)

    px = pattern[..., 0].astype(jnp.float32)               # (256, 2)
    py = pattern[..., 1].astype(jnp.float32)
    # rotate pattern by keypoint angle (reference GET_VALUE rotation)
    rx = px[None] * c[:, None, None] - py[None] * s[:, None, None]
    ry = px[None] * s[:, None, None] + py[None] * c[:, None, None]
    xs = jnp.round(yx[:, 1, None, None] + rx).astype(jnp.int32)  # (N, 256, 2)
    ys = jnp.round(yx[:, 0, None, None] + ry).astype(jnp.int32)

    vals = _flat_take(flat, H, W, level[:, None, None], ys, xs)  # (N, 256, 2)
    return (vals[..., 0] < vals[..., 1]).astype(jnp.int8)


def pack_bits(desc_bits: jax.Array) -> jax.Array:
    """(N, 256) {0,1} int8 -> (N, 8) uint32 packed (bit i of word w = bit
    32*w + i). For storage, checkpointing, and vocabulary files."""
    n = desc_bits.shape[-1]
    words = desc_bits.reshape(desc_bits.shape[:-1] + (n // 32, 32))
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(words.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) int8 bitplanes."""
    bits = (packed[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    return bits.reshape(packed.shape[:-1] + (-1,)).astype(jnp.int8)
