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

    Per-keypoint 31x31 patch gathers. (A dense-convolution formulation was
    tried and measured 16x SLOWER on TPU v5e -- XLA lowers a 31x31
    single-channel conv poorly, ~100 ms for the 8-level pyramid, while the
    N*31*31 gather runs in ~2 ms. Keep the gathers.)

    Args:
      pyr: (L, H, W) stacked pyramid (unblurred, like the reference).
      level: (N,) int32 pyramid level per keypoint.
      yx: (N, 2) float32 keypoint coords at that level.
    Returns:
      (N,) float32 angle in radians.
    """
    L, H, W = pyr.shape
    flat = pyr.reshape(-1)
    r = PATCH_R
    dy = jnp.arange(-r, r + 1)
    gy, gx = jnp.meshgrid(dy, dy, indexing="ij")           # (31, 31)
    circ = (gy * gy + gx * gx) <= r * r

    y0 = jnp.round(yx[:, 0]).astype(jnp.int32)
    x0 = jnp.round(yx[:, 1]).astype(jnp.int32)
    yy = y0[:, None, None] + gy[None]
    xx = x0[:, None, None] + gx[None]
    patch = _flat_take(flat, H, W, level[:, None, None], yy, xx)
    patch = patch * circ[None]
    m01 = jnp.sum(patch * gy[None], axis=(1, 2))
    m10 = jnp.sum(patch * gx[None], axis=(1, 2))
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
