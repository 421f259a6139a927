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


# ---------------------------------------------------------------------------
# Patch-based extraction (the TPU fast path).
#
# A flat per-sample gather (compute_descriptors above) costs ~6 ms for
# 1024x256x2 samples on v5e -- random scalar gathers are the slowest
# primitive on TPU. The patch formulation replaces it with:
#   1. ONE whole-patch gather per keypoint (lax.gather, slice_sizes=(1,P,P)),
#      which XLA lowers to block copies: ~4x cheaper per element, and the
#      patch feeds BOTH orientation and descriptors, so the IC_Angle
#      prefix-sum gathers disappear too.
#   2. Rotation quantized to N_BINS discrete angles; sampling then becomes a
#      CONSTANT one-hot matrix, so all bins' samples come from one
#      (N, P^2) @ (P^2, N_BINS*512) bf16 MXU matmul, and the keypoint's bin
#      is selected by a one-hot contraction. At 32 bins the angular step is
#      11.25 deg (+-5.6 deg error ~= 1.3 px arc at pattern radius 13),
#      the same order as the reference's integer rounding of rotated
#      offsets; the framework matches descriptors only against its own, so
#      the contract is cross-frame stability, validated by the matching and
#      ATE e2e suites.
# Net: orientation + descriptors in ~3.5 ms instead of ~8 ms.
# ---------------------------------------------------------------------------

FORCE_BLOCK_GATHER = False   # debug escape hatch: disable the dense TPU
                             # patch sampler (see gather_patches_dense)

PATCH_RAD = 18        # covers rotated pattern offsets: |round(R(theta) p)| <= 18
PATCH_SIZE = 37       # 2*PATCH_RAD+1; with the 19 px detection border, whole
                      # patches never clip against the image, so no center shift
N_ROT_BINS = 32


def _bin_sample_indices(pattern: np.ndarray, n_bins: int) -> np.ndarray:
    """(n_bins * 512,) int32 flat in-patch pixel index per (bin, sample).

    Entry b*512 + 2*s + j is the patch pixel of sample point j of bit s
    under rotation bin b (theta_b = -pi + b * 2pi/n_bins), replicating
    compute_descriptors' rotate-then-round at the quantized angle.
    """
    R, P = PATCH_RAD, PATCH_SIZE
    px = pattern[..., 0].astype(np.float64)       # (256, 2)
    py = pattern[..., 1].astype(np.float64)
    step = 2 * np.pi / n_bins
    out = np.zeros((n_bins, px.size), np.int32)
    for b in range(n_bins):
        th = -np.pi + b * step
        c, s = np.cos(th), np.sin(th)
        ix = np.clip(np.round(px * c - py * s).astype(np.int64) + R, 0, P - 1)
        iy = np.clip(np.round(px * s + py * c).astype(np.int64) + R, 0, P - 1)
        out[b] = (iy * P + ix).reshape(-1)
    return out.reshape(-1)


_SAMPLING_CACHE: dict = {}


def make_bin_sampling_matrix(
    pattern: np.ndarray, n_bins: int = N_ROT_BINS, seed_key=None
) -> jax.Array:
    """Device-resident (P^2, n_bins*512) bf16 one-hot sampling matrix.

    Built ON DEVICE from the compact (n_bins*512,) index vector -- shipping
    the expanded ~45 MB matrix from host cost ~0.5 s per System through the
    transfer tunnel. Cached per (seed_key, n_bins) so every System in a
    process shares one copy.
    """
    key = (seed_key, n_bins)
    if seed_key is not None and key in _SAMPLING_CACHE:
        return _SAMPLING_CACHE[key]
    P2 = PATCH_SIZE * PATCH_SIZE
    flat = jnp.asarray(_bin_sample_indices(pattern, n_bins))

    @jax.jit
    def build(idx):
        return (idx[None, :] == jnp.arange(P2)[:, None]).astype(jnp.bfloat16)

    M = build(flat)
    if seed_key is not None:
        _SAMPLING_CACHE[key] = M
    return M


def _orientation_weights() -> tuple[np.ndarray, np.ndarray]:
    """(P^2,) m10/m01 weight vectors over the reference's circular patch:
    column x contributes rows |y| <= floor(sqrt(15^2 - x^2)) (the umax
    extents of IC_Angle, src/ORBextractor.cc:108)."""
    R, P = PATCH_RAD, PATCH_SIZE
    d = np.arange(P) - R
    b = np.floor(np.sqrt(np.maximum(PATCH_R * PATCH_R - d * d, 0) + 1e-9))
    inside = (np.abs(d[:, None]) <= b[None, :]) & (
        np.abs(d[None, :]) <= PATCH_R
    )                                             # [y, x]
    w10 = (d[None, :] * inside).astype(np.float32).reshape(-1)
    w01 = (d[:, None] * inside).astype(np.float32).reshape(-1)
    return w10, w01


def gather_patches(pyr: jax.Array, level: jax.Array, yx: jax.Array) -> jax.Array:
    """(N, P, P) pixel patches centred on the keypoints, one block gather.

    yx is (N, 2) float32 (y, x) at the keypoint's own level; pyr is the
    stacked (L, H, W) pyramid. Start indices are clipped (gather mode
    'clip'); with the detection border >= PATCH_RAD+1 no clip ever shifts
    a patch in practice.
    """
    L, H, W = pyr.shape
    P = PATCH_SIZE
    y0 = jnp.round(yx[:, 0]).astype(jnp.int32) - PATCH_RAD
    x0 = jnp.round(yx[:, 1]).astype(jnp.int32) - PATCH_RAD
    starts = jnp.stack([level, y0, x0], axis=-1)
    return jax.lax.gather(
        pyr, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2)),
        slice_sizes=(1, P, P), mode="clip",
    )


def _onehot_matrix(start: jax.Array, P: int, size: int) -> jax.Array:
    """(N, P, size) bf16 exact one-hot selection matrix: row [n, i] selects
    index clip(start[n] + i, 0, size-1)."""
    b = start[:, None] + jnp.arange(P, dtype=jnp.int32)[None]
    idx = jnp.clip(b, 0, size - 1)[:, :, None]
    cols = jnp.arange(size, dtype=jnp.int32)[None, None, :]
    return (cols == idx).astype(jnp.bfloat16)


def gather_patches_dense(
    blurred: jax.Array,
    level_sizes,
    budgets,
    yx: jax.Array,
) -> jax.Array:
    """(N, P, P) keypoint patches via per-level one-hot MXU matmuls.

    TPU fast path for :func:`gather_patches`: a block lax.gather of 1024
    37x37 patches is DMA-latency-bound at ~1.5 ms on v5e; selecting the
    patch rows/columns with exact one-hot matrices turns the same access
    pattern into dense matmuls against each level image (~12 GMAC bf16 +
    ~0.1 GB streamed, ~0.3 ms). Patch values ride bf16 through the MXU --
    intensity quantization ~0.5/255 -- which both consumers absorb:
    orientation moments shift < 1e-3 rad (far under the descriptor path's
    11.25 deg rotation bins) and the descriptor sampler casts its patches
    to bf16 anyway (tests bound the comparator bit-flip rate vs the f32
    oracle).

    Requires the detect-keypoints layout contract: keypoints are ordered by
    level in static ``budgets``-sized groups (padding rows last), with
    ``yx`` at native level coordinates.
    """
    P = PATCH_SIZE
    N = yx.shape[0]
    outs = []
    off = 0
    for lvl, ((h, w), b) in enumerate(zip(level_sizes, budgets)):
        if b <= 0:
            continue
        img = blurred[lvl, :h, :w].astype(jnp.bfloat16)
        yxl = yx[off : off + b]
        y0 = jnp.round(yxl[:, 0]).astype(jnp.int32) - PATCH_RAD
        x0 = jnp.round(yxl[:, 1]).astype(jnp.int32) - PATCH_RAD
        Ry = _onehot_matrix(y0, P, h)
        Cx = _onehot_matrix(x0, P, w)
        rows = jnp.einsum(
            "nph,hw->npw", Ry, img, preferred_element_type=jnp.float32
        )
        outs.append(
            jnp.einsum(
                "npw,nqw->npq", rows.astype(jnp.bfloat16), Cx,
                preferred_element_type=jnp.float32,
            )
        )
        off += b
    pad = N - off
    if pad > 0:
        outs.append(jnp.zeros((pad, P, P), jnp.float32))
    return jnp.concatenate(outs)


def orientations_from_patches(patches: jax.Array) -> jax.Array:
    """Intensity-centroid angle per patch (same moment sums as IC_Angle)."""
    w10, w01 = _orientation_weights()
    flat = patches.reshape(patches.shape[0], -1)
    m10 = flat @ jnp.asarray(w10)
    m01 = flat @ jnp.asarray(w01)
    return jnp.arctan2(m01, m10)


def descriptors_from_patches(
    patches: jax.Array, angle: jax.Array, M: jax.Array,
    n_bins: int = N_ROT_BINS,
) -> jax.Array:
    """Rotated-BRIEF bitplanes from pre-gathered patches.

    patches: (N, P, P) float32 blurred-intensity patches;
    angle: (N,) radians; M: device copy of make_bin_sampling_matrix.
    Returns (N, 256) int8 in {0, 1}.

    The patch intensities are cast to bfloat16 (8-bit significand) before
    the sampling matmul so it rides the MXU: values quantize to ~1/256
    relative precision, and comparator bits for near-equal sample pairs can
    flip versus the float32 :func:`compute_descriptors` path. That path
    remains the parity oracle (tests bound the bit-flip rate between the
    two); self-matching stays exact because both frames quantize alike.
    """
    N = patches.shape[0]
    step = 2 * jnp.pi / n_bins
    bins = jnp.round((angle + jnp.pi) / step).astype(jnp.int32) % n_bins
    flat = patches.reshape(N, -1).astype(jnp.bfloat16)
    samples = jnp.dot(flat, M, preferred_element_type=jnp.float32)
    sb = samples.reshape(N, n_bins, -1)
    onehot = (bins[:, None] == jnp.arange(n_bins)[None]).astype(jnp.float32)
    vals = jnp.einsum("nb,nbs->ns", onehot, sb).reshape(N, -1, 2)
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
