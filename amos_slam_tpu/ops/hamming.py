"""Hamming-distance descriptor matching on the MXU.

Replaces ORBmatcher::DescriptorDistance's 8x32-bit popcount loop and every
grid-windowed candidate scan around it (reference src/ORBmatcher.cc:1913 and
the SearchBy* family). The TPU-native formulation: descriptors are {0,1} int8
bitplanes, and for binary vectors

    hamming(a, b) = sum(a) + sum(b) - 2 a.b

so a full (N, M) distance matrix is ONE int8 matmul (a @ b.T on the MXU) plus
rank-1 corrections. At N = M = 1024, that is a 1024x256x1024 int8 matmul --
microseconds on a TPU -- which replaces the reference's pointer-chasing
64x48-grid candidate windows entirely: windowing becomes a *mask added to the
distance matrix*, not a data structure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 20)  # "infinite" distance for masked pairs


def hamming_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 256) x (M, 256) {0,1} int8 -> (N, M) int32 Hamming distances."""
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    na = jnp.sum(a.astype(jnp.int32), axis=-1)
    nb = jnp.sum(b.astype(jnp.int32), axis=-1)
    return na[:, None] + nb[None, :] - 2 * dot


class MatchResult(NamedTuple):
    idx: jax.Array      # (N,) int32 best column per row (-1 = no match)
    dist: jax.Array     # (N,) int32 best distance (BIG where unmatched)
    valid: jax.Array    # (N,) bool


def match(
    dist: jax.Array,
    max_dist: int = 50,
    nn_ratio: float = 1.0,
    mutual: bool = True,
    angle_q: jax.Array | None = None,
    angle_t: jax.Array | None = None,
    hist_bins: int = 30,
    hist_keep: int = 3,
) -> MatchResult:
    """Row-to-column matching with the reference matcher's gates.

    Args:
      dist: (N, M) int32 distance matrix, pre-masked with +BIG for pairs
        outside the projection/grid window (the window predicate is the
        caller's responsibility -- it is geometry, not descriptor logic).
      max_dist: TH_LOW/TH_HIGH absolute gate (ORBmatcher.h:213-214).
      nn_ratio: best < ratio * second-best gate (mfNNratio).
      mutual: also require row to be the argmin of its matched column.
      angle_q/angle_t: optional (N,)/(M,) keypoint orientations (radians);
        when given, only matches whose orientation difference falls in the
        ``hist_keep`` most popular of ``hist_bins`` bins are kept
        (ORBmatcher::ComputeThreeMaxima rotation-consistency check,
        src/ORBmatcher.cc:1864-1911).
    """
    N, M = dist.shape
    neg = -dist  # top_k gives largest; we need two smallest distances
    top2, idx2 = jax.lax.top_k(neg, 2)
    best = -top2[:, 0]
    second = -top2[:, 1]
    bidx = idx2[:, 0]

    ok = best <= max_dist
    if nn_ratio < 1.0:
        ok &= best.astype(jnp.float32) < nn_ratio * second.astype(jnp.float32)
    if mutual:
        col_best_row = jnp.argmin(dist, axis=0)        # (M,)
        ok &= col_best_row[bidx] == jnp.arange(N)

    if angle_q is not None and angle_t is not None:
        two_pi = 2.0 * jnp.pi
        ang = jnp.mod(angle_q - angle_t[bidx], two_pi)
        bin_id = jnp.clip(
            (ang * (hist_bins / two_pi)).astype(jnp.int32), 0, hist_bins - 1
        )
        counts = jnp.zeros(hist_bins, jnp.int32).at[bin_id].add(
            ok.astype(jnp.int32)
        )
        _, keep_bins = jax.lax.top_k(counts, hist_keep)
        in_keep = jnp.any(bin_id[:, None] == keep_bins[None, :], axis=-1)
        ok &= in_keep

    return MatchResult(
        idx=jnp.where(ok, bidx, -1),
        dist=jnp.where(ok, best, BIG),
        valid=ok,
    )


def window_mask(
    query_uv: jax.Array,
    target_uv: jax.Array,
    radius,
    query_valid: jax.Array,
    target_valid: jax.Array,
) -> jax.Array:
    """(N, M) bool: target j within ``radius`` px of query i's predicted
    location. This is the TPU replacement of Frame::GetFeaturesInArea's
    64x48 grid lookup (src/Frame.cc:894)."""
    d = query_uv[:, None, :] - target_uv[None, :, :]
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    if r2.ndim == 1:
        r2 = r2[:, None]
    inside = jnp.sum(d * d, axis=-1) <= r2
    return inside & query_valid[:, None] & target_valid[None, :]


def apply_mask(dist: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.where(mask, dist, BIG)
