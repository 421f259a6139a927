"""SLIC superpixels + k-means depth clustering.

Replaces the reference's cluster module (src/cluster.cc:300-463: SLIC in
CIELAB with Sobel center fine-tune, 5 iterations; then k-means k=15 over
superpixel centers with normalized image+depth distance) which powers the
geometric stage of dynamic rejection (Frame::CalDyna, src/Frame.cc:517).

TPU-native shape: the pointer-chasing per-pixel label propagation becomes an
iterated *local argmin* -- each pixel evaluates the 9 superpixel centers of
its 3x3 cell neighbourhood (gathered as 9 shifted center maps), and center
updates are segment-sums. k-means over centers is a dense (C, k) distance
argmin. Everything is static-shaped; iteration counts are fixed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ClusterResult(NamedTuple):
    pixel_cluster: jax.Array   # (H, W) int32 in [0, k)
    pixel_super: jax.Array     # (H, W) int32 superpixel label
    center_cluster: jax.Array  # (G,) int32 k-means id per superpixel
    center_depth: jax.Array    # (G,) mean depth per superpixel


def slic_kmeans(
    gray: jax.Array,
    depth: jax.Array,
    cell: int = 16,
    compactness: float = 10.0,
    slic_iters: int = 5,
    k: int = 15,
    kmeans_iters: int = 10,
) -> ClusterResult:
    H, W = gray.shape
    gh, gw = H // cell, W // cell
    G = gh * gw

    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    cy = jnp.clip((ys / cell).astype(jnp.int32), 0, gh - 1)
    cx = jnp.clip((xs / cell).astype(jnp.int32), 0, gw - 1)

    # initial centers: cell centroids
    def seg_mean(values, labels, n):
        s = jax.ops.segment_sum(values.reshape(-1), labels.reshape(-1), n)
        c = jax.ops.segment_sum(jnp.ones_like(values).reshape(-1),
                                labels.reshape(-1), n)
        return s / jnp.maximum(c, 1.0)

    init_label = cy * gw + cx
    c_y = seg_mean(ys, init_label, G)
    c_x = seg_mean(xs, init_label, G)
    c_i = seg_mean(gray, init_label, G)

    # intensity scale ~ compactness m: D^2 = (di/m)^2 + (ds/cell)^2
    inv_m2 = 1.0 / (compactness * compactness)
    inv_s2 = 1.0 / (cell * cell)

    label = init_label
    for _ in range(slic_iters):
        best_d = jnp.full((H, W), jnp.inf)
        best_l = label
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny = jnp.clip(cy + dy, 0, gh - 1)
                nx = jnp.clip(cx + dx, 0, gw - 1)
                l = ny * gw + nx
                dyy = ys - c_y[l]
                dxx = xs - c_x[l]
                dii = gray - c_i[l]
                D = (dyy * dyy + dxx * dxx) * inv_s2 + dii * dii * inv_m2
                take = D < best_d
                best_d = jnp.where(take, D, best_d)
                best_l = jnp.where(take, l, best_l)
        label = best_l
        c_y = seg_mean(ys, label, G)
        c_x = seg_mean(xs, label, G)
        c_i = seg_mean(gray, label, G)

    c_d = seg_mean(depth, label, G)

    # ---- k-means over superpixel centers: (x, y, depth), normalized ------
    feat = jnp.stack(
        [c_x / W, c_y / H, c_d / jnp.maximum(jnp.max(c_d), 1e-6)], axis=-1
    )  # (G, 3) -- the reference's "normalized image distance + normalized
       # depth distance" metric (src/cluster.cc:372-385)
    stride = max(G // k, 1)
    centers = feat[:: stride][:k]
    if centers.shape[0] < k:
        centers = jnp.concatenate(
            [centers, jnp.tile(centers[-1:], (k - centers.shape[0], 1))]
        )

    def km_step(centers, _):
        d = jnp.sum((feat[:, None, :] - centers[None]) ** 2, axis=-1)  # (G,k)
        a = jnp.argmin(d, axis=-1)
        one_hot = jax.nn.one_hot(a, k, dtype=feat.dtype)               # (G,k)
        sums = one_hot.T @ feat                                         # (k,3)
        cnt = jnp.sum(one_hot, axis=0)
        new_c = sums / jnp.maximum(cnt[:, None], 1.0)
        new_c = jnp.where(cnt[:, None] > 0, new_c, centers)
        return new_c, a

    centers, assign = jax.lax.scan(km_step, centers, None, length=kmeans_iters)
    center_cluster = assign[-1]

    return ClusterResult(
        pixel_cluster=center_cluster[label],
        pixel_super=label,
        center_cluster=center_cluster,
        center_depth=c_d,
    )


def dilate_mask(mask: jax.Array, radius: int) -> jax.Array:
    """Binary dilation with a (2r+1)^2 square structuring element via
    max-pool (the reference dilates the person mask with radius 15 before
    keypoint removal, src/ORBextractor.cc:1697-1704)."""
    m = mask.astype(jnp.float32)
    size = 2 * radius + 1
    out = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME"
    )
    return out > 0.5
