"""Image pyramid construction.

Replaces ORBextractor::ComputePyramid (reference src/ORBextractor.cc:1826):
8 levels at scale factor 1.2 with border replication. TPU-native form: the
levels live in one stacked (L, H0, W0) array — each level bilinearly resized
into the top-left corner of a full-size slot — so downstream per-keypoint
gathers can index (level, y, x) with a single flat `take`, which XLA lowers
to one gather instead of eight.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import ORBConfig


def build_pyramid(
    image: jax.Array, level_sizes: Sequence[Tuple[int, int]]
) -> jax.Array:
    """image (H0, W0) float32 -> stacked pyramid (L, H0, W0).

    Levels beyond their (h_l, w_l) extent are zero; consumers mask by the
    static per-level sizes.
    """
    H0, W0 = image.shape
    # accept uint8 frames: the cast is a free fused op here, and staging
    # uint8 instead of float32 halves host->device input bandwidth (the
    # axon tunnel moves ~1-3 MB/s; a 640x480 f32 frame is 1.2 MB)
    image = image.astype(jnp.float32)
    levels = [image]
    for (h, w) in level_sizes[1:]:
        # resize from the previous level like the reference (cv::resize of
        # mvImagePyramid[level-1]), which low-passes progressively.
        prev = levels[-1]
        ph, pw = level_sizes[len(levels) - 1]
        lv = jax.image.resize(prev[:ph, :pw], (h, w), method="bilinear")
        levels.append(_pad_to(lv, H0, W0))
    levels[0] = _pad_to(image, H0, W0)
    return jnp.stack(levels, axis=0)


def _pad_to(img: jax.Array, H: int, W: int) -> jax.Array:
    h, w = img.shape
    return jnp.pad(img, ((0, H - h), (0, W - w)))


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur over the last two axes.

    The reference blurs each level before descriptor sampling
    (src/ORBextractor.cc:1525-1541, GaussianBlur 7x7 sigma 2). Implemented as
    two 1-D convolutions; XLA fuses these into efficient VPU code.
    """
    r = ksize // 2
    xs = jnp.arange(-r, r + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / jnp.sum(k)

    def conv1d(x, axis):
        # replicate-pad then weighted sum of static shifts: cheap, fusable,
        # and avoids conv layout constraints for single-channel images.
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        for i in range(ksize):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    return conv1d(conv1d(img, img.ndim - 1), img.ndim - 2)


def blur_pyramid(pyr: jax.Array) -> jax.Array:
    """Blur all levels of a stacked pyramid (L, H, W)."""
    return gaussian_blur(pyr)
