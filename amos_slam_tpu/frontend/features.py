"""Frame feature extraction: the ORB front-end pipeline.

Replaces the reference's Frame construction path (src/Frame.cc:244-667 and
ORBextractor::operator() src/ORBextractor.cc:1544/1672) with two jitted
stages mirroring the Amos split pipeline:

  1. :func:`detect_keypoints` -- pyramid + FAST + spatial balancing + IC
     orientation (ExtractORBKeyPoints, src/Frame.cc:287/480).
  2. :func:`describe` -- optional dynamic-mask keypoint suppression
     (MovingKeyPoints, src/ORBextractor.cc:1688) followed by rBRIEF
     descriptors, undistortion, and RGB-D stereo synthesis
     (ExtractORBDesp + ComputeStereoFromRGBD, src/Frame.cc:491/636/1576).

The split exists because Amos-SLAM deletes keypoints on dynamic objects
*between* detection and description. Both stages operate on one static
(MAX_KPTS,)-padded keypoint set; deletion is a mask update, not a resize.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ORBConfig, CameraConfig
from ..geometry.camera import Camera, undistort_points
from ..ops import fast as fast_ops
from ..ops import pyramid as pyr_ops
from ..ops import orb_descriptor as orb_ops


class Keypoints(NamedTuple):
    """Padded keypoint set (capacity = ORBConfig.max_kpts)."""

    xy: jax.Array          # (K, 2) float32, level-0 pixel coords (x, y), raw
    level: jax.Array       # (K,) int32
    response: jax.Array    # (K,) float32 FAST margin
    angle: jax.Array       # (K,) float32 radians
    yx_level: jax.Array    # (K, 2) float32 coords at native level (y, x)
    valid: jax.Array       # (K,) bool


class FrameFeatures(NamedTuple):
    """Everything tracking needs from one image (reference Frame fields)."""

    kp: Keypoints
    xy_un: jax.Array       # (K, 2) float32 undistorted level-0 coords
    desc: jax.Array        # (K, 256) int8 bitplanes
    depth: jax.Array       # (K,) float32 (<=0: none)   [mvDepth]
    u_right: jax.Array     # (K,) float32 (<0: mono)    [mvuRight]
    inv_sigma2: jax.Array  # (K,) float32 per-level information
    valid: jax.Array       # (K,) bool (post mask suppression)


def _camera(cfg: CameraConfig) -> Camera:
    return Camera.create(
        cfg.fx, cfg.fy, cfg.cx, cfg.cy,
        dist=[cfg.k1, cfg.k2, cfg.p1, cfg.p2, cfg.k3],
        bf=cfg.bf, width=cfg.width, height=cfg.height,
    )


class ORBPipeline:
    """Static extraction context: precomputed sizes, budgets, pattern.

    Construct once per (image size, ORB config); the heavy methods are
    jit-compiled closures over the static geometry.
    """

    def __init__(self, orb: ORBConfig, cam_cfg: CameraConfig):
        self.orb = orb
        self.cam_cfg = cam_cfg
        self.cam = _camera(cam_cfg)
        self.sizes = orb.level_sizes(cam_cfg.width, cam_cfg.height)
        self.budgets = orb.level_budgets()
        self.capacity = orb.max_kpts
        self.scales = np.asarray(orb.level_scales(), np.float32)
        pattern_np = orb_ops.make_brief_pattern(orb.pattern_seed)
        self.pattern = jnp.asarray(pattern_np)
        # constant rotation-binned sampling matrix for the patch-based
        # descriptor path (bf16, built on device, cached per process)
        self.sampling_matrix = orb_ops.make_bin_sampling_matrix(
            pattern_np, seed_key=orb.pattern_seed
        )

    # Pipelines are static jit arguments. Hash/eq by CONFIG, not identity:
    # every derived field above is a pure function of (orb, cam_cfg), so two
    # pipelines with equal configs must share one compile-cache entry --
    # otherwise every new System instance recompiles the whole frame path
    # (minutes through a remote-compile tunnel).
    def __hash__(self):
        return hash((self.orb, self.cam_cfg))

    def __eq__(self, other):
        return (
            isinstance(other, ORBPipeline)
            and self.orb == other.orb
            and self.cam_cfg == other.cam_cfg
        )

    # -- stage 1 ----------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def detect_keypoints(self, image: jax.Array):
        """image (H, W) float32 [0,255] -> (Keypoints, pyramid, blurred)."""
        pyr = pyr_ops.build_pyramid(image, self.sizes)
        blurred = pyr_ops.blur_pyramid(pyr)

        # FAST margin + NMS for ALL levels: on TPU, one fused Pallas pass
        # over the stacked pyramid (one HBM read; ~190x the XLA formulation);
        # elsewhere, the portable XLA version. Level-slot boundary halo
        # contamination lands inside the detection border and is masked.
        L, H, W = pyr.shape
        if jax.default_backend() == "tpu":
            from ..ops.pallas.fast_pallas import fast_margin_nms

            margins = fast_margin_nms(pyr.reshape(L * H, W)).reshape(L, H, W)
        else:
            margins = jax.vmap(
                lambda im: fast_ops.nms3x3(fast_ops.fast_margin(im))
            )(pyr)

        per_level = []
        for lvl, ((h, w), budget) in enumerate(zip(self.sizes, self.budgets)):
            if budget <= 0:
                continue
            lk = fast_ops.select_from_margin(
                margins[lvl], (h, w), budget,
                min_th=self.orb.min_th_fast,
                border=self.orb.border,
                cell=self.orb.cell_size,
            )
            per_level.append((lvl, lk))

        yx = jnp.concatenate([lk.yx for _, lk in per_level])
        score = jnp.concatenate([lk.score for _, lk in per_level])
        valid = jnp.concatenate([lk.valid for _, lk in per_level])
        level = jnp.concatenate(
            [jnp.full((lk.yx.shape[0],), l, jnp.int32) for l, lk in per_level]
        )
        pad = self.capacity - yx.shape[0]
        if pad > 0:
            yx = jnp.pad(yx, ((0, pad), (0, 0)))
            score = jnp.pad(score, (0, pad))
            valid = jnp.pad(valid, (0, pad))
            level = jnp.pad(level, (0, pad))

        # ONE whole-patch sampling pass feeds both the intensity-centroid
        # orientation and the descriptor sampler (see ops/orb_descriptor.py
        # patch-path rationale). Patches come from the blurred pyramid; the
        # reference computes IC_Angle on the raw pyramid, but the centroid of
        # a Gaussian-blurred patch is the blurred centroid -- angle deviation
        # is sub-degree, validated by the matching/ATE suites. On TPU the
        # sampling runs as per-level one-hot MXU matmuls (the block gather
        # is DMA-latency-bound, ~1.5 ms of the frame program).
        if jax.default_backend() == "tpu" and not orb_ops.FORCE_BLOCK_GATHER:
            patches = orb_ops.gather_patches_dense(
                blurred, self.sizes, self.budgets, yx
            )
        else:
            patches = orb_ops.gather_patches(blurred, level, yx)
        angle = orb_ops.orientations_from_patches(patches)
        scale = jnp.asarray(self.scales)[level]
        xy0 = jnp.stack([yx[:, 1] * scale, yx[:, 0] * scale], axis=-1)
        kp = Keypoints(
            xy=xy0, level=level, response=score, angle=angle,
            yx_level=yx, valid=valid,
        )
        return kp, pyr, blurred, patches

    # -- stage 2 ----------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def describe(
        self,
        kp: Keypoints,
        patches: jax.Array,
        depth_image: Optional[jax.Array] = None,
        suppress_mask: Optional[jax.Array] = None,
    ) -> FrameFeatures:
        """Descriptors + undistortion + RGB-D stereo for surviving keypoints.

        patches: the (N, P, P) blurred patches from :meth:`detect_keypoints`.
        suppress_mask: optional (H, W) bool/int; keypoints whose level-0
        position lands on a nonzero pixel are dropped (the union of the
        dilated segmentation mask and dynamic clusters -- reference
        MovingKeyPoints, src/ORBextractor.cc:1688-1745).
        """
        valid = kp.valid
        H, W = self.cam_cfg.height, self.cam_cfg.width
        xi = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, H - 1)
        if suppress_mask is not None:
            hit = suppress_mask.astype(jnp.int32)[yi, xi] > 0
            valid = valid & ~hit

        desc = orb_ops.descriptors_from_patches(
            patches, kp.angle, self.sampling_matrix
        )
        xy_un = undistort_points(self.cam, kp.xy)

        if depth_image is not None:
            d = depth_image[yi, xi]
            has_d = (d > 0.0) & valid
            u_right = jnp.where(has_d, xy_un[:, 0] - self.cam.bf / jnp.maximum(d, 1e-6), -1.0)
            depth = jnp.where(has_d, d, -1.0)
        else:
            depth = jnp.full((self.capacity,), -1.0, jnp.float32)
            u_right = jnp.full((self.capacity,), -1.0, jnp.float32)

        inv_sigma2 = 1.0 / (jnp.asarray(self.scales)[kp.level] ** 2)
        return FrameFeatures(
            kp=kp, xy_un=xy_un, desc=desc, depth=depth, u_right=u_right,
            inv_sigma2=inv_sigma2, valid=valid,
        )

    def extract(self, image, depth_image=None, suppress_mask=None):
        """Convenience: full extraction in one call (non-dynamic path)."""
        kp, pyr, blurred, patches = self.detect_keypoints(image)
        return self.describe(kp, patches, depth_image, suppress_mask)
