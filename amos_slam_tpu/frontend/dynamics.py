"""Two-stage dynamic-object rejection: the Amos-SLAM differentiator.

Stage 1 (semantic prior) is the segmentation mask (models/segmenter);
stage 2 (geometric) is this module -- the TPU-native equivalent of
Tracking::GetSceneFlowObj (reference src/Tracking.cc:850-1186) fused with
Frame::CalDyna (src/Frame.cc:517-667) into ONE jitted program:

  1. pyramidal LK flow on the previous frame's corners      (:896)
  2. batched F-RANSAC; epipolar residual > 1 px => T_M set  (:927-945, :1133)
  3. back-project tracks via previous depth; batched PnP-RANSAC pose vs the
     motion-model pose, arbitrated by inlier count          (:963-1131)
  4. per-point reprojection errors (mvRpe) under the winner (:1023)
  5. 3D scene flow magnitudes (vFlow_3d)                    (:1149-1184)
  6. SLIC + k-means depth clusters on the current frame     (Frame.cc:525)
  7. per-cluster aggregation: epipolar votes AND mean RPE >= 3 marks the
     cluster dynamic                                        (Frame.cc:626)
  8. final suppression mask = dilated segmentation mask UNION dynamic
     cluster pixels (MovingKeyPoints, ORBextractor.cc:1688-1745)

The mask feeds ORBPipeline.describe, which drops keypoints before
descriptor computation -- the same split the reference added to ORB-SLAM2.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DynamicsConfig
from ..geometry import se3
from ..geometry.camera import Camera, backproject
from ..ops.lk import lk_flow
from ..ops.slic import slic_kmeans, dilate_mask
from ..solvers.fundamental import ransac_fundamental
from ..solvers.pnp import ransac_pnp

_P = jax.lax.Precision.HIGHEST


class DynamicsResult(NamedTuple):
    suppress_mask: jax.Array    # (H, W) bool -- drop keypoints here
    dynamic_cluster: jax.Array  # (k,) bool
    pixel_cluster: jax.Array    # (H, W) int32
    epi_outlier: jax.Array      # (N,) bool  (the reference's T_M set)
    rpe: jax.Array              # (N,) float32 per-track reprojection error
    flow3d: jax.Array           # (N,) float32 scene-flow magnitude
    flow_pts1: jax.Array        # (N, 2) tracked positions in current frame
    flow_valid: jax.Array       # (N,) bool
    T_used: jax.Array           # (4, 4) arbitration winner
    used_pnp: jax.Array         # () bool


def _reproj_err(cam: Camera, T: jax.Array, pts_w: jax.Array, uv: jax.Array):
    pc = se3.transform_points(T, pts_w)
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    return jnp.sqrt((u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2), pc[..., 2]


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "slic_cell", "slic_iters", "dilate_radius"),
)
def compute_dynamics(
    cam: Camera,
    prev_gray: jax.Array,
    prev_depth: jax.Array,
    cur_gray: jax.Array,
    cur_depth: jax.Array,
    seg_mask: jax.Array,        # (H, W) stage-1 semantic mask (0/1)
    last_Tcw: jax.Array,
    T_pred: jax.Array,          # motion-model pose of the current frame
    flow_pts: jax.Array,        # (N, 2) (x, y) corners in the previous frame
    flow_pts_valid: jax.Array,  # (N,)
    key: jax.Array,
    epi_outlier_th: float = 1.0,
    mean_rpe_th: float = 3.0,
    flow3d_th: float = 3.0,
    n_clusters: int = 15,
    slic_cell: int = 16,
    slic_iters: int = 5,
    dilate_radius: int = 15,
    slic_compactness: float = 10.0,
    track_err_th: float = 12.0,
) -> DynamicsResult:
    H, W = cur_gray.shape
    N = flow_pts.shape[0]
    k1, k2 = jax.random.split(key)

    # 1. optical flow + the reference's neighbourhood-SAD quality gate
    # (src/Tracking.cc:902-924): tracks whose window residual stays high are
    # appearance failures -- typically disocclusion trails behind a moving
    # object -- and must not vote, or the trail's background clusters get
    # flagged dynamic.
    # subsample flow sources: 512 well-spread corners carry the same
    # epipolar/cluster-vote signal at half the LK gather cost
    N_all = flow_pts.shape[0]
    if N_all > 512:
        flow_pts = flow_pts[::2][:512]
        flow_pts_valid = flow_pts_valid[::2][:512]
    flow = lk_flow(prev_gray, cur_gray, flow_pts, flow_pts_valid)
    good_track = flow.valid & (flow.err < track_err_th)

    # 2. epipolar residuals under robust F (fit on well-tracked points only)
    fres = ransac_fundamental(flow_pts, flow.pts1, good_track, k1)
    epi_out = (fres.dist > epi_outlier_th) & good_track

    # 3. 3D from the previous frame's depth; PnP vs motion-model arbitration
    xi = jnp.clip(jnp.round(flow_pts[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(flow_pts[:, 1]).astype(jnp.int32), 0, H - 1)
    d0 = prev_depth[yi, xi]
    has3d = good_track & (d0 > 0)
    pc0 = backproject(cam, flow_pts, jnp.maximum(d0, 1e-3))
    pts_w = se3.transform_points(se3.inv_T(last_Tcw), pc0)

    pnp = ransac_pnp(cam, pts_w, flow.pts1, has3d, k2)
    err_pred, _ = _reproj_err(cam, T_pred, pts_w, flow.pts1)
    n_pred = jnp.sum((err_pred < 2.0) & has3d)
    use_pnp = pnp.ok & (pnp.num_inliers > n_pred)
    T_used = jnp.where(use_pnp, pnp.Tcw, T_pred)

    # 4. per-point RPE under the winner (the reference's mvRpe)
    rpe, _ = _reproj_err(cam, T_used, pts_w, flow.pts1)
    rpe = jnp.where(has3d, rpe, 0.0)

    # 5. 3D scene flow: current-depth backprojection vs previous-frame point
    x1i = jnp.clip(jnp.round(flow.pts1[:, 0]).astype(jnp.int32), 0, W - 1)
    y1i = jnp.clip(jnp.round(flow.pts1[:, 1]).astype(jnp.int32), 0, H - 1)
    d1 = cur_depth[y1i, x1i]
    pc1 = backproject(cam, flow.pts1, jnp.maximum(d1, 1e-3))
    pts_w1 = se3.transform_points(se3.inv_T(T_used), pc1)
    flow3d = jnp.linalg.norm(pts_w1 - pts_w, axis=-1)
    flow3d = jnp.where(has3d & (d1 > 0), flow3d, 0.0)

    # Depth-consistency vote gate: a genuinely tracked moving surface keeps
    # (roughly) its depth between frames, while disocclusion-trail failures
    # land on background at a very different depth than their source 3D
    # point predicts. Without this, the trail's background clusters collect
    # votes and get suppressed wholesale.
    z_pred = se3.transform_points(T_used, pts_w)[..., 2]
    depth_consistent = (d1 > 0) & (
        jnp.abs(d1 - z_pred) < 0.3 * jnp.maximum(z_pred, 1e-3)
    )
    epi_vote = epi_out & has3d & depth_consistent

    # 6. depth clusters on the current frame
    cl = slic_kmeans(
        cur_gray, cur_depth, cell=slic_cell, compactness=slic_compactness,
        slic_iters=slic_iters, k=n_clusters,
    )

    # 7. per-cluster votes + mean RPE (CalDyna's rmVector rule)
    pt_cluster = cl.pixel_cluster[y1i, x1i]
    w3 = has3d.astype(jnp.float32)
    rpe_sum = jax.ops.segment_sum(rpe * w3, pt_cluster, num_segments=n_clusters)
    rpe_cnt = jax.ops.segment_sum(w3, pt_cluster, num_segments=n_clusters)
    mean_rpe = rpe_sum / jnp.maximum(rpe_cnt, 1.0)
    votes = jax.ops.segment_sum(
        epi_vote.astype(jnp.float32), pt_cluster, num_segments=n_clusters
    )
    dynamic_cluster = (votes > 0) & (mean_rpe >= mean_rpe_th) & (rpe_cnt >= 2)

    # 8. final suppression mask
    dyn_pix = dynamic_cluster[cl.pixel_cluster]
    seg_dil = dilate_mask(seg_mask, dilate_radius)
    suppress = seg_dil | dyn_pix

    return DynamicsResult(
        suppress_mask=suppress,
        dynamic_cluster=dynamic_cluster,
        pixel_cluster=cl.pixel_cluster,
        epi_outlier=epi_out,
        rpe=rpe,
        flow3d=flow3d,
        flow_pts1=flow.pts1,
        flow_valid=flow.valid,
        T_used=T_used,
        used_pnp=use_pnp,
    )
