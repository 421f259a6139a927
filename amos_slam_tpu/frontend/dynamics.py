"""Two-stage dynamic-object rejection: the Amos-SLAM differentiator.

Stage 1 (semantic prior) is the segmentation mask (models/segmenter);
stage 2 (geometric) is this module -- the TPU-native equivalent of
Tracking::GetSceneFlowObj (reference src/Tracking.cc:850-1186) fused with
Frame::CalDyna (src/Frame.cc:517-667) into ONE jitted program:

  1. pyramidal LK flow on the previous frame's corners      (:896)
  2. back-project tracks via previous depth; batched PnP-RANSAC pose vs the
     motion-model pose, arbitrated by inlier count under a velocity
     plausibility gate                                      (:963-1131)
  3. epipolar residual > 1 px => T_M set, under F derived from the winning
     pose (the reference fits F by RANSAC, :927-945, which inverts on
     texture-dominant movers -- see step 3 comment)         (:1133)
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
from ..solvers.fundamental import epipolar_distance
from ..solvers.pnp import ransac_pnp

_P = jax.lax.Precision.HIGHEST


class DynamicsResult(NamedTuple):
    suppress_mask: jax.Array    # (H, W) bool -- drop keypoints here
    geom_mask: jax.Array        # (H, W) bool -- the GEOMETRIC cluster part
                                # only (no stage-1 seg): the reusable
                                # portion under dyn_stride (cluster regions
                                # move slowly; the seg mask must be applied
                                # fresh every frame)
    dynamic_cluster: jax.Array  # (k,) bool
    pixel_cluster: jax.Array    # (H, W) int32
    epi_outlier: jax.Array      # (N,) bool  (the reference's T_M set)
    rpe: jax.Array              # (N,) float32 per-track reprojection error
    flow3d: jax.Array           # (N,) float32 scene-flow magnitude
    flow_pts1: jax.Array        # (N, 2) tracked positions in current frame
    flow_valid: jax.Array       # (N,) bool
    T_used: jax.Array           # (4, 4) arbitration winner
    used_pnp: jax.Array         # () bool
    gate_state: jax.Array       # (3,) EMA noise levels [rpe, epi, flow] --
                                # feed back as next frame's ``gate_state``


def _masked_quantile(x: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """q-quantile of x where mask, 0 if the mask is empty (static shapes)."""
    vals = jnp.sort(jnp.where(mask, x, jnp.inf))
    cnt = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.clip((cnt.astype(jnp.float32) * q).astype(jnp.int32),
                   0, x.shape[0] - 1)
    v = vals[idx]
    return jnp.where(cnt > 0, v, 0.0)


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    return _masked_quantile(x, mask, 0.5)


def _cluster_median(
    vals: jax.Array, member: jax.Array, pt_cluster: jax.Array, n_clusters: int
) -> jax.Array:
    """(C,) median of vals over each cluster's member tracks (0 if none).

    A per-cluster MEDIAN, not mean: on weak texture a handful of aliased
    LK tracks put 30+ px errors inside genuinely static clusters, and a
    mean-based statistic drags those clusters toward the dynamic gates
    (measured: static cluster means of 8-17 px vs track medians < 1 px on
    the weak-room suite).

    ONE sort for all clusters: tracks sort by the composite key
    (cluster, normalized value) -- non-members keyed past every cluster --
    and each cluster's median is then a 2-element pick at its rank offsets.
    The previous vmapped-nanmedian form batch-sorted the full track vector
    once PER CLUSTER (7 call sites x n_clusters sorts dominated the whole
    dynamics program at ~7 ms on v5e; this form is ~0.1 ms per call)."""
    N = vals.shape[0]
    c = jnp.where(member, pt_cluster, n_clusters)
    finite = jnp.isfinite(vals) & member
    v_m = jnp.where(finite, vals, 0.0)
    vmin = jnp.min(jnp.where(finite, v_m, jnp.inf))
    vmax = jnp.max(jnp.where(finite, v_m, -jnp.inf))
    span = jnp.maximum(vmax - vmin, 1e-20)
    vn = jnp.clip((v_m - vmin) / span, 0.0, 1.0)
    key = c.astype(jnp.float32) * 2.0 + jnp.where(finite, vn, 1.5)
    _, v_sorted = jax.lax.sort([key, v_m], num_keys=1)

    ones = jnp.ones(N, jnp.int32)
    cnt_all = jax.ops.segment_sum(ones, c, num_segments=n_clusters + 1)
    start = jnp.cumsum(cnt_all) - cnt_all                  # (C+1,)
    cnt = jax.ops.segment_sum(
        finite.astype(jnp.int32), pt_cluster, num_segments=n_clusters
    )
    lo = start[:n_clusters] + jnp.maximum(cnt - 1, 0) // 2
    hi = start[:n_clusters] + cnt // 2
    med = 0.5 * (
        v_sorted[jnp.clip(lo, 0, N - 1)] + v_sorted[jnp.clip(hi, 0, N - 1)]
    )
    return jnp.where(cnt > 0, med, 0.0)


def _reproj_err(cam: Camera, T: jax.Array, pts_w: jax.Array, uv: jax.Array):
    pc = se3.transform_points(T, pts_w)
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    return jnp.sqrt((u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2), pc[..., 2]


def _reproj_residual(cam: Camera, T: jax.Array, pts_w, uv) -> jax.Array:
    """(N, 2) SIGNED reprojection residual (projection - observation)."""
    pc = se3.transform_points(T, pts_w)
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    return jnp.stack([u - uv[..., 0], v - uv[..., 1]], axis=-1)


def _coherent_mag(
    res_vec: jax.Array, member: jax.Array, pt_cluster: jax.Array,
    n_clusters: int,
) -> jax.Array:
    """(C,) norm of the per-cluster MEDIAN residual VECTOR.

    The discriminator between a real mover and weak-texture LK aliasing:
    a rigid mover displaces all its tracks COHERENTLY, so the component
    medians preserve the full magnitude; aliased tracks jump in random
    lattice directions, so their signed components cancel under the median
    (measured on the weak-room suite: aliased static clusters carry
    median-of-|r| of 8-15 px but coherent magnitude < 1 px, while the
    mover keeps ~both at 23+ px)."""
    comps = [
        _cluster_median(res_vec[..., c], member, pt_cluster, n_clusters)
        for c in range(res_vec.shape[-1])
    ]
    return jnp.sqrt(sum(c * c for c in comps))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_clusters", "slic_cell", "slic_iters", "dilate_radius", "has_seg",
        "slic_downsample", "lk_levels", "lk_win", "lk_iters", "pnp_hypotheses",
        "lk_downsample",
    ),
)
def compute_dynamics(
    cam: Camera,
    prev_gray: jax.Array,
    prev_depth: jax.Array,
    cur_gray: jax.Array,
    cur_depth: jax.Array,
    seg_mask: jax.Array,        # (H, W) stage-1 semantic mask (any dtype)
    last_Tcw: jax.Array,
    velocity: jax.Array,        # constant-velocity model; the motion-model
                                # pose prediction T_pred = ortho(vel @ last)
                                # is computed INSIDE the program -- eager
                                # host-side pose math costs a tunnel
                                # dispatch round trip PER OP (~55 ms/frame
                                # measured in round 2)
    flow_pts: jax.Array,        # (N, 2) (x, y) corners in the previous frame
    flow_pts_valid: jax.Array,  # (N,)
    frame_idx,                  # () int -- folded into the RANSAC key
    epi_outlier_th: float = 1.0,
    mean_rpe_th: float = 3.0,
    flow3d_th: float = 0.04,    # meters/frame (~1.2 m/s at 30 fps)
    n_clusters: int = 15,
    slic_cell: int = 16,
    slic_iters: int = 5,
    dilate_radius: int = 15,
    slic_compactness: float = 10.0,
    track_err_th: float = 12.0,
    pnp_gate_rot: float = 0.06,    # rad/frame (~3.4 deg) PnP plausibility
    pnp_gate_trans: float = 0.15,  # m/frame (4.5 m/s at 30 fps)
    has_seg: bool = True,          # static: False compiles out stage 1
    slic_downsample: int = 1,      # static: SLIC resolution divisor
    lk_levels: int = 4,
    lk_win: int = 7,
    lk_iters: int = 6,
    lk_downsample: int = 1,        # static: track flow on 1/n-res frames
    pnp_hypotheses: int = 256,
    cur_rgb: Optional[jax.Array] = None,  # (H, W, 3) uint8/float RGB of the
                                # current frame; when given, SLIC runs in
                                # CIELAB like the reference
                                # (src/cluster.cc:88-146) instead of on
                                # grayscale -- chroma-distinct surfaces then
                                # get their own superpixels even when
                                # luma-matched to their background
    gate_state: Optional[jax.Array] = None,  # (3,) EMA noise levels from the
                                # PREVIOUS frame's result (see step 6). None
                                # (first frame / after reset): gates start
                                # at the absolute reference thresholds and
                                # the EMA warms up from measurements.
) -> DynamicsResult:
    H, W = cur_gray.shape
    N = flow_pts.shape[0]
    # uint8 frames are accepted (free fused cast; halves tunnel staging)
    prev_gray = prev_gray.astype(jnp.float32)
    cur_gray = cur_gray.astype(jnp.float32)
    seg_mask = seg_mask.astype(bool)
    T_pred = se3.orthonormalize(velocity @ last_Tcw)
    key = jax.random.fold_in(jax.random.PRNGKey(20240817), frame_idx)
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
    if lk_downsample > 1:
        # track on subsampled images: an lk_win half-window then covers
        # lk_downsample x the full-res context (the reference's 22x22
        # window at full res ~ our 15x15 at half res), per-track cost
        # drops ~4x, and the ~0.2 full-res px precision loss sits well
        # inside the adaptive epipolar gates. One pyramid level less
        # spans the same displacement range.
        lds = lk_downsample
        flow = lk_flow(
            prev_gray[::lds, ::lds], cur_gray[::lds, ::lds],
            flow_pts / lds, flow_pts_valid,
            levels=max(lk_levels - 1, 1), win_half=lk_win, iters=lk_iters,
        )
        flow = flow._replace(pts1=flow.pts1 * lds)
    else:
        flow = lk_flow(
            prev_gray, cur_gray, flow_pts, flow_pts_valid,
            levels=lk_levels, win_half=lk_win, iters=lk_iters,
        )
    good_track = flow.valid & (flow.err < track_err_th)

    # 2. 3D from the previous frame's depth; PnP vs motion-model arbitration
    xi = jnp.clip(jnp.round(flow_pts[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(flow_pts[:, 1]).astype(jnp.int32), 0, H - 1)
    d0 = prev_depth[yi, xi]
    has3d = good_track & (d0 > 0)
    pc0 = backproject(cam, flow_pts, jnp.maximum(d0, 1e-3))
    pts_w = se3.transform_points(se3.inv_T(last_Tcw), pc0)

    pnp = ransac_pnp(cam, pts_w, flow.pts1, has3d, k2, n_hyp=pnp_hypotheses)
    err_pred, _ = _reproj_err(cam, T_pred, pts_w, flow.pts1)

    # 2b. depth clusters on the current frame (moved ahead of the pose
    # arbitration, which keys on them; SLIC depends only on the image/depth,
    # not the pose). slic_downsample=1 (full res) is the default: it is
    # both the mask-level-validated setting (ds=2 shifts the adaptive gates
    # enough to cost mover recall on the synthetic suites) and, measured on
    # v5e round 2, FASTER -- the strided subsample breaks XLA's preferred
    # layout and costs more than the 4x map-traffic saving. ds=2 remains
    # available for very large frames. The subsample is strided (NOT
    # pooling): depth pooling mixes surfaces at object boundaries, which
    # smears the depth clusters the whole stage keys on.
    ds = slic_downsample
    Hh, Wh = H // ds, W // ds
    if cur_rgb is not None:
        from ..ops.slic import rgb_to_lab

        # Lab channels span ~[0,100]/[-100,100] vs gray's [0,255]: rescale
        # so the configured compactness keeps the same spatial/appearance
        # balance in both modes
        feat_img = rgb_to_lab(cur_rgb)[:: ds, :: ds][:Hh, :Wh] * 2.55
    else:
        feat_img = cur_gray[:: ds, :: ds][:Hh, :Wh]
    depth_h = cur_depth[:: ds, :: ds][:Hh, :Wh]
    cl = slic_kmeans(
        feat_img, depth_h,
        cell=max(slic_cell // ds, 4) if ds > 1 else slic_cell,
        compactness=slic_compactness, slic_iters=slic_iters, k=n_clusters,
    )
    x1i = jnp.clip(jnp.round(flow.pts1[:, 0]).astype(jnp.int32), 0, W - 1)
    y1i = jnp.clip(jnp.round(flow.pts1[:, 1]).astype(jnp.int32), 0, H - 1)
    pt_cluster = cl.pixel_cluster[
        jnp.clip(y1i // ds, 0, Hh - 1), jnp.clip(x1i // ds, 0, Wh - 1)
    ]

    # Arbitration: PnP is a RESCUE for a broken prediction, never a
    # competitor to a healthy one. The reference arbitrates PnP vs motion
    # model by raw inlier count every frame (src/Tracking.cc:1023-1131),
    # which inverts when a textured mover dominates the flow tracks:
    # PnP-RANSAC locks onto the MOVER's consensus, wins the count, and the
    # whole rejection flips (static suppressed / mover kept -> the map
    # contaminates and the tracker rides the mover). Cluster-coverage
    # arbitration fails the same way once the position+depth k-means splits
    # a large mover over more clusters than the static scene keeps
    # (measured: 9 of 15 on the dominant-mover suite). But this function
    # only ever runs with a live tracker behind it -- the pose chain that
    # produced T_pred is re-optimized against the MAP every frame -- so the
    # prediction is trustworthy precisely when this stage is running, and
    # PnP fires only when the prediction's support has collapsed
    # (acceleration spike), under the velocity-jump plausibility bound.
    err_pnp, _ = _reproj_err(cam, pnp.Tcw, pts_w, flow.pts1)

    def _support(err):
        ok = ((err < 2.0) & has3d).astype(jnp.float32)
        per = jax.ops.segment_sum(ok, pt_cluster, num_segments=n_clusters)
        return jnp.sum(per >= 2.0), jnp.sum(ok)

    sup_pred, n_pred = _support(err_pred)
    sup_pnp, n_pnp = _support(err_pnp)
    rel = pnp.Tcw @ se3.inv_T(T_pred)
    cos_ang = 0.5 * (jnp.trace(rel[:3, :3]) - 1.0)
    rot_ok = cos_ang > jnp.cos(pnp_gate_rot)
    trans_ok = jnp.linalg.norm(rel[:3, 3]) < pnp_gate_trans
    pred_broken = (sup_pred < 4) & (n_pred < 15)
    use_pnp = pnp.ok & rot_ok & trans_ok & pred_broken & (
        (sup_pnp > sup_pred) | ((sup_pnp == sup_pred) & (n_pnp > n_pred))
    )
    T_used = jnp.where(use_pnp, pnp.Tcw, T_pred)

    # 3. epipolar residuals under F DERIVED FROM THE WINNING POSE. The
    # reference fits F to the flow correspondences with RANSAC
    # (src/Tracking.cc:927-945), which inverts on texture-dominant movers:
    # the mover's correspondences form the consensus, its F wins, and the
    # *static* points become the "outliers". With a trusted pose chain the
    # fundamental matrix is determined -- F = K^-T [t]x R K^-1 of the
    # prev->cur relative pose -- so moving points are epipolar outliers no
    # matter how much of the image they cover (and the per-frame
    # 256-hypothesis RANSAC disappears from the hot path).
    rel_pc = T_used @ se3.inv_T(last_Tcw)
    E = se3.hat(rel_pc[:3, 3]) @ rel_pc[:3, :3]
    inv_fx, inv_fy = 1.0 / cam.fx, 1.0 / cam.fy
    Kinv = jnp.stack([
        jnp.stack([inv_fx, 0.0 * inv_fx, -cam.cx * inv_fx]),
        jnp.stack([0.0 * inv_fx, inv_fy, -cam.cy * inv_fy]),
        jnp.stack([0.0 * inv_fx, 0.0 * inv_fx, 1.0 + 0.0 * inv_fx]),
    ])
    F_pose = Kinv.T @ E @ Kinv
    epi_dist = epipolar_distance(F_pose, flow_pts, flow.pts1)
    # ADAPTIVE outlier gates. Absolute thresholds (the reference's 1 px /
    # 3 px, src/Tracking.cc:1143, src/Frame.cc:626) assume the pose chain
    # is pixel-accurate; when texture is weak the predicted pose carries a
    # few pixels of noise, static clusters start failing the absolute
    # gates, get suppressed, and the pose degrades further -- a positive
    # feedback loop. Normalizing by the *global median* error (a robust
    # estimate of the static population's error level, since movers are a
    # minority of clusters even when they dominate corners) keeps the
    # criterion "stands out against the scene", not "exceeds N pixels".
    # The gates are computed in step 7 from CLUSTER-mean statistics: the
    # median must be over cluster means, not raw tracks -- a texture-
    # dominant mover can contribute most of the tracks but only spans a
    # few of the n_clusters depth clusters.

    # 4. per-point RPE under the winner (the reference's mvRpe)
    rpe, _ = _reproj_err(cam, T_used, pts_w, flow.pts1)
    rpe = jnp.where(has3d, rpe, 0.0)

    # 5. 3D scene flow: current-depth backprojection vs previous-frame point
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

    # 6. per-cluster votes + robust coherent-displacement statistics
    # (CalDyna's rmVector rule) over the step-2b clusters. Three robustness
    # layers, each measured necessary on the dominant-mover suites:
    #   * WITHIN a cluster: the norm of the MEDIAN residual VECTOR (see
    #     _coherent_mag) -- robust both to a few bad tracks and to
    #     weak-texture LK aliasing, whose incoherent jumps cancel;
    #   * ACROSS clusters the naive scene level (median of cluster stats)
    #     fails -- the position+depth k-means splits a large mover over
    #     many clusters (measured: 9 of 15), so the gates would key on the
    #     MOVER's error level and blow past it;
    #   * so the level lives ACROSS TIME: an EMA carried frame to frame
    #     (gate_state), measured only from clusters the CURRENT gate calls
    #     static -- a mover that suddenly dominates tracks and clusters
    #     cannot hijack a level learned before it appeared, while slow pose-
    #     noise drift (the reason the gates adapt at all) still tracks. If
    #     every cluster trips the gate (violent shake), the measurement
    #     falls back to all clusters: the whole scene cannot be dynamic.
    w3 = has3d.astype(jnp.float32)
    wt = good_track.astype(jnp.float32)
    rpe_cnt = jax.ops.segment_sum(w3, pt_cluster, num_segments=n_clusters)
    epi_cnt = jax.ops.segment_sum(wt, pt_cluster, num_segments=n_clusters)
    r_vec = _reproj_residual(cam, T_used, pts_w, flow.pts1)
    mag_rpe = _coherent_mag(r_vec, has3d, pt_cluster, n_clusters)
    med_epi = _cluster_median(epi_dist, good_track, pt_cluster, n_clusters)

    if gate_state is None:
        gate_state = jnp.zeros(3, jnp.float32)
    cl_ok = rpe_cnt >= 2
    rpe_gate = jnp.maximum(mean_rpe_th, 2.5 * gate_state[0])
    epi_gate = jnp.maximum(epi_outlier_th, 3.0 * gate_state[1])

    epi_out = (epi_dist > epi_gate) & good_track
    epi_vote = epi_out & has3d & depth_consistent
    votes = jax.ops.segment_sum(
        epi_vote.astype(jnp.float32), pt_cluster, num_segments=n_clusters
    )

    # Scene-flow criterion: the epipolar test is blind to motion along the
    # epipolar plane (an object moving parallel to the camera's translation
    # direction stays on its epipolar lines and collects no votes). The 3D
    # scene flow -- both-frame depth backprojections under the winning pose
    # -- has no such blind spot, and the depth-consistency gate already
    # guards its disocclusion failure mode. The reference computes this
    # signal (vFlow_3d, src/Tracking.cc:1149-1184) but only displays it; we
    # let it flag clusters the epipolar vote cannot see, with the same
    # adaptive cluster-median normalization (flow3d_th in meters/frame).
    wf_m = has3d & (d1 > 0) & depth_consistent
    flow_cnt = jax.ops.segment_sum(
        wf_m.astype(jnp.float32), pt_cluster, num_segments=n_clusters
    )
    mag_flow = _coherent_mag(pts_w1 - pts_w, wf_m, pt_cluster, n_clusters)
    flow_gate = jnp.maximum(flow3d_th, 3.0 * gate_state[2])
    # conjunction with the RPE gate keeps this conservative: the coherent
    # reprojection magnitude is the cross-check against depth noise
    dyn_flow = (mag_flow >= flow_gate) & (flow_cnt >= 2) & (
        mag_rpe >= rpe_gate
    )

    dynamic_cluster = (
        (votes > 0) & (mag_rpe >= rpe_gate) & (rpe_cnt >= 2)
    ) | dyn_flow

    # EMA update of the gate levels from static-classified clusters (see
    # the step-6 rationale); fall back to all measurable clusters when the
    # gate tripped everywhere.
    def _lvl(med, cnt_ok, dyn):
        static_cl = cnt_ok & ~dyn
        has_static = jnp.any(static_cl)
        m = jnp.where(
            has_static,
            _masked_quantile(med, static_cl, 0.5),
            _masked_quantile(med, cnt_ok, 0.3),
        )
        return jnp.where(jnp.any(cnt_ok), m, jnp.nan)

    meas = jnp.stack([
        _lvl(mag_rpe, cl_ok, dynamic_cluster),
        _lvl(med_epi, epi_cnt >= 2, dynamic_cluster),
        _lvl(mag_flow, flow_cnt >= 2, dynamic_cluster),
    ])
    gate_new = jnp.where(
        jnp.isnan(meas), gate_state, 0.8 * gate_state + 0.2 * meas
    )

    # 8. final suppression mask. The seg dilation only exists when a
    # stage-1 mask is supplied (static flag -> the whole dilation chain
    # compiles away in geometric-only mode); dynamic clusters are already
    # cluster-granular and are not dilated, like the reference
    # (src/ORBextractor.cc:1697 dilates the person mask only).
    dyn_pix_h = dynamic_cluster[cl.pixel_cluster]          # (H/2, W/2)
    dyn_pix = jnp.broadcast_to(
        dyn_pix_h[:, None, :, None], (Hh, ds, Wh, ds)
    ).reshape(Hh * ds, Wh * ds)
    dyn_pix = jnp.pad(
        dyn_pix, ((0, H - Hh * ds), (0, W - Wh * ds)), mode="edge"
    )
    if has_seg:
        suppress = dilate_mask(seg_mask, dilate_radius) | dyn_pix
    else:
        suppress = dyn_pix

    return DynamicsResult(
        suppress_mask=suppress,
        geom_mask=dyn_pix,
        dynamic_cluster=dynamic_cluster,
        pixel_cluster=jnp.pad(
            jnp.broadcast_to(
                cl.pixel_cluster[:, None, :, None], (Hh, ds, Wh, ds)
            ).reshape(Hh * ds, Wh * ds),
            ((0, H - Hh * ds), (0, W - Wh * ds)), mode="edge",
        ),
        epi_outlier=epi_out,
        rpe=rpe,
        flow3d=flow3d,
        flow_pts1=flow.pts1,
        flow_valid=flow.valid,
        T_used=T_used,
        used_pnp=use_pnp,
        gate_state=gate_new,
    )
