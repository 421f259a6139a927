"""Frame-to-frame tracking: the motion-model odometry core.

This is the first slice of the reference's Tracking state machine
(Track() src/Tracking.cc:467; TrackWithMotionModel :1908; UpdateLastFrame
:1802), built the TPU way: the per-frame work -- projection-windowed
descriptor matching plus robust pose refinement -- is ONE jitted program
(:func:`track_motion_model`) over static padded shapes. The host keeps only
trivial bookkeeping (velocity, trajectory, retry logic), mirroring the
reference's host-side state machine without its threads or locks.

Map-based tracking (reference TrackLocalMap) layers on the same kernel with
map points instead of last-frame points; see slam_map/.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import se3
from ..geometry.camera import Camera, backproject, project, in_image
from ..ops import hamming
from ..solvers.pose_opt import PoseObs, PoseOptResult, optimize_pose
from .features import FrameFeatures, ORBPipeline


class TrackStepResult(NamedTuple):
    Tcw: jax.Array
    num_matches: jax.Array
    num_inliers: jax.Array
    inlier: jax.Array          # (K,) over last-frame rows
    match_idx: jax.Array       # (K,) current-frame kp index per last-frame row


@functools.partial(
    jax.jit,
    static_argnames=("max_dist", "opt_rounds", "opt_iters", "two_pass"),
)
def track_motion_model(
    cam: Camera,
    cur: FrameFeatures,
    last: FrameFeatures,
    last_Tcw: jax.Array,
    T_pred: jax.Array,
    radius: jax.Array,
    max_dist: int = 100,
    opt_rounds: int = 2,
    opt_iters: int = 4,
    pts_w: Optional[jax.Array] = None,
    has_point: Optional[jax.Array] = None,
    two_pass: bool = True,
) -> TrackStepResult:
    """Match last frame's depth-backed keypoints into the current frame by
    projection window, then run motion-only BA.

    Equivalent contract to SearchByProjection(CurrentFrame, LastFrame, th)
    (src/ORBmatcher.cc:1569) + PoseOptimization: rows are last-frame points,
    columns are current keypoints; the 64x48 grid walk becomes a masked
    distance matrix; scale-aware search radius rides the row mask.

    pts_w/has_point: optional (N, 3)/(N,) override of the per-keypoint 3D
    source. Default (None) backprojects last's depth -- the RGB-D/stereo
    temporal points of UpdateLastFrame (src/Tracking.cc:1802). Monocular
    callers pass the positions of the landmarks the last frame matched
    instead (the reference's mono TrackWithMotionModel matches
    mLastFrame.mvpMapPoints, which exist without depth).
    """
    if pts_w is None:
        # Last frame's keypoints with valid depth -> world points
        has_depth = last.valid & (last.depth > 0.0)
        pc_last = backproject(cam, last.xy_un, jnp.maximum(last.depth, 1e-3))
        pts_w = se3.transform_points(se3.inv_T(last_Tcw), pc_last)
    else:
        has_depth = has_point & last.valid

    # Predicted pixel location in the current frame.
    pc_pred = se3.transform_points(T_pred, pts_w)
    uv_pred, z_pred = project(cam, pc_pred)
    visible = has_depth & (z_pred > 0.05) & in_image(cam, uv_pred, border=16.0)

    # Scale-aware window: radius grows with the keypoint's pyramid level
    # (reference: th * mvScaleFactors[level]); scale = 1/sqrt(inv_sigma2).
    level_scale = jax.lax.rsqrt(jnp.maximum(last.inv_sigma2, 1e-9))

    # One Hamming matrix serves both passes -- only the window mask changes.
    dist = hamming.hamming_matrix(last.desc, cur.desc)

    def match_and_optimize(T_center, rad, rounds):
        pc = se3.transform_points(T_center, pts_w)
        uv, z = project(cam, pc)
        vis = has_depth & (z > 0.05) & in_image(cam, uv, border=16.0)
        wmask = hamming.window_mask(uv, cur.xy_un, rad * level_scale, vis, cur.valid)
        res = hamming.match(
            hamming.apply_mask(dist, wmask),
            max_dist=max_dist,
            mutual=True,
            angle_q=last.kp.angle,
            angle_t=cur.kp.angle,
        )
        j = jnp.maximum(res.idx, 0)
        obs = PoseObs(
            points_w=pts_w,
            uv=cur.xy_un[j],
            u_right=jnp.where(res.valid, cur.u_right[j], -1.0),
            inv_sigma2=cur.inv_sigma2[j],
            valid=res.valid,
        )
        return res, optimize_pose(
            T_center, cam, obs, rounds=rounds, iters_per_round=opt_iters,
            unroll=True,
        )

    # Pass 1: window around the motion prediction. Pass 2: re-match with a
    # tight window around the refined pose and re-optimize -- this breaks the
    # "self-consistent aliased match set" failure mode when the constant-
    # velocity prediction is off (the reference gets the same effect from
    # TrackLocalMap re-searching after TrackWithMotionModel,
    # src/Tracking.cc:688).
    # Pass 2 starts from pass 1's refined pose, so ONE chi2 round suffices
    # there -- the GN iterations are the frame program's dominant op count
    # (each is ~30 small fused ops; the tail iterations move the pose by
    # far less than the matcher's pixel quantization).
    res1, opt1 = match_and_optimize(T_pred, radius, opt_rounds)
    if two_pass:
        res2, opt2 = match_and_optimize(
            opt1.Tcw, jnp.minimum(radius * 0.5, 5.0), 1
        )
        # Fall back to pass 1 if the tight re-match collapsed (e.g. bad
        # pass-1 pose throwing every window off).
        use2 = opt2.num_inliers >= jnp.minimum(opt1.num_inliers, 20)
        res, opt = jax.tree.map(
            lambda a, b: jnp.where(use2, a, b), (res2, opt2), (res1, opt1)
        )
    else:
        # single-pass mode for the fused frame step: the local-map track
        # that follows re-matches from this pose and re-optimizes, making
        # it the second pass (the reference's TrackLocalMap after
        # TrackWithMotionModel, src/Tracking.cc:688) -- the tight re-match
        # here would duplicate that work in the latency path.
        res, opt = res1, opt1
    return TrackStepResult(
        Tcw=opt.Tcw,
        num_matches=jnp.sum(res.valid.astype(jnp.int32)),
        num_inliers=opt.num_inliers,
        inlier=opt.inlier,
        match_idx=res.idx,
    )


class FusedStepResult(NamedTuple):
    feats: FrameFeatures
    lm: "LocalMapTrackResult"   # for KF insertion / stats (device arrays)
    Tcw: jax.Array              # () selected pose
    velocity: jax.Array         # updated constant-velocity model
    counts: jax.Array           # (2,) int32 [mm_inliers, lm_inliers]
    sup: jax.Array              # (3,) int32 [mm_inliers, lm_inliers,
                                # n_close]: the ONLY per-frame device->host
                                # read. Everything the keyframe DECISION
                                # needs is these counts; the heavy insertion
                                # payload stays on device (sup_heavy) and is
                                # fetched lazily for the few % of frames
                                # that actually become keyframes. (The old
                                # (2+3N,) packed vector made the reader's
                                # bulk fetch bandwidth-bound on the tunnel:
                                # ~100 KB/frame = 340 ms for a 96-frame
                                # flush, measured round 4.)
    sup_heavy: jax.Array        # (3N,) int32 [kp_point_id, kp_valid,
                                # depth>0] -- keyframe insertion payload,
                                # fetched only on insertion
    stats_acc: jax.Array        # (V, 2) int32 accumulated [visible, found]
                                # per local-view row, carried frame to frame
                                # in the device state chain and applied to
                                # the map once per keyframe (replaces a
                                # per-frame bump_stats dispatch)


def _pack_supervision(counts, lm, feats):
    """-> ((3,) counts, (3N,) heavy payload), both int32."""
    valid = feats.valid
    close = valid & (feats.depth > 0)
    sup = jnp.concatenate([
        counts.astype(jnp.int32),
        jnp.sum(close.astype(jnp.int32))[None],
    ])
    heavy = jnp.concatenate([
        lm.kp_point_id.astype(jnp.int32),
        valid.astype(jnp.int32),
        (feats.depth > 0).astype(jnp.int32),
    ])
    return sup, heavy


def _accumulate_stats(stats_acc, lm) -> jax.Array:
    """Fold this frame's [visible, found] row booleans into the carried
    accumulator (None = cold start)."""
    delta = jnp.stack(
        [(lm.visible_ids >= 0), (lm.found_ids >= 0)], axis=-1
    ).astype(jnp.int32)
    return delta if stats_acc is None else stats_acc + delta


def _frame_step_core(
    pipe, image, depth, last, last_Tcw, velocity, view,
    mm_radius, map_radius, min_lm, suppress_mask, stats_acc,
) -> FusedStepResult:
    """Traceable body shared by fused_frame_step (one frame = one dispatch)
    and fused_frame_scan (a W-frame chunk = one dispatch)."""
    from ..slam_map.slam_map import track_local_map

    T_pred = se3.orthonormalize(velocity @ last_Tcw)
    kp, _, _, patches = pipe.detect_keypoints(image)
    feats = pipe.describe(kp, patches, depth, suppress_mask)
    mm = track_motion_model(
        pipe.cam, feats, last, last_Tcw, T_pred, mm_radius, two_pass=False
    )
    ok_mm = mm.num_inliers >= 10
    T0 = jnp.where(ok_mm, mm.Tcw, last_Tcw)
    # widen the map window when the motion model failed (retry ladder)
    lm = track_local_map(
        pipe.cam, feats, view, T0,
        jnp.where(ok_mm, map_radius, map_radius * 3.0),
    )
    ok_lm = lm.num_inliers >= min_lm
    Tcw = jnp.where(ok_lm, lm.Tcw, T0)
    tracked = ok_lm | ok_mm
    vel_new = jnp.where(
        tracked,
        se3.orthonormalize(Tcw @ se3.inv_T(last_Tcw)),
        jnp.eye(4),
    )
    Tcw = jnp.where(tracked, Tcw, last_Tcw)
    counts = jnp.stack([mm.num_inliers, lm.num_inliers])
    sup, sup_heavy = _pack_supervision(counts, lm, feats)
    return FusedStepResult(
        feats=feats, lm=lm, Tcw=Tcw, velocity=vel_new, counts=counts,
        sup=sup, sup_heavy=sup_heavy,
        stats_acc=_accumulate_stats(stats_acc, lm),
    )


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("min_lm",))
def fused_frame_step(
    pipe,                      # ORBPipeline (static, hashed by config)
    image: jax.Array,
    depth: jax.Array,
    last: FrameFeatures,
    last_Tcw: jax.Array,
    velocity: jax.Array,
    view,                      # slam_map.LocalView
    mm_radius: jax.Array,
    map_radius: jax.Array,
    min_lm: int = 30,
    suppress_mask: Optional[jax.Array] = None,
    stats_acc: Optional[jax.Array] = None,
) -> FusedStepResult:
    """The per-frame megakernel (SURVEY.md section 7 architecture stance):
    ORB extraction + motion-model tracking + local-map tracking + the pose/
    velocity state update as ONE compiled XLA program. The host reads back a
    single (2,) counts vector per frame -- every extra eager op or device
    read costs a full tunnel round trip (~25-30 ms measured on the axon
    link), which at 5+ per frame was 10x the actual compute time.

    suppress_mask: optional (H, W) dynamic-pixel mask from compute_dynamics
    (the Amos keypoint deletion step). The dynamics program dispatches
    SEPARATELY on purpose: inlining it here compiled into a ~44 ms program
    while the two programs run in ~7 ms total -- XLA's scheduling of the
    combined graph (image-wide SLIC/LK fused against the matching pipeline)
    is the pathology, not the arithmetic.
    """
    return _frame_step_core(
        pipe, image, depth, last, last_Tcw, velocity, view,
        mm_radius, map_radius, min_lm, suppress_mask, stats_acc,
    )


class ChunkYs(NamedTuple):
    """Per-frame outputs of a chunk scan, stacked along a leading W axis."""
    Tcw: jax.Array             # (W, 4, 4)
    sup: jax.Array             # (W, 3) per-frame count rows (the only
                               # per-chunk host read)
    sup_heavy: jax.Array       # (W, 3N) insertion payload rows, fetched
                               # lazily per keyframe
    feats: FrameFeatures       # (W, ...) -- sliced lazily only when a
                               # keyframe decision actually needs a row


class FusedChunkResult(NamedTuple):
    feats: FrameFeatures       # final frame's features (scan carry)
    Tcw: jax.Array             # final pose
    velocity: jax.Array        # final velocity
    stats_acc: jax.Array       # (V, 2) accumulated [visible, found]
    ys: ChunkYs


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("min_lm",))
def fused_frame_scan(
    pipe,                      # ORBPipeline (static, hashed by config)
    images: jax.Array,         # (W, H, Wd) chunk of frames
    depths: jax.Array,         # (W, H, Wd)
    last: FrameFeatures,
    last_Tcw: jax.Array,
    velocity: jax.Array,
    view,                      # slam_map.LocalView (fixed across the chunk)
    mm_radius: jax.Array,
    map_radius: jax.Array,
    min_lm: int = 30,
    stats_acc: Optional[jax.Array] = None,
) -> FusedChunkResult:
    """Micro-batched tracking: W fused frame steps under ONE lax.scan = ONE
    device dispatch. Through a remote-dispatch link each program execution
    costs ~5 ms of fixed overhead regardless of its arithmetic (the fused
    step's compute is ~0.2 ms), so chunking W frames divides the dominant
    per-frame cost by W. The local-map view is held fixed across the chunk
    -- keyframe decisions resolve at chunk granularity, so supervision lag
    grows from <=2 frames to <=2W; the reference's LocalMapping inserts
    keyframes with comparable latency from its consumer thread
    (src/LocalMapping.cc:73)."""
    V = view.ids.shape[0]
    acc0 = (
        jnp.zeros((V, 2), jnp.int32) if stats_acc is None else stats_acc
    )

    def body(carry, inp):
        feats, Tcw, vel, acc = carry
        g, d = inp
        res = _frame_step_core(
            pipe, g, d, feats, Tcw, vel, view,
            mm_radius, map_radius, min_lm, None, acc,
        )
        ys = ChunkYs(Tcw=res.Tcw, sup=res.sup,
                     sup_heavy=res.sup_heavy, feats=res.feats)
        return (res.feats, res.Tcw, res.velocity, res.stats_acc), ys

    carry, ys = jax.lax.scan(
        body, (last, last_Tcw, velocity, acc0), (images, depths)
    )
    feats, Tcw, vel, acc = carry
    return FusedChunkResult(
        feats=feats, Tcw=Tcw, velocity=vel, stats_acc=acc, ys=ys
    )


class DynChunkResult(NamedTuple):
    feats: FrameFeatures       # final frame's features (scan carry)
    Tcw: jax.Array
    velocity: jax.Array
    stats_acc: jax.Array
    gate_state: jax.Array      # (3,) EMA dynamic-gate levels (carry out)
    geom_mask: jax.Array       # (H, W) geometric cluster mask (carry out;
                               # dyn_stride>1 reuses it across chunk
                               # boundaries; stage-1 seg applies fresh)
    ys: ChunkYs


@functools.lru_cache(maxsize=16)
def make_dyn_chunk_fn(pipe, dcfg, min_lm: int, has_seg: bool, use_rgb: bool):
    """Build the jitted W-frame two-stage chunk program.

    lru_cache'd on the (hashable) pipeline/config so the jitted closure --
    and therefore its compiled executables -- are shared across System
    instances: without it every new System would recompile the largest
    program in the codebase (~minutes through the remote-compile tunnel).

    One dispatch runs, for each of W frames: the full Amos geometric stage
    (LK flow, F-matrix epipolar outliers, PnP arbitration, SLIC/k-means
    cluster votes -- compute_dynamics) feeding keypoint suppression into the
    fused tracking step. Stage-1 semantic masks for the whole chunk come in
    precomputed (models.segmenter.person_mask_batch: one batched backbone
    forward -- the async produce-ahead mode the reference sketches at
    src/yolact.cc:123-172). The scan carries (features, pose, velocity,
    EMA gate levels, stats accumulator) across frames, so the chunk is
    exactly the per-frame pipeline with the fixed per-dispatch cost paid
    once per W frames."""
    from .dynamics import compute_dynamics
    from ..ops.slic import dilate_mask

    kw = dict(
        epi_outlier_th=dcfg.epipolar_outlier_th,
        mean_rpe_th=dcfg.mean_rpe_th,
        flow3d_th=dcfg.flow3d_th,
        n_clusters=dcfg.n_clusters,
        slic_cell=dcfg.slic_cell,
        slic_iters=dcfg.slic_iters,
        dilate_radius=dcfg.mask_dilate_radius,
        slic_compactness=dcfg.slic_compactness,
        has_seg=has_seg,
        slic_downsample=dcfg.slic_downsample,
        lk_levels=dcfg.lk_levels,
        lk_win=dcfg.lk_win,
        lk_iters=dcfg.lk_iters,
        lk_downsample=dcfg.lk_downsample,
        pnp_hypotheses=dcfg.pnp_hypotheses,
    )

    @jax.jit
    def dyn_chunk(
        images,        # (W, H, Wd)
        depths,        # (W, H, Wd)
        prev_g,        # (*, H, Wd) tail of the previous chunk ([-1] is used)
        prev_d,        # (*, H, Wd)
        segs,          # (W, H, Wd) stage-1 masks (ignored if not has_seg)
        rgbs,          # (W, H, Wd, 3) or None (static by use_rgb)
        last: FrameFeatures,
        last_Tcw, velocity, gates, mask_in, view, mm_radius, map_radius,
        fid0, stats_acc,
    ):
        W = images.shape[0]
        prevs_g = jnp.concatenate([prev_g[-1:], images[:-1]])
        prevs_d = jnp.concatenate([prev_d[-1:], depths[:-1]])
        idx = jnp.arange(W)

        stride = dcfg.dyn_stride

        def body(carry, inp):
            feats, Tcw, vel, g8, acc, mask_prev = carry
            if use_rgb:
                g, d, pg, pd, seg, rgb, i = inp
            else:
                g, d, pg, pd, seg, i = inp
                rgb = None

            def run_stage(_):
                dyn = compute_dynamics(
                    pipe.cam, pg, pd, g, d, seg, Tcw, vel,
                    feats.kp.xy, feats.kp.valid, fid0 + i,
                    cur_rgb=rgb, gate_state=g8, **kw,
                )
                return dyn.suppress_mask, dyn.geom_mask, dyn.gate_state

            if stride > 1:
                # dyn_stride > 1: the GEOMETRIC stage runs every Nth frame
                # and skipped frames reuse its cluster mask -- cluster
                # regions move far slower than the frame rate. The stage-1
                # seg mask is applied FRESH every frame (a mover crosses
                # ~15 px/frame; a reused seg mask trails it). lax.cond
                # executes only the taken branch at runtime.
                def reuse(_):
                    m = (
                        dilate_mask(seg.astype(bool), kw["dilate_radius"])
                        | mask_prev
                        if has_seg else mask_prev
                    )
                    return m, mask_prev, g8

                mask, geom, g8_new = jax.lax.cond(
                    (fid0 + i) % stride == 0, run_stage, reuse, None,
                )
            else:
                mask, geom, g8_new = run_stage(None)
            res = _frame_step_core(
                pipe, g, d, feats, Tcw, vel, view,
                mm_radius, map_radius, min_lm, mask, acc,
            )
            ys = ChunkYs(Tcw=res.Tcw, sup=res.sup,
                     sup_heavy=res.sup_heavy, feats=res.feats)
            return (
                res.feats, res.Tcw, res.velocity, g8_new,
                res.stats_acc, geom,
            ), ys

        xs = (
            (images, depths, prevs_g, prevs_d, segs, rgbs, idx)
            if use_rgb
            else (images, depths, prevs_g, prevs_d, segs, idx)
        )
        V = view.ids.shape[0]
        acc0 = (
            jnp.zeros((V, 2), jnp.int32) if stats_acc is None else stats_acc
        )
        carry, ys = jax.lax.scan(
            body, (last, last_Tcw, velocity, gates, acc0, mask_in), xs
        )
        feats, Tcw, vel, g8, acc, mask_out = carry
        return DynChunkResult(
            feats=feats, Tcw=Tcw, velocity=vel, stats_acc=acc,
            gate_state=g8, geom_mask=mask_out, ys=ys,
        )

    return dyn_chunk


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("min_lm",))
def fused_stereo_step(
    pipe,                      # ORBPipeline (static, hashed by config)
    left: jax.Array,
    right: jax.Array,
    last: FrameFeatures,
    last_Tcw: jax.Array,
    velocity: jax.Array,
    view,                      # slam_map.LocalView
    mm_radius: jax.Array,
    map_radius: jax.Array,
    min_z: jax.Array,
    min_lm: int = 30,
    stats_acc: Optional[jax.Array] = None,
) -> FusedStepResult:
    """One-dispatch stereo frame: L/R extraction (the reference's two
    std::threads, src/Frame.cc:161-170, here two fused subgraphs), subpixel
    stereo matching, and both tracking stages + the state update."""
    from ..ops.stereo import match_stereo
    from ..slam_map.slam_map import track_local_map

    T_pred = se3.orthonormalize(velocity @ last_Tcw)
    kp_l, _, bl, pl = pipe.detect_keypoints(left)
    kp_r, _, br, pr = pipe.detect_keypoints(right)
    fl = pipe.describe(kp_l, pl)
    fr = pipe.describe(kp_r, pr)
    sm = match_stereo(
        fl.desc, kp_l.xy, kp_l.level, fl.valid,
        fr.desc, kp_r.xy, kp_r.level, fr.valid,
        bl[0], br[0], pipe.cam.bf, min_z,
    )
    feats = fl._replace(depth=sm.depth, u_right=sm.u_right)

    mm = track_motion_model(
        pipe.cam, feats, last, last_Tcw, T_pred, mm_radius
    )
    ok_mm = mm.num_inliers >= 10
    T0 = jnp.where(ok_mm, mm.Tcw, last_Tcw)
    lm = track_local_map(
        pipe.cam, feats, view, T0,
        jnp.where(ok_mm, map_radius, map_radius * 3.0),
    )
    ok_lm = lm.num_inliers >= min_lm
    Tcw = jnp.where(ok_lm, lm.Tcw, T0)
    tracked = ok_lm | ok_mm
    vel_new = jnp.where(
        tracked,
        se3.orthonormalize(Tcw @ se3.inv_T(last_Tcw)),
        jnp.eye(4),
    )
    Tcw = jnp.where(tracked, Tcw, last_Tcw)
    counts = jnp.stack([mm.num_inliers, lm.num_inliers])
    sup, sup_heavy = _pack_supervision(counts, lm, feats)
    return FusedStepResult(
        feats=feats, lm=lm, Tcw=Tcw, velocity=vel_new, counts=counts,
        sup=sup, sup_heavy=sup_heavy,
        stats_acc=_accumulate_stats(stats_acc, lm),
    )


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("min_lm",))
def fused_mono_step(
    pipe,                      # ORBPipeline (static, hashed by config)
    image: jax.Array,
    last: FrameFeatures,
    last_pid: jax.Array,       # (N,) landmark id per last-frame keypoint (-1)
    pt_pos: jax.Array,         # (M, 3) global landmark positions
    pt_alive: jax.Array,       # (M,) bool
    last_Tcw: jax.Array,
    velocity: jax.Array,
    view,                      # slam_map.LocalView
    mm_radius: jax.Array,
    map_radius: jax.Array,
    min_lm: int = 30,
    stats_acc: Optional[jax.Array] = None,
) -> FusedStepResult:
    """One-dispatch monocular frame (the mono analogue of fused_frame_step).

    Monocular keypoints carry no depth, so the motion model's 3D comes from
    the landmarks the LAST frame matched (last_pid from its local-map track)
    -- exactly the reference's mono TrackWithMotionModel, which projects
    mLastFrame.mvpMapPoints (src/Tracking.cc:1908). The rest of the program
    (extraction, local-map tracking, pose/velocity update, packed
    supervision) is identical, so the host stays on the pipelined
    supervision path with ONE device read per frame instead of the blocking
    int() reads of the split path.

    pt_pos/pt_alive are the full map arrays: a capacity growth changes
    their shape and recompiles this program -- rare (amortized doubling)
    and cheaper than per-frame gathers on the host.
    """
    from ..slam_map.slam_map import track_local_map

    T_pred = se3.orthonormalize(velocity @ last_Tcw)
    kp, _, _, patches = pipe.detect_keypoints(image)
    feats = pipe.describe(kp, patches)

    pid = jnp.maximum(last_pid, 0)
    has_pt = (last_pid >= 0) & pt_alive[pid]
    pts_w = pt_pos[pid]
    mm = track_motion_model(
        pipe.cam, feats, last, last_Tcw, T_pred, mm_radius,
        pts_w=pts_w, has_point=has_pt,
    )
    ok_mm = mm.num_inliers >= 10
    T0 = jnp.where(ok_mm, mm.Tcw, last_Tcw)
    lm = track_local_map(
        pipe.cam, feats, view, T0,
        jnp.where(ok_mm, map_radius, map_radius * 3.0),
    )
    ok_lm = lm.num_inliers >= min_lm
    Tcw = jnp.where(ok_lm, lm.Tcw, T0)
    tracked = ok_lm | ok_mm
    vel_new = jnp.where(
        tracked,
        se3.orthonormalize(Tcw @ se3.inv_T(last_Tcw)),
        jnp.eye(4),
    )
    Tcw = jnp.where(tracked, Tcw, last_Tcw)
    counts = jnp.stack([mm.num_inliers, lm.num_inliers])
    sup, sup_heavy = _pack_supervision(counts, lm, feats)
    return FusedStepResult(
        feats=feats, lm=lm, Tcw=Tcw, velocity=vel_new, counts=counts,
        sup=sup, sup_heavy=sup_heavy,
        stats_acc=_accumulate_stats(stats_acc, lm),
    )


class RGBDOdometry:
    """Host-side odometry loop (constant-velocity model, no map yet).

    Grows into the full System/Tracking facade; per-frame device work is one
    extraction program + one tracking program.
    """

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.pipeline = ORBPipeline(cfg.orb, cfg.camera)
        self.cam = self.pipeline.cam
        self.last_feats: Optional[FrameFeatures] = None
        self.last_Tcw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.timestamps = []
        self.poses_cw = []
        self.stats = []
        self.lost = False

    def track(self, gray: np.ndarray, depth: np.ndarray, timestamp: float):
        feats = self.pipeline.extract(
            jnp.asarray(gray), depth_image=jnp.asarray(depth)
        )
        if self.last_feats is None:
            Tcw = jnp.eye(4)
            n_match = n_inl = 0
        else:
            T_pred = self.velocity @ self.last_Tcw
            res = track_motion_model(
                self.cam, feats, self.last_feats, self.last_Tcw, T_pred,
                jnp.asarray(self.cfg.tracking.match_radius_motion),
            )
            n_match = int(res.num_matches)
            n_inl = int(res.num_inliers)
            if n_inl < self.cfg.tracking.min_matches_motion:
                # widen the window and retry (reference doubles th and
                # re-searches, src/Tracking.cc:1934-1944)
                res = track_motion_model(
                    self.cam, feats, self.last_feats, self.last_Tcw, T_pred,
                    jnp.asarray(2.0 * self.cfg.tracking.match_radius_motion),
                )
                n_match = int(res.num_matches)
                n_inl = int(res.num_inliers)
            if n_inl >= 10:
                Tcw = res.Tcw
                self.velocity = Tcw @ se3.inv_T(self.last_Tcw)
                self.lost = False
            else:
                # LOST: hold the last pose, drop the velocity model
                # (reference transitions to LOST + relocalization,
                # src/Tracking.cc:578; relocalization arrives with the map).
                Tcw = self.last_Tcw
                self.velocity = jnp.eye(4)
                self.lost = True
        self.last_feats = feats
        self.last_Tcw = Tcw
        self.timestamps.append(timestamp)
        self.poses_cw.append(np.asarray(Tcw, np.float64))
        self.stats.append({"matches": n_match, "inliers": n_inl})
        return np.asarray(Tcw)
