"""Array-resident SLAM map.

Replaces the reference's pointer graph (Map/KeyFrame/MapPoint,
src/{Map,KeyFrame,MapPoint}.cc) and its mutex discipline (SURVEY.md
section 2d P5) with a structure-of-arrays held on device:

* keyframes: capacity-K slots of pose + full padded feature tables,
* landmarks: capacity-M slots of position/descriptor/normal/scale-range,
* observations: a (K, N) int32 table -- keypoint slot -> landmark id --
  which IS the bipartite observation graph (the reference's
  MapPoint::mObservations and KeyFrame::mvpMapPoints in one array).

Device arrays are updated functionally by jitted kernels; a small host-side
numpy mirror of the observation table drives *bookkeeping-only* decisions
(covisibility ordering, local-window selection), which is per-keyframe work,
not per-frame. There are no locks anywhere: tracking reads an immutable
snapshot; map mutation produces new arrays (XLA donates buffers, so in
steady state this is in-place on device).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MapConfig, ORBConfig
from ..geometry import se3
from ..geometry.camera import Camera, backproject


class MapArrays(NamedTuple):
    """Device-resident map storage (all capacity-padded)."""

    # keyframes
    kf_pose: jax.Array        # (K, 4, 4) Tcw
    kf_valid: jax.Array       # (K,) bool
    # per-keyframe feature tables (what matching/BA need)
    kf_xy: jax.Array          # (K, N, 2) undistorted pixel coords
    kf_ur: jax.Array          # (K, N) right-u (<0 mono)
    kf_depth: jax.Array       # (K, N) RGB-D depth (<=0 none)
    kf_inv_sigma2: jax.Array  # (K, N)
    kf_angle: jax.Array       # (K, N)
    kf_desc: jax.Array        # (K, N, 256) int8 bitplanes
    kf_kp_valid: jax.Array    # (K, N) bool
    kf_obs: jax.Array         # (K, N) int32 landmark id, -1 = none
    # landmarks
    pt_pos: jax.Array         # (M, 3)
    pt_desc: jax.Array        # (M, 256) int8
    pt_normal: jax.Array      # (M, 3) mean viewing direction
    pt_min_dist: jax.Array    # (M,)
    pt_max_dist: jax.Array    # (M,)
    pt_valid: jax.Array       # (M,) bool
    pt_visible: jax.Array     # (M,) int32  times expected visible
    pt_found: jax.Array       # (M,) int32  times actually matched inlier
    pt_first_kf: jax.Array    # (M,) int32  creating keyframe slot


def empty_map(map_cfg: MapConfig, n_kpts: int) -> MapArrays:
    K, M, N = map_cfg.max_keyframes, map_cfg.max_points, n_kpts
    return MapArrays(
        kf_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_xy=jnp.zeros((K, N, 2), jnp.float32),
        kf_ur=jnp.full((K, N), -1.0, jnp.float32),
        kf_depth=jnp.full((K, N), -1.0, jnp.float32),
        kf_inv_sigma2=jnp.ones((K, N), jnp.float32),
        kf_angle=jnp.zeros((K, N), jnp.float32),
        kf_desc=jnp.zeros((K, N, 256), jnp.int8),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_obs=jnp.full((K, N), -1, jnp.int32),
        pt_pos=jnp.zeros((M, 3), jnp.float32),
        pt_desc=jnp.zeros((M, 256), jnp.int8),
        pt_normal=jnp.zeros((M, 3), jnp.float32),
        pt_min_dist=jnp.zeros(M, jnp.float32),
        pt_max_dist=jnp.full(M, 1e9, jnp.float32),
        pt_valid=jnp.zeros(M, bool),
        pt_visible=jnp.zeros(M, jnp.int32),
        pt_found=jnp.zeros(M, jnp.int32),
        pt_first_kf=jnp.full(M, -1, jnp.int32),
    )


# ---------------------------------------------------------------------------
# jitted update kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("scale_factor", "n_levels"))
def insert_keyframe_kernel(
    m: MapArrays,
    slot: jax.Array,            # () int32 keyframe slot
    Tcw: jax.Array,             # (4,4)
    xy: jax.Array,              # (N,2) undistorted
    ur: jax.Array,
    depth: jax.Array,
    inv_sigma2: jax.Array,
    angle: jax.Array,
    level: jax.Array,           # (N,) int32
    desc: jax.Array,            # (N,256) int8
    kp_valid: jax.Array,        # (N,)
    matched_pt: jax.Array,      # (N,) int32 landmark id matched by tracking, -1
    create_mask: jax.Array,     # (N,) bool: create a new landmark here
    new_ids: jax.Array,         # (N,) int32 pre-assigned landmark ids (-1 pad)
    cam: Camera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> MapArrays:
    """Write one keyframe and create its new RGB-D landmarks.

    Mirrors Tracking::CreateNewKeyFrame + StereoInitialization
    (src/Tracking.cc:2210, :1343): depth-valid unmatched keypoints become
    landmarks; matched keypoints record observations.
    """
    N = xy.shape[0]
    obs = jnp.where(create_mask, new_ids, matched_pt)

    m = m._replace(
        kf_pose=m.kf_pose.at[slot].set(Tcw),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_xy=m.kf_xy.at[slot].set(xy),
        kf_ur=m.kf_ur.at[slot].set(ur),
        kf_depth=m.kf_depth.at[slot].set(depth),
        kf_inv_sigma2=m.kf_inv_sigma2.at[slot].set(inv_sigma2),
        kf_angle=m.kf_angle.at[slot].set(angle),
        kf_desc=m.kf_desc.at[slot].set(desc),
        kf_kp_valid=m.kf_kp_valid.at[slot].set(kp_valid),
        kf_obs=m.kf_obs.at[slot].set(jnp.where(kp_valid, obs, -1)),
    )

    # New landmarks: backproject with this keyframe's pose.
    Twc = se3.inv_T(Tcw)
    pc = backproject(cam, xy, jnp.maximum(depth, 1e-3))
    pw = se3.transform_points(Twc, pc)
    cam_center = Twc[:3, 3]
    view = pw - cam_center
    dist = jnp.linalg.norm(view, axis=-1)
    normal = view / jnp.maximum(dist, 1e-9)[:, None]
    # scale-invariance range (MapPoint::UpdateNormalAndDepth,
    # src/MapPoint.cc:477): maxdist = dist * scale^level, min = max/scale^L
    lvl_scale = scale_factor ** level.astype(jnp.float32)
    max_d = dist * lvl_scale
    min_d = max_d / (scale_factor ** (n_levels - 1))

    # Non-created rows scatter into the reserved scratch slot M-1 (the host
    # allocator never assigns it); routing them to a live id would race with
    # a genuine create at the same id under duplicate-index scatter.
    M = m.pt_pos.shape[0]
    ids = jnp.where(create_mask, new_ids, M - 1)
    w = create_mask
    m = m._replace(
        pt_pos=m.pt_pos.at[ids].set(jnp.where(w[:, None], pw, m.pt_pos[ids])),
        pt_desc=m.pt_desc.at[ids].set(jnp.where(w[:, None], desc, m.pt_desc[ids])),
        pt_normal=m.pt_normal.at[ids].set(
            jnp.where(w[:, None], normal, m.pt_normal[ids])
        ),
        pt_min_dist=m.pt_min_dist.at[ids].set(
            jnp.where(w, min_d, m.pt_min_dist[ids])
        ),
        pt_max_dist=m.pt_max_dist.at[ids].set(
            jnp.where(w, max_d, m.pt_max_dist[ids])
        ),
        pt_valid=m.pt_valid.at[ids].set(
            jnp.where(w, True, m.pt_valid[ids])
        ),
        pt_first_kf=m.pt_first_kf.at[ids].set(
            jnp.where(w, slot.astype(jnp.int32), m.pt_first_kf[ids])
        ),
    )
    return m


@functools.partial(jax.jit, donate_argnums=(0,))
def add_points_kernel(
    m: MapArrays,
    ids: jax.Array,        # (P,) new landmark ids (-1 pad)
    pos: jax.Array,        # (P, 3)
    desc: jax.Array,       # (P, 256)
    normal: jax.Array,     # (P, 3)
    min_d: jax.Array,      # (P,)
    max_d: jax.Array,      # (P,)
    first_kf: jax.Array,   # () int32
    slot_a: jax.Array,     # () int32 keyframe A
    kp_a: jax.Array,       # (P,) keypoint index in A (-1 pad)
    slot_b: jax.Array,     # () int32 keyframe B
    kp_b: jax.Array,       # (P,) keypoint index in B (-1 pad)
) -> MapArrays:
    """Insert triangulated landmarks and their two observations
    (LocalMapping::CreateNewMapPoints tail, src/LocalMapping.cc:313)."""
    M = m.pt_pos.shape[0]
    N = m.kf_obs.shape[1]
    w = ids >= 0
    ii = jnp.where(w, ids, M - 1)
    m = m._replace(
        pt_pos=m.pt_pos.at[ii].set(jnp.where(w[:, None], pos, m.pt_pos[ii])),
        pt_desc=m.pt_desc.at[ii].set(
            jnp.where(w[:, None], desc, m.pt_desc[ii])
        ),
        pt_normal=m.pt_normal.at[ii].set(
            jnp.where(w[:, None], normal, m.pt_normal[ii])
        ),
        pt_min_dist=m.pt_min_dist.at[ii].set(
            jnp.where(w, min_d, m.pt_min_dist[ii])
        ),
        pt_max_dist=m.pt_max_dist.at[ii].set(
            jnp.where(w, max_d, m.pt_max_dist[ii])
        ),
        pt_valid=m.pt_valid.at[ii].set(jnp.where(w, True, m.pt_valid[ii])),
        pt_first_kf=m.pt_first_kf.at[ii].set(
            jnp.where(w, first_kf, m.pt_first_kf[ii])
        ),
    )
    ka = jnp.where(w & (kp_a >= 0), kp_a, N - 1)
    kb = jnp.where(w & (kp_b >= 0), kp_b, N - 1)
    obs_a = m.kf_obs[slot_a].at[ka].max(jnp.where(w & (kp_a >= 0), ids, -1))
    obs_b = m.kf_obs[slot_b].at[kb].max(jnp.where(w & (kp_b >= 0), ids, -1))
    return m._replace(
        kf_obs=m.kf_obs.at[slot_a].set(obs_a).at[slot_b].set(obs_b)
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def bump_point_stats_kernel(
    m: MapArrays, visible_ids: jax.Array, found_ids: jax.Array
) -> MapArrays:
    """Increment found/visible counters (MapPoint::IncreaseVisible/Found);
    ids are padded with -1 (scattered into a scratch slot and dropped)."""
    M = m.pt_pos.shape[0]
    vis = jnp.where(visible_ids >= 0, visible_ids, M - 1)
    vmask = (visible_ids >= 0).astype(jnp.int32)
    fnd = jnp.where(found_ids >= 0, found_ids, M - 1)
    fmask = (found_ids >= 0).astype(jnp.int32)
    return m._replace(
        pt_visible=m.pt_visible.at[vis].add(vmask),
        pt_found=m.pt_found.at[fnd].add(fmask),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def bump_point_stats_rows_kernel(
    m: MapArrays, ids: jax.Array, acc: jax.Array
) -> MapArrays:
    """Apply an accumulated (V, 2) [visible, found] count block onto the
    global counters in ONE scatter. The accumulator is built for free inside
    the fused frame program (tracking.fused_frame_step carries it in the
    device state chain), so per-frame stat bumps cost zero extra dispatches
    -- the reference bumps per frame from TrackLocalMap
    (MapPoint::IncreaseVisible/Found, src/Tracking.cc:2321-2419)."""
    M = m.pt_pos.shape[0]
    ok = ids >= 0
    tgt = jnp.where(ok, ids, M - 1)
    okz = ok.astype(jnp.int32)
    return m._replace(
        pt_visible=m.pt_visible.at[tgt].add(acc[:, 0] * okz),
        pt_found=m.pt_found.at[tgt].add(acc[:, 1] * okz),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def apply_ba_kernel(
    m: MapArrays,
    kf_slots: jax.Array,     # (L,) int32 slots whose poses were optimized
    kf_slot_valid: jax.Array,  # (L,) bool
    new_poses: jax.Array,    # (L, 4, 4)
    pt_ids: jax.Array,       # (P,) int32 landmark ids optimized (-1 pad)
    new_pts: jax.Array,      # (P, 3)
) -> MapArrays:
    """Scatter local-BA results back into the map."""
    K = m.kf_pose.shape[0]
    M = m.pt_pos.shape[0]
    ks = jnp.where(kf_slot_valid, kf_slots, K - 1)
    poses = jnp.where(
        kf_slot_valid[:, None, None], new_poses, m.kf_pose[ks]
    )
    ps = jnp.where(pt_ids >= 0, pt_ids, M - 1)
    pts = jnp.where((pt_ids >= 0)[:, None], new_pts, m.pt_pos[ps])
    return m._replace(
        kf_pose=m.kf_pose.at[ks].set(poses),
        pt_pos=m.pt_pos.at[ps].set(pts),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def refresh_landmarks_kernel(
    m: MapArrays,
    ids: jax.Array,      # (V,) landmark ids (-1 pad)
    kf_of: jax.Array,    # (V, OBS) observing keyframe slots
    kp_of: jax.Array,    # (V, OBS) keypoint index within that keyframe
    cnt: jax.Array,      # (V,) number of valid observations
) -> MapArrays:
    """Distinctive-descriptor vote + normal/scale refresh for landmarks.

    MapPoint::ComputeDistinctiveDescriptors (src/MapPoint.cc:359): among a
    landmark's observed descriptors, keep the one minimizing the median
    Hamming distance to the others. MapPoint::UpdateNormalAndDepth (:477):
    normal = mean unit vector landmark->camera centers; scale range from
    the reference keyframe's observation distance.
    """
    V, OBS = kf_of.shape
    desc = m.kf_desc[kf_of, kp_of].astype(jnp.int32)       # (V, OBS, 256)
    dot = jnp.einsum("voi,vpi->vop", desc, desc)
    n1 = jnp.sum(desc, axis=-1)
    dist = n1[:, :, None] + n1[:, None, :] - 2 * dot        # (V, OBS, OBS)
    obs_ok = jax.lax.broadcasted_iota(jnp.int32, (V, OBS), 1) < cnt[:, None]
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    big = 1 << 20
    dist = jnp.where(pair_ok, dist, big)
    srt = jnp.sort(dist, axis=-1)                           # (V, OBS, OBS)
    med_idx = jnp.maximum((cnt - 1) // 2, 0)
    med = jnp.take_along_axis(
        srt, med_idx[:, None, None].repeat(OBS, axis=1), axis=-1
    )[..., 0]                                               # (V, OBS)
    med = jnp.where(obs_ok, med, big)
    best = jnp.argmin(med, axis=-1)                         # (V,)
    new_desc = jnp.take_along_axis(
        m.kf_desc[kf_of, kp_of], best[:, None, None].repeat(256, -1), axis=1
    )[:, 0]                                                 # (V, 256)

    # normals: mean unit (pos - center) over observations
    M = m.pt_pos.shape[0]
    safe_ids = jnp.where(ids >= 0, ids, M - 1)
    pos = m.pt_pos[safe_ids]                                # (V, 3)
    poses = m.kf_pose[kf_of]                                # (V, OBS, 4, 4)
    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    centers = -jnp.einsum("voij,voj->voi", jnp.swapaxes(R, -1, -2), t)
    rel = pos[:, None, :] - centers
    d = jnp.linalg.norm(rel, axis=-1)
    unit = rel / jnp.maximum(d[..., None], 1e-9)
    w = obs_ok.astype(pos.dtype)
    normal = jnp.sum(unit * w[..., None], axis=1)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9
    )

    ok = (ids >= 0) & (cnt > 0)
    return m._replace(
        pt_desc=m.pt_desc.at[safe_ids].set(
            jnp.where(ok[:, None], new_desc, m.pt_desc[safe_ids])
        ),
        pt_normal=m.pt_normal.at[safe_ids].set(
            jnp.where(ok[:, None], normal, m.pt_normal[safe_ids])
        ),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def compact_keyframes_kernel(
    m: MapArrays,
    src: jax.Array,      # (K,) int32: old slot gathered into each new slot
    src_ok: jax.Array,   # (K,) bool: new slot holds a real keyframe
    lut: jax.Array,      # (K,) int32 old->new slot (-1 = culled)
) -> MapArrays:
    """Permute keyframe slots so alive keyframes occupy a dense prefix.

    Slot reuse after culling (the reference frees KeyFrame objects via
    SetBadFlag + erase, src/KeyFrame.cc:599; the array-resident analogue is
    a compaction gather). The permutation preserves temporal order, so the
    slot-order-is-chronological invariant (odometry chains, spanning-tree
    merges) survives. pt_first_kf is remapped through the LUT; landmarks
    whose reference keyframe was culled get -1 (re-anchor falls back to
    their observations at the next refresh)."""
    pf = m.pt_first_kf
    pf_new = jnp.where(pf >= 0, lut[jnp.maximum(pf, 0)], -1)
    return m._replace(
        kf_pose=m.kf_pose[src],
        kf_valid=src_ok,
        kf_xy=m.kf_xy[src],
        kf_ur=m.kf_ur[src],
        kf_depth=m.kf_depth[src],
        kf_inv_sigma2=m.kf_inv_sigma2[src],
        kf_angle=m.kf_angle[src],
        kf_desc=m.kf_desc[src],
        kf_kp_valid=jnp.where(src_ok[:, None], m.kf_kp_valid[src], False),
        kf_obs=jnp.where(src_ok[:, None], m.kf_obs[src], -1),
        pt_first_kf=pf_new,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def cull_points_kernel(m: MapArrays, cull_ids: jax.Array) -> MapArrays:
    """Invalidate landmarks (MapPointCulling, src/LocalMapping.cc:262) and
    erase their observations."""
    M = m.pt_pos.shape[0]
    ids = jnp.where(cull_ids >= 0, cull_ids, M - 1)
    mask = cull_ids >= 0
    pt_valid = m.pt_valid.at[ids].set(
        jnp.where(mask, False, m.pt_valid[ids])
    )
    # erase from observation tables
    is_culled = jnp.zeros(M + 1, bool).at[ids].set(mask)
    obs_clamped = jnp.clip(m.kf_obs, -1, M - 1)
    hit = jnp.where(m.kf_obs >= 0, is_culled[jnp.maximum(obs_clamped, 0)], False)
    return m._replace(
        pt_valid=pt_valid,
        kf_obs=jnp.where(hit, -1, m.kf_obs),
    )
