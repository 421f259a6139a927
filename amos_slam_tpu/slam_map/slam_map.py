"""Host-side map orchestration: covisibility, local windows, local mapping.

This is the thin replacement for the reference's LocalMapping thread
(src/LocalMapping.cc:73) and the Map/KeyFrame bookkeeping APIs. All numeric
work happens in jitted kernels over the device-resident :class:`MapArrays`;
the host keeps a numpy mirror of the observation table -- per-*keyframe*
(not per-frame) bookkeeping, exactly the work the reference does under its
map mutex, minus the mutex.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import se3
from ..geometry.camera import Camera, project, in_image
from ..ops import hamming
from ..solvers.local_ba import BAProblem, solve_local_ba
from ..solvers.pose_opt import PoseObs, optimize_pose
from ..frontend.features import FrameFeatures
from .map_state import (
    MapArrays,
    add_points_kernel,
    apply_ba_kernel,
    bump_point_stats_kernel,
    bump_point_stats_rows_kernel,
    compact_keyframes_kernel,
    cull_points_kernel,
    empty_map,
    insert_keyframe_kernel,
    refresh_landmarks_kernel,
)
from .triangulation import triangulate_pair


class LocalView(NamedTuple):
    """Gathered local-map snapshot used by TrackLocalMap (static size V)."""

    ids: jax.Array       # (V,) landmark ids (-1 pad)
    pos: jax.Array       # (V, 3)
    desc: jax.Array      # (V, 256) int8
    normal: jax.Array    # (V, 3)
    min_dist: jax.Array  # (V,)
    max_dist: jax.Array  # (V,)
    valid: jax.Array     # (V,)


class LocalMapTrackResult(NamedTuple):
    Tcw: jax.Array
    num_inliers: jax.Array
    kp_point_id: jax.Array   # (N,) landmark id matched per frame keypoint (-1)
    visible_ids: jax.Array   # (V,) ids predicted visible (-1 pad)
    found_ids: jax.Array     # (V,) ids matched as inliers (-1 pad)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def track_local_map(
    cam: Camera,
    cur: FrameFeatures,
    view: LocalView,
    Tcw0: jax.Array,
    radius: jax.Array,
    nn_ratio: float = 0.8,
    max_dist: int = 100,
) -> LocalMapTrackResult:
    """Project local landmarks into the frame, match, optimize.

    Contract of Tracking::TrackLocalMap + SearchLocalPoints
    (src/Tracking.cc:1998, :2321): isInFrustum gates (depth in scale range,
    viewing angle < 60 deg), scale-predicted search radius, ratio test,
    then motion-only BA over all matches.
    """
    Twc = se3.inv_T(Tcw0)
    cam_center = Twc[:3, 3]
    pc = se3.transform_points(Tcw0, view.pos)
    uv, z = project(cam, pc)
    rel = view.pos - cam_center
    dist = jnp.linalg.norm(rel, axis=-1)
    cos_view = jnp.sum(rel * view.normal, axis=-1) / jnp.maximum(dist, 1e-9)
    visible = (
        view.valid
        & (z > 0.05)
        & in_image(cam, uv, border=16.0)
        & (dist >= 0.8 * view.min_dist)
        & (dist <= 1.2 * view.max_dist)
        & (cos_view > 0.5)
    )

    # Scale prediction (MapPoint::PredictScale, src/MapPoint.cc:551):
    # level ~ log(max_dist / dist) / log(1.2) -> radius multiplier 1.2^level.
    ratio = jnp.maximum(view.max_dist / jnp.maximum(dist, 1e-6), 1.0)
    level = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(1.2)), 0, 7
    )
    row_radius = radius * (1.2 ** level)

    dmat = hamming.hamming_matrix(view.desc, cur.desc)
    wmask = hamming.window_mask(uv, cur.xy_un, row_radius, visible, cur.valid)
    res = hamming.match(
        hamming.apply_mask(dmat, wmask),
        max_dist=max_dist,
        nn_ratio=nn_ratio,
        mutual=True,
    )

    j = jnp.maximum(res.idx, 0)
    obs = PoseObs(
        points_w=view.pos,
        uv=cur.xy_un[j],
        u_right=jnp.where(res.valid, cur.u_right[j], -1.0),
        inv_sigma2=cur.inv_sigma2[j],
        valid=res.valid,
    )
    # 2 rounds x 4 unrolled GN iterations: measured indistinguishable from
    # the reference's 4 x 10 LM on ATE (the chi2 reclassification rounds
    # matter, the tail iterations and the accept/reject re-evaluation do
    # not), and several ms cheaper per frame on v5e (see optimize_pose).
    opt = optimize_pose(Tcw0, cam, obs, rounds=2, iters_per_round=4,
                        unroll=True)

    # Per frame-keypoint landmark id: scatter-max over row->col matches
    # (init -1; losers write -1, duplicate targets resolve deterministically).
    N = cur.valid.shape[0]
    inlier_match = res.valid & opt.inlier
    kp_point = jnp.full((N,), -1, jnp.int32).at[
        jnp.where(inlier_match, res.idx, 0)
    ].max(jnp.where(inlier_match, view.ids, -1))

    return LocalMapTrackResult(
        Tcw=opt.Tcw,
        num_inliers=opt.num_inliers,
        kp_point_id=kp_point,
        visible_ids=jnp.where(visible, view.ids, -1),
        found_ids=jnp.where(inlier_match, view.ids, -1),
    )


@jax.jit
def _gather_view(a: MapArrays, ids_p: jax.Array) -> "LocalView":
    gather = jnp.maximum(ids_p, 0)
    return LocalView(
        ids=ids_p,
        pos=a.pt_pos[gather],
        desc=a.pt_desc[gather],
        normal=a.pt_normal[gather],
        min_dist=a.pt_min_dist[gather],
        max_dist=a.pt_max_dist[gather],
        valid=(ids_p >= 0) & a.pt_valid[gather],
    )


# ---------------------------------------------------------------------------
# Batched keyframe-maintenance kernels.
#
# Everything below exists to make keyframe-rate maintenance ONE dispatch +
# (at most) ONE host fetch per operation. The eager per-neighbour versions
# paid a full tunnel round trip (~20-180 ms measured) for EVERY eager jnp op,
# which made a single keyframe insertion cost seconds.
# ---------------------------------------------------------------------------

NB_PAD = 4   # fixed neighbour-slot pad shared by fuse/triangulation kernels


@jax.jit
def _fuse_match_kernel(
    a: MapArrays, cam: Camera, slot: jax.Array,
    nbs: jax.Array, nb_ok: jax.Array, my_obs: jax.Array,
):
    """Duplicate-candidate matching between ``slot`` and up to NB_PAD
    covisible neighbours (ORBmatcher::Fuse search stage,
    src/ORBmatcher.cc:1020): project slot's landmarks into each neighbour,
    window-match descriptors. Returns packed (2, NB_PAD, N) int32
    [match idx, match valid] for a single host fetch."""
    mine_has = my_obs >= 0
    desc_s = a.kf_desc[slot]
    kpv_s = a.kf_kp_valid[slot]
    pts = a.pt_pos[jnp.maximum(my_obs, 0)]

    def one(nb, ok_nb):
        d = hamming.hamming_matrix(desc_s, a.kf_desc[nb])
        ok = (kpv_s & mine_has)[:, None] & a.kf_kp_valid[nb][None, :]
        pc = se3.transform_points(a.kf_pose[nb], pts)
        uv, z = project(cam, pc)
        wmask = hamming.window_mask(
            uv, a.kf_xy[nb], 4.0, mine_has & (z > 0.05), a.kf_kp_valid[nb]
        )
        res = hamming.match(
            hamming.apply_mask(d, ok & wmask),
            max_dist=50, nn_ratio=0.9, mutual=True,
        )
        return res.idx, res.valid & ok_nb

    idx, val = jax.vmap(one)(nbs, nb_ok)
    return jnp.stack([idx.astype(jnp.int32), val.astype(jnp.int32)])


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_obs_kernel(a: MapArrays, nb, js, vs) -> MapArrays:
    """Record gained observations on neighbour ``nb`` (fixed-pad scatter)."""
    return a._replace(kf_obs=a.kf_obs.at[nb, js].max(vs))


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_merges_kernel(a: MapArrays, lut, lose) -> MapArrays:
    """Rewrite observation ids through a merge LUT and kill loser landmarks
    (MapPoint::Replace, src/MapPoint.cc:244). ``lose`` is -1 padded."""
    M = a.pt_pos.shape[0]
    obs = a.kf_obs
    new_obs = jnp.where(obs >= 0, lut[jnp.maximum(obs, 0)], obs)
    ids = jnp.where(lose >= 0, lose, M - 1)
    pt_valid = a.pt_valid.at[ids].set(
        jnp.where(lose >= 0, False, a.pt_valid[ids])
    )
    pt_valid = pt_valid.at[M - 1].set(False)   # scratch slot stays dead
    return a._replace(kf_obs=new_obs, pt_valid=pt_valid)


@functools.partial(jax.jit, static_argnames=("scale_factor", "n_levels"))
def _triangulate_batch_kernel(
    a: MapArrays, cam: Camera, slot: jax.Array,
    nbs: jax.Array, nb_ok: jax.Array,
    un_slot: jax.Array, un_nbs: jax.Array,
    scale_factor: float = 1.2, n_levels: int = 8,
):
    """Triangulate ``slot`` against up to NB_PAD neighbours in ONE program
    (LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:313), with the
    landmark normals/scale ranges computed on device. Returns a packed
    (2, NB_PAD, N) int32 [match_j, good] host-fetch plus device-resident
    point attributes for :func:`_add_points_batch_kernel`."""
    xy1 = a.kf_xy[slot]
    desc1 = a.kf_desc[slot]
    v1 = a.kf_kp_valid[slot]
    ang1 = a.kf_angle[slot]
    T1 = a.kf_pose[slot]

    def one(nb, ok_nb, un_b):
        r = triangulate_pair(
            cam,
            xy1, desc1, v1, un_slot, ang1, T1,
            a.kf_xy[nb], a.kf_desc[nb], a.kf_kp_valid[nb], un_b,
            a.kf_angle[nb], a.kf_pose[nb],
        )
        return r.points_w, r.match_j, r.good & ok_nb

    X, mj, good = jax.vmap(one)(nbs, nb_ok, un_nbs)
    Twc = se3.inv_T(T1)
    view = X - Twc[:3, 3]
    dist = jnp.linalg.norm(view, axis=-1)
    normal = view / jnp.maximum(dist, 1e-9)[..., None]
    max_d = dist * scale_factor
    min_d = max_d / (scale_factor ** (n_levels - 1))
    packed = jnp.stack([mj.astype(jnp.int32), good.astype(jnp.int32)])
    return packed, X, normal, min_d, max_d


@functools.partial(jax.jit, donate_argnums=(0,))
def _add_points_batch_kernel(
    m: MapArrays,
    ids: jax.Array,      # (NB_PAD, N) new landmark ids (-1 pad)
    pos: jax.Array,      # (NB_PAD, N, 3)
    normal: jax.Array,   # (NB_PAD, N, 3)
    min_d: jax.Array,    # (NB_PAD, N)
    max_d: jax.Array,    # (NB_PAD, N)
    slot: jax.Array,     # () creating keyframe
    nbs: jax.Array,      # (NB_PAD,)
    kp_a: jax.Array,     # (NB_PAD, N) keypoint index in slot (-1 pad)
    kp_b: jax.Array,     # (NB_PAD, N) keypoint index in neighbour (-1 pad)
) -> MapArrays:
    """Insert all neighbours' triangulated landmarks in ONE dispatch."""
    desc = m.kf_desc[slot]
    for i in range(ids.shape[0]):    # NB_PAD, unrolled at trace time
        m = add_points_kernel(
            m, ids[i], pos[i], desc, normal[i], min_d[i], max_d[i],
            slot.astype(jnp.int32), slot.astype(jnp.int32), kp_a[i],
            nbs[i].astype(jnp.int32), kp_b[i],
        )
    return m


@jax.jit
def _pt_stats_kernel(a: MapArrays) -> jax.Array:
    """(2, M) stacked [visible, found] counters for one host fetch."""
    return jnp.stack([a.pt_visible, a.pt_found])


@functools.partial(jax.jit, donate_argnums=(0,))
def _remove_kf_kernel(a: MapArrays, kf: jax.Array) -> MapArrays:
    return a._replace(
        kf_valid=a.kf_valid.at[kf].set(False),
        kf_kp_valid=a.kf_kp_valid.at[kf].set(False),
        kf_obs=a.kf_obs.at[kf].set(-1),
    )


@jax.jit
def _gather_ba_inputs(
    a: MapArrays, slots_j: jax.Array, gather_pts: jax.Array, perm_j: jax.Array
):
    """One program for all local-BA input gathers (8 eager gathers = 8
    dispatch round trips otherwise).

    perm_j (Kb, Ob): per-keyframe keypoint-column permutation packing the
    landmark-bound observations first (host-computed). Every per-iteration
    cost of the solver scales with the observation width, and the bound
    set is typically under half of max_kpts; columns beyond the packed
    prefix all have obs_valid=False, so truncation to Ob is lossless (the
    host picks Ob large enough for the densest keyframe)."""
    kf = slots_j[:, None]
    return (
        a.kf_pose[slots_j],
        a.pt_pos[gather_pts],
        a.pt_valid[gather_pts],
        a.kf_xy[kf, perm_j],
        a.kf_ur[kf, perm_j],
        a.kf_inv_sigma2[kf, perm_j],
        a.kf_kp_valid[kf, perm_j],
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _local_ba_fused(
    a: MapArrays,
    cam: Camera,
    slots_j: jax.Array,      # (Kb,) keyframe slots (padded)
    slot_valid: jax.Array,   # (Kb,) bool
    free_p: jax.Array,       # (Kb,) bool (already masked by slot_valid)
    obs_local: jax.Array,    # (Kb, Ob) local landmark index per packed kp
    pt_ids_p: jax.Array,     # (Vp,) landmark ids (-1 pad)
    perm_j: jax.Array,       # (Kb, Ob) packed keypoint-column permutation
) -> MapArrays:
    """Local BA as ONE device program: input gather -> Schur/LM solve ->
    result scatter. The split form (gather, solve, apply = 3 dispatches)
    pays the remote-dispatch fixed cost three times per solve; fused it is
    one, which is what sets the backend cadence ceiling
    (BASELINE local_ba_solves_per_sec)."""
    gather_pts = jnp.maximum(pt_ids_p, 0)
    kf_pose, pt_pos, pt_valid, kf_xy, kf_ur, kf_is2, kf_kpv = (
        _gather_ba_inputs(a, slots_j, gather_pts, perm_j)
    )
    prob = BAProblem(
        kf_pose=kf_pose,
        kf_free=free_p,
        kf_valid=slot_valid,
        points=pt_pos,
        point_valid=(pt_ids_p >= 0) & pt_valid,
        obs_point=obs_local,
        obs_uv=kf_xy,
        obs_ur=kf_ur,
        obs_inv_sigma2=kf_is2,
        obs_valid=kf_kpv & (obs_local >= 0),
    )
    res = solve_local_ba(cam, prob)
    return apply_ba_kernel(
        a, slots_j, free_p, res.kf_pose, pt_ids_p, res.points
    )


class SlamMap:
    """The map: device arrays + host bookkeeping mirror."""

    def __init__(self, cfg: SystemConfig, cam: Camera):
        self.cfg = cfg
        self.cam = cam
        N = cfg.orb.max_kpts
        self.arrays = empty_map(cfg.map, N)
        self.K = cfg.map.max_keyframes
        self.M = cfg.map.max_points
        self.N = N
        self.V = cfg.tracking.max_map_points_local
        # host mirrors
        self.n_kfs = 0
        self.n_pts = 0
        self.version = 0          # bumped on any map mutation
        self._view_cache = {}     # (ref_slot, version) -> LocalView
        self.kf_obs_np = np.full((self.K, N), -1, np.int64)   # mirror
        self.kf_frame_id = np.full(self.K, -1, np.int64)
        self.kf_alive = np.zeros(self.K, bool)                # kf_valid mirror
        self.covis = np.zeros((self.K, self.K), np.int32)
        self.pt_obs_count = np.zeros(self.M, np.int32)
        self.pt_birth_kf = np.full(self.M, -1, np.int32)
        self.pt_alive = np.zeros(self.M, bool)
        self.culled_log: list = []   # slots culled since last drain (the
                                     # loop closer erases them from its BoW
                                     # database on its next tick)
        # spanning tree (KeyFrame::mpParent, src/KeyFrame.cc:599-700): each
        # keyframe's parent is its strongest-covisibility predecessor;
        # culling reparents children, so the tree stays connected and gives
        # the essential graph its backbone edges
        self.kf_parent = np.full(self.K, -1, np.int64)
        # persistent loop edges (KeyFrame::AddLoopEdge): every accepted
        # loop closure's (slot_i, slot_j, T_rel 4x4, s_rel) -- included in
        # all future essential-graph optimizations, and their endpoint
        # keyframes are protected from culling (the reference's mbNotErase)
        self.loop_edges: list = []
        # Stable keyframe UIDs for trajectory replay (the reference keys
        # mlpReferences by KeyFrame*, src/Tracking.cc:806-815; slots here
        # are reused after compaction, so replay bookkeeping is keyed by a
        # monotonically increasing uid instead):
        #   uid_cull[uid] = (parent_uid, Tcp) recorded when the keyframe is
        #     culled, Tcp = Tcw_kf @ inv(Tcw_parent) at cull time -- the
        #     reference's KeyFrame::mTcp spanning-tree fallback
        #     (src/System.cc:468-476).
        # (Track-time reference poses for trajectory replay live in
        # System._ref_epochs, snapshotted per frame epoch -- matching the
        # reference's track-time Tcr, src/Tracking.cc:806-815.)
        self.kf_uid_next = 0
        self.slot_uid = np.full(self.K, -1, np.int64)
        self.uid_cull: dict = {}

    # -- keyframe insertion ------------------------------------------------
    def insert_keyframe(
        self,
        feats: FrameFeatures,
        Tcw: jax.Array,
        kp_point_id: np.ndarray,   # (N,) matched landmark per keypoint (-1)
        frame_id: int,
        valid_close=None,          # optional prefetched (valid, close) bools
    ) -> int:
        """Insert a keyframe; create landmarks for unmatched close-depth
        keypoints (Tracking::CreateNewKeyFrame, src/Tracking.cc:2210)."""
        # Capacity backstop: callers prefer compaction (slot reuse) when
        # near-full, but compaction renumbers slots and so cannot run while
        # pending continuations hold slot ids (System._maybe_compact's
        # reentrancy guard). Growth renumbers nothing, so it is always safe
        # to do here -- this keeps the unbounded-sequence guarantee even
        # when >=3 insertions resolve back-to-back at capacity (the
        # reference never caps keyframe count, src/LocalMapping.cc:874).
        if self.n_kfs >= self.K - 1:
            self.grow_keyframes()
        slot = self.n_kfs
        self.n_kfs += 1
        self.kf_frame_id[slot] = frame_id
        self.kf_alive[slot] = True
        uid = self.kf_uid_next
        self.kf_uid_next += 1
        self.slot_uid[slot] = uid

        if valid_close is not None:
            valid, close = valid_close
        else:
            # one batched host read (each separate read is a tunnel round trip)
            vd = np.asarray(
                jnp.stack([feats.valid.astype(jnp.float32),
                           (feats.depth > 0).astype(jnp.float32)])
            )
            valid = vd[0] > 0
            close = vd[1] > 0

        # tracking may have matched against a cached (pre-cull) view snapshot;
        # drop references to landmarks that died in the meantime
        kp_point_id = np.where(
            (kp_point_id >= 0) & self.pt_alive[np.maximum(kp_point_id, 0)],
            kp_point_id, -1,
        )
        matched = kp_point_id >= 0
        create = valid & close & ~matched
        n_new = int(create.sum())
        cap = self.M - 1 - self.n_pts
        if n_new > cap:   # drop farthest-first beyond capacity
            depth = np.asarray(feats.depth)
            idx = np.where(create)[0]
            order = np.argsort(depth[idx])
            create[:] = False
            create[idx[order[:cap]]] = True
            n_new = cap
        new_ids = np.full(self.N, -1, np.int64)
        new_ids[create] = self.n_pts + np.arange(n_new)
        self.n_pts += n_new

        self.arrays = insert_keyframe_kernel(
            self.arrays,
            jnp.asarray(slot, jnp.int32),
            Tcw,
            feats.xy_un,
            feats.u_right,
            feats.depth,
            feats.inv_sigma2,
            feats.kp.angle,
            feats.kp.level,
            feats.desc,
            feats.valid,
            jnp.asarray(kp_point_id.astype(np.int32)),
            jnp.asarray(create),
            jnp.asarray(new_ids.astype(np.int32)),
            self.cam,
            scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )

        # host mirror + covisibility
        obs = np.where(valid, np.where(create, new_ids, kp_point_id), -1)
        self.kf_obs_np[slot] = obs
        created_ids = new_ids[create]
        self.pt_alive[created_ids] = True
        self.pt_birth_kf[created_ids] = slot
        self.pt_obs_count[created_ids] = 1
        seen = obs[matched & valid]
        seen = seen[seen >= 0]
        self.pt_obs_count[seen] += 1
        self._update_covisibility(slot)
        # spanning-tree parent: strongest covisible predecessor (the
        # reference parents a new KF to its max-weight connection on the
        # first UpdateConnections, src/KeyFrame.cc:446-456); fall back to
        # the latest alive predecessor for a covisibility-free insert
        if slot > 0:
            w = self.covis[slot, :slot].copy()
            w[~self.kf_alive[:slot]] = 0
            p = int(np.argmax(w))
            if w[p] == 0:
                alive_prev = np.where(self.kf_alive[:slot])[0]
                p = int(alive_prev[-1]) if len(alive_prev) else -1
            self.kf_parent[slot] = p
        else:
            self.kf_parent[slot] = -1
        self.version += 1
        return slot

    def _update_covisibility(self, slot: int):
        """Shared-landmark counts vs all existing KFs (KeyFrame::
        UpdateConnections, src/KeyFrame.cc:386) -- vectorized host numpy
        (a python set loop here cost ~n_kfs ms per keyframe)."""
        mine = self.kf_obs_np[slot]
        member = np.zeros(self.M, bool)
        member[mine[mine >= 0]] = True
        obs = self.kf_obs_np[: self.n_kfs]
        w = (member[np.maximum(obs, 0)] & (obs >= 0)).sum(axis=1)
        w[slot] = 0
        self.covis[slot, : self.n_kfs] = w
        self.covis[: self.n_kfs, slot] = w

    # -- local views ---------------------------------------------------------
    def local_keyframes(self, ref_slot: int, max_kfs: int) -> np.ndarray:
        """ref KF + best covisible neighbours, strongest first."""
        if self.n_kfs == 0:
            return np.zeros(0, np.int64)
        w = self.covis[ref_slot, : self.n_kfs].copy()
        order = np.argsort(-w)
        neigh = [k for k in order if w[k] > 0][: max_kfs - 1]
        return np.asarray([ref_slot] + neigh, np.int64)

    def local_point_ids(self, kf_slots: np.ndarray) -> np.ndarray:
        obs = self.kf_obs_np[kf_slots]
        ids = np.unique(obs[obs >= 0])
        return ids[self.pt_alive[ids]]

    def local_view(self, ref_slot: int) -> LocalView:
        """Gather the TrackLocalMap point set (UpdateLocalKeyFrames/Points,
        src/Tracking.cc:2456/2418). Cached per (ref keyframe, map version):
        between keyframes the map is immutable, so per-frame regathering
        would be pure dispatch overhead."""
        key = (ref_slot, self.version)
        hit = self._view_cache.get(key)
        if hit is not None:
            return hit
        kfs = self.local_keyframes(ref_slot, self.cfg.map.local_window)
        ids = self.local_point_ids(kfs)
        V = self.V
        if len(ids) > V:   # keep most-observed points
            order = np.argsort(-self.pt_obs_count[ids])
            ids = ids[order[:V]]
        pad = V - len(ids)
        ids_p = np.concatenate([ids, np.full(pad, -1, np.int64)])
        out = _gather_view(self.arrays, jnp.asarray(ids_p.astype(np.int32)))
        self._view_cache = {key: out}   # keep only the newest snapshot
        return out

    # -- keyframe culling ------------------------------------------------------
    def cull_keyframes(self, around: int) -> int:
        """Disable redundant keyframes: >= 90% of a KF's landmarks are
        observed by >= 3 other keyframes (LocalMapping::KeyFrameCulling,
        src/LocalMapping.cc:874). Host mirror math; device arrays keep the
        slot (kf_valid=False removes it from BA/loop candidacy)."""
        culled = 0
        cands = self.local_keyframes(around, self.cfg.map.local_window)
        protected = {e[0] for e in self.loop_edges} | {
            e[1] for e in self.loop_edges
        }
        for kf in cands.tolist():
            if kf == 0 or kf == around or not self.kf_alive[kf]:
                continue
            # loop-edge endpoints anchor the essential graph and are never
            # culled (the reference's mbNotErase, src/KeyFrame.cc:566-597)
            if kf in protected:
                continue
            obs = self.kf_obs_np[kf]
            ids = obs[obs >= 0]
            ids = ids[self.pt_alive[ids]]
            if len(ids) < 20:
                continue
            # observation counts excluding this keyframe
            redundant = (self.pt_obs_count[ids] - 1 >= 3).mean()
            if redundant > 0.9:
                self._remove_keyframe(kf)
                culled += 1
        if culled:
            self.version += 1
        return culled

    def _remove_keyframe(self, kf: int):
        # trajectory-replay fallback: frames referenced to this keyframe
        # recompose through its spanning-tree parent (KeyFrame::mTcp,
        # reference src/System.cc:468-476). Recorded before any mutation;
        # the parent is alive by the reparent-at-cull invariant. Pure
        # device compose -- async dispatch, no host read.
        parent = int(self.kf_parent[kf])
        uid = int(self.slot_uid[kf])
        if parent >= 0 and uid >= 0:
            Tcp = self.arrays.kf_pose[kf] @ se3.inv_T(self.arrays.kf_pose[parent])
            self.uid_cull[uid] = (int(self.slot_uid[parent]), Tcp)
        self.slot_uid[kf] = -1
        obs = self.kf_obs_np[kf]
        ids = obs[obs >= 0]
        self.pt_obs_count[ids] -= 1
        self.kf_obs_np[kf] = -1
        # SetBadFlag reparenting (src/KeyFrame.cc:599-700): children of the
        # removed keyframe re-attach to their strongest alive covisible
        # predecessor, falling back to the removed keyframe's own parent --
        # the spanning tree stays connected through culls
        children = np.where(
            (self.kf_parent[: self.n_kfs] == kf) & self.kf_alive[: self.n_kfs]
        )[0]
        for ch in children:
            w = self.covis[ch, :ch].copy()
            w[~self.kf_alive[:ch]] = 0
            w[kf] = 0
            p = int(np.argmax(w)) if ch > 0 else -1
            if ch == 0 or w[p] == 0:
                p = int(self.kf_parent[kf])
            self.kf_parent[ch] = p
        self.covis[kf, :] = 0
        self.covis[:, kf] = 0
        self.kf_alive[kf] = False
        self.kf_parent[kf] = -1
        self.culled_log.append(kf)
        self.arrays = _remove_kf_kernel(self.arrays, jnp.asarray(kf, jnp.int32))

    def drain_culled(self) -> list:
        out, self.culled_log = self.culled_log, []
        return out

    def grow_keyframes(self):
        """Double keyframe capacity.

        The escape hatch when the map is full and nothing is redundant
        enough to cull (long exploratory sequences -- KITTI-style). Rare by
        construction (log2 growth events per run), but each growth gives
        every keyframe-shaped kernel a new compiled shape, so prefer sizing
        MapConfig.max_keyframes for the sequence when known."""
        K0 = self.K
        a = self.arrays

        def pad0(x, fill):
            return jnp.concatenate(
                [x, jnp.full((K0,) + x.shape[1:], fill, x.dtype)], axis=0
            )

        self.arrays = a._replace(
            kf_pose=jnp.concatenate(
                [a.kf_pose, jnp.tile(jnp.eye(4, dtype=jnp.float32), (K0, 1, 1))]
            ),
            kf_valid=pad0(a.kf_valid, False),
            kf_xy=pad0(a.kf_xy, 0.0),
            kf_ur=pad0(a.kf_ur, -1.0),
            kf_depth=pad0(a.kf_depth, -1.0),
            kf_inv_sigma2=pad0(a.kf_inv_sigma2, 1.0),
            kf_angle=pad0(a.kf_angle, 0.0),
            kf_desc=pad0(a.kf_desc, 0),
            kf_kp_valid=pad0(a.kf_kp_valid, False),
            kf_obs=pad0(a.kf_obs, -1),
        )
        self.K = 2 * K0
        self.kf_obs_np = np.concatenate(
            [self.kf_obs_np, np.full((K0, self.N), -1, np.int64)]
        )
        self.kf_frame_id = np.concatenate(
            [self.kf_frame_id, np.full(K0, -1, np.int64)]
        )
        self.kf_alive = np.concatenate([self.kf_alive, np.zeros(K0, bool)])
        self.kf_parent = np.concatenate(
            [self.kf_parent, np.full(K0, -1, np.int64)]
        )
        self.slot_uid = np.concatenate(
            [self.slot_uid, np.full(K0, -1, np.int64)]
        )
        cv = np.zeros((self.K, self.K), np.int32)
        cv[:K0, :K0] = self.covis
        self.covis = cv
        self.version += 1

    def compact_keyframes(self):
        """Compact alive keyframes into a dense slot prefix, freeing the
        slots of culled keyframes for reuse (removes the hard keyframe
        capacity ceiling for long sequences; the reference's analogue is
        KeyFrame::SetBadFlag + erase, src/KeyFrame.cc:599-700).

        Temporal slot order is preserved. Returns the old->new slot LUT
        ((K,) int64, -1 = dead) for callers holding slot references, or
        None if there were no dead slots to reclaim."""
        alive = np.where(self.kf_alive[: self.n_kfs])[0]
        A = len(alive)
        if A == self.n_kfs:
            return None
        lut = np.full(self.K, -1, np.int64)
        lut[alive] = np.arange(A)
        src = np.zeros(self.K, np.int64)
        src[:A] = alive
        src_ok = np.zeros(self.K, bool)
        src_ok[:A] = True

        self.arrays = compact_keyframes_kernel(
            self.arrays,
            jnp.asarray(src.astype(np.int32)),
            jnp.asarray(src_ok),
            jnp.asarray(lut.astype(np.int32)),
        )
        # host mirrors follow the same permutation
        obs_new = np.full_like(self.kf_obs_np, -1)
        obs_new[:A] = self.kf_obs_np[alive]
        self.kf_obs_np = obs_new
        fid = np.full_like(self.kf_frame_id, -1)
        fid[:A] = self.kf_frame_id[alive]
        self.kf_frame_id = fid
        self.kf_alive = src_ok.copy()
        cv = np.zeros_like(self.covis)
        cv[:A, :A] = self.covis[np.ix_(alive, alive)]
        self.covis = cv
        self.pt_birth_kf = np.where(
            self.pt_birth_kf >= 0,
            lut[np.maximum(self.pt_birth_kf, 0)],
            -1,
        ).astype(np.int32)
        # spanning tree follows the permutation; a parent is always alive
        # (reparenting happens at cull time), so lut[parent] >= 0
        par = np.full_like(self.kf_parent, -1)
        old_par = self.kf_parent[alive]
        par[:A] = np.where(old_par >= 0, lut[np.maximum(old_par, 0)], -1)
        self.kf_parent = par
        su = np.full_like(self.slot_uid, -1)
        su[:A] = self.slot_uid[alive]
        self.slot_uid = su
        # loop-edge endpoints are cull-protected, so both survive
        self.loop_edges = [
            (int(lut[i]), int(lut[j]), T, s)
            for (i, j, T, s) in self.loop_edges
            if lut[i] >= 0 and lut[j] >= 0
        ]
        self.culled_log = []   # stale slot ids are meaningless post-compact
        self.n_kfs = A
        self.version += 1
        return lut

    # -- duplicate-landmark fusion ---------------------------------------------
    def fuse_neighbors(self, slot: int, max_neighbours: int = NB_PAD) -> int:
        """Fuse duplicate landmarks between ``slot`` and its covisible
        keyframes (LocalMapping::SearchInNeighbors + ORBmatcher::Fuse,
        src/LocalMapping.cc:629, src/ORBmatcher.cc:1020): when keypoint k of
        a neighbour matches a landmark of ``slot`` but already observes a
        DIFFERENT landmark, the two landmarks are duplicates -- keep the one
        with more observations, rewrite the loser's id everywhere.

        All device math runs in ONE batched kernel over NB_PAD padded
        neighbour slots + ONE host fetch; only the merge bookkeeping is
        host python. (Blocking form; dispatch/resolve halves below feed the
        pipelined system's async fetcher.)"""
        disp = self.fuse_neighbors_dispatch(slot, max_neighbours)
        if disp is None:
            return 0
        return self.fuse_neighbors_resolve(
            slot, disp, np.asarray(disp["packed"])
        )

    def fuse_neighbors_dispatch(self, slot: int, max_neighbours: int = NB_PAD):
        kfs = self.local_keyframes(slot, max_neighbours + 1)
        my_obs = self.kf_obs_np[slot].copy()
        neighbours = kfs[1:].tolist()
        if not neighbours:
            return None
        nbs = np.zeros(NB_PAD, np.int64)
        nb_ok = np.zeros(NB_PAD, bool)
        nbs[: len(neighbours)] = neighbours
        nb_ok[: len(neighbours)] = True
        packed = _fuse_match_kernel(
            self.arrays, self.cam, jnp.asarray(slot, jnp.int32),
            jnp.asarray(nbs.astype(np.int32)), jnp.asarray(nb_ok),
            jnp.asarray(my_obs.astype(np.int32)),
        )
        return {"packed": packed, "neighbours": neighbours, "my_obs": my_obs}

    def fuse_neighbors_resolve(
        self, slot: int, disp: dict, packed: np.ndarray
    ) -> int:
        neighbours = disp["neighbours"]
        my_obs = disp["my_obs"]
        fused = 0
        merges = {}
        for di, nb in enumerate(neighbours):
            midx = packed[0, di].astype(np.int64)
            mval = packed[1, di] > 0
            nb_obs = self.kf_obs_np[nb]
            # vectorized row classification (the python per-row loop cost
            # ~20 ms per fusion pass). Mutual matching makes midx values
            # unique over valid rows, so the scatter below is conflict-free.
            rows = mval & (my_obs >= 0)
            mine = np.where(rows, my_obs, 0)
            # culled between dispatch and (lagged) resolve: skip; likewise
            # never merge toward a dead landmark
            ok = rows & self.pt_alive[mine]
            j_all = np.maximum(midx, 0)
            theirs = nb_obs[j_all]
            ok &= ~((theirs >= 0) & ~self.pt_alive[np.maximum(theirs, 0)])
            gain = ok & (theirs < 0)
            gj = j_all[gain]
            gid = my_obs[gain]
            if __debug__ and len(gj) != len(np.unique(gj)):
                # the conflict-free scatter relies on _fuse_match_kernel's
                # mutual=True making midx unique over valid rows; if the
                # matching mode ever drops mutuality, duplicate gj would
                # silently last-write-win and over-increment pt_obs_count
                raise AssertionError(
                    "fuse match produced duplicate neighbour keypoints: "
                    "mutual-match invariant broken"
                )
            self.kf_obs_np[nb][gj] = gid
            np.add.at(self.pt_obs_count, gid, 1)
            gained = list(zip(gj.tolist(), gid.tolist()))
            # NOTE (intentional drift vs the reference's per-row interleave):
            # keep/lose below reads pt_obs_count AFTER all of this
            # neighbour's gains were applied, so a near-tie can keep the
            # opposite landmark vs interleaved per-row processing. The
            # surviving observation set is identical either way.
            mg = np.where(ok & (theirs >= 0) & (theirs != my_obs))[0]
            for i in mg.tolist():
                a_id, b_id = int(my_obs[i]), int(theirs[i])
                keep, lose = (
                    (a_id, b_id)
                    if self.pt_obs_count[a_id] >= self.pt_obs_count[b_id]
                    else (b_id, a_id)
                )
                if keep != lose:
                    merges[lose] = keep
                    fused += 1
            if gained:
                # fixed pad: variable index shapes would recompile the
                # scatter per distinct count (minutes over a remote tunnel)
                PAD = 256
                for start in range(0, len(gained), PAD):
                    chunk = gained[start : start + PAD]
                    js = np.zeros(PAD, np.int32)
                    vs = np.full(PAD, -1, np.int32)
                    js[: len(chunk)] = [g[0] for g in chunk]
                    vs[: len(chunk)] = [g[1] for g in chunk]
                    self.arrays = _scatter_obs_kernel(
                        self.arrays, jnp.asarray(nb, jnp.int32),
                        jnp.asarray(js), jnp.asarray(vs),
                    )
        if merges:
            self._apply_merges(merges)
            self.version += 1
        return fused

    def _apply_merges(self, merges: dict):
        # resolve chains (lose1 -> keep1 where keep1 itself lost later):
        # follow each target to its final survivor, guarding against cycles
        def resolve(x):
            seen = set()
            while x in merges and x not in seen:
                seen.add(x)
                x = merges[x]
            return x

        merges = {l: resolve(k) for l, k in merges.items()}
        merges = {l: k for l, k in merges.items() if l != k}
        if not merges:
            return
        lose = np.asarray(list(merges.keys()), np.int64)
        keep = np.asarray(list(merges.values()), np.int64)
        # host mirror rewrite
        lut = np.arange(self.M, dtype=np.int64)
        lut[lose] = keep
        live = self.kf_obs_np >= 0
        self.kf_obs_np[live] = lut[self.kf_obs_np[live]]
        self.pt_obs_count[keep] += self.pt_obs_count[lose]
        self.pt_alive[lose] = False
        # device rewrite in ONE kernel: kf_obs through the same LUT; losers
        # invalidated (fixed -1 pad; chunk in the rare >PAD case)
        PAD = 2048
        for start in range(0, max(len(lose), 1), PAD):
            chunk = lose[start : start + PAD]
            lose_p = np.full(PAD, -1, np.int64)
            lose_p[: len(chunk)] = chunk
            self.arrays = _apply_merges_kernel(
                self.arrays,
                jnp.asarray(lut.astype(np.int32)),
                jnp.asarray(lose_p.astype(np.int32)),
            )

    # -- landmark statistics refresh -------------------------------------------
    def refresh_landmarks(self, slot: int):
        """Recompute distinctive descriptors and normals/scale ranges for
        the landmarks observed by ``slot``'s local window
        (MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:359:
        min-median-Hamming descriptor among observations;
        UpdateNormalAndDepth, :477: mean viewing direction)."""
        kfs = self.local_keyframes(slot, self.cfg.map.local_window)
        ids = self.local_point_ids(kfs)
        if len(ids) == 0:
            return
        P = min(len(ids), self.V)
        ids = ids[:P]
        pad = self.V - P
        ids_p = np.concatenate([ids, np.full(pad, -1, np.int64)])
        # per landmark, gather up to 8 observing (kf, kp) pairs from the
        # mirror, then one device kernel does the median-Hamming vote.
        # Vectorized (the python dict loop here cost ~25 ms per keyframe):
        # flatten the window's observation table, map landmark ids to local
        # rows through an M-sized LUT, then rank within each row by a
        # stable sort -- same (kf-order, kp-order) fill as the loop form.
        OBS = 8
        kf_of = np.zeros((self.V, OBS), np.int64)
        kp_of = np.zeros((self.V, OBS), np.int64)
        obs = self.kf_obs_np[kfs]                       # (Wk, N)
        kfi = np.broadcast_to(kfs[:, None], obs.shape)
        kpi = np.broadcast_to(np.arange(self.N)[None, :], obs.shape)
        sel = obs >= 0
        lut = np.full(self.M, -1, np.int64)
        lut[ids] = np.arange(P)
        li = lut[obs[sel]]
        ok = li >= 0
        li, kfo, kpo = li[ok], kfi[sel][ok], kpi[sel][ok]
        order = np.argsort(li, kind="stable")
        li, kfo, kpo = li[order], kfo[order], kpo[order]
        first = np.searchsorted(li, np.arange(P), side="left")
        rank = np.arange(len(li)) - first[li]
        keep = rank < OBS
        kf_of[li[keep], rank[keep]] = kfo[keep]
        kp_of[li[keep], rank[keep]] = kpo[keep]
        cnt = np.zeros(self.V, np.int64)
        cnt[:P] = np.minimum(np.bincount(li, minlength=P), OBS)
        self.arrays = refresh_landmarks_kernel(
            self.arrays,
            jnp.asarray(ids_p.astype(np.int32)),
            jnp.asarray(kf_of.astype(np.int32)),
            jnp.asarray(kp_of.astype(np.int32)),
            jnp.asarray(cnt.astype(np.int32)),
        )
        self.version += 1

    # -- epipolar triangulation of new landmarks -------------------------------
    def create_new_points_dispatch(self, slot: int, max_neighbours: int = 3):
        """Device half of CreateNewMapPoints: dispatch the batched
        triangulation kernel. Returns an opaque handle for
        :meth:`create_new_points_resolve` (its ``packed`` field is the ONE
        device array the host must materialize), or None if there are no
        neighbours."""
        kfs = self.local_keyframes(slot, max_neighbours + 1)
        obs_slot = self.kf_obs_np[slot]
        neighbours = [int(nb) for nb in kfs[1:]][:NB_PAD]
        if not neighbours:
            return None
        nbs = np.zeros(NB_PAD, np.int64)
        nb_ok = np.zeros(NB_PAD, bool)
        nbs[: len(neighbours)] = neighbours
        nb_ok[: len(neighbours)] = True
        un_nbs = self.kf_obs_np[nbs] < 0
        packed, X, normal, min_d, max_d = _triangulate_batch_kernel(
            self.arrays, self.cam, jnp.asarray(slot, jnp.int32),
            jnp.asarray(nbs.astype(np.int32)), jnp.asarray(nb_ok),
            jnp.asarray(obs_slot < 0), jnp.asarray(un_nbs),
            scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        return {"packed": packed, "X": X, "normal": normal, "min_d": min_d,
                "max_d": max_d, "neighbours": neighbours, "nbs": nbs}

    def create_new_points(self, slot: int, max_neighbours: int = 3) -> int:
        """Triangulate new landmarks between ``slot`` and its best covisible
        keyframes (LocalMapping::CreateNewMapPoints). Returns #created.

        ONE batched device program triangulates all neighbours (normals and
        scale ranges included) + ONE host fetch of the match/good masks; the
        host assigns landmark ids sequentially (later neighbours cannot
        re-claim keypoints an earlier one took), then ONE insertion kernel
        writes every neighbour's points. (Blocking form; the pipelined
        system routes the fetch through its async fetcher instead --
        dispatch/resolve halves above/below.)"""
        disp = self.create_new_points_dispatch(slot, max_neighbours)
        if disp is None:
            return 0
        return self.create_new_points_resolve(
            slot, disp, np.asarray(disp["packed"])
        )

    def create_new_points_resolve(
        self, slot: int, disp: dict, packed: np.ndarray
    ) -> int:
        """Host half: assign landmark ids from the fetched match/good masks
        and dispatch the single insertion kernel."""
        neighbours = disp["neighbours"]
        X, normal = disp["X"], disp["normal"]
        min_d, max_d = disp["min_d"], disp["max_d"]
        nbs = disp["nbs"]
        match_all = packed[0].astype(np.int64)
        goods_all = packed[1] > 0

        created = 0
        N = self.N
        ids_all = np.full((NB_PAD, N), -1, np.int64)
        kp_b_all = np.full((NB_PAD, N), -1, np.int64)
        for ni, nb in enumerate(neighbours):
            good = goods_all[ni].copy()
            # keep only keypoints still unmatched on the host mirror (a
            # previous neighbour pass may have claimed them)
            good &= self.kf_obs_np[slot] < 0
            n_new = int(good.sum())
            cap = self.M - 1 - self.n_pts
            if n_new > cap:
                keep = np.where(good)[0][:cap]
                good[:] = False
                good[keep] = True
                n_new = cap
            if n_new == 0:
                continue
            ids = np.full(N, -1, np.int64)
            ids[good] = self.n_pts + np.arange(n_new)
            self.n_pts += n_new
            created += n_new
            match_j = match_all[ni]
            ids_all[ni] = ids
            kp_b_all[ni] = np.where(good, match_j, -1)
            # host mirrors
            self.kf_obs_np[slot][good] = ids[good]
            self.kf_obs_np[nb][match_j[good]] = ids[good]
            cids = ids[good]
            self.pt_alive[cids] = True
            self.pt_birth_kf[cids] = slot
            self.pt_obs_count[cids] = 2
        if created:
            kp_a_all = np.where(ids_all >= 0, np.arange(N)[None, :], -1)
            self.arrays = _add_points_batch_kernel(
                self.arrays,
                jnp.asarray(ids_all.astype(np.int32)),
                X, normal, min_d, max_d,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(nbs.astype(np.int32)),
                jnp.asarray(kp_a_all.astype(np.int32)),
                jnp.asarray(kp_b_all.astype(np.int32)),
            )
            self._update_covisibility(slot)
            self.version += 1
        return created

    # -- bundle adjustment -----------------------------------------------------
    def _ba_host_prep(
        self,
        slots: np.ndarray,
        free: np.ndarray,
        pt_ids: np.ndarray,
        Kb: int,
        Vp: int,
    ):
        """Host-side padding/remapping shared by local and global BA:
        returns (slots_p, slot_valid, free_p, obs_local, pt_ids_p, perm)
        numpy.

        ``perm`` (Kb, Ob) packs each keyframe's landmark-bound keypoint
        columns first and truncates the observation width to the smallest
        power-of-two-ish bucket that fits the densest keyframe (N/2 covers
        the common case: ~400-600 bound observations out of 1024 keypoint
        slots). Every per-iteration cost of the Schur solver scales with
        this width, and the dropped columns are exactly the obs_valid=False
        padding -- lossless, host-side, and bucketed so at most two
        compiled solver variants exist."""
        pad = Kb - len(slots)
        slots_p = np.concatenate([slots, np.zeros(pad, np.int64)])
        slot_valid = np.concatenate(
            [np.ones(len(slots), bool), np.zeros(pad, bool)]
        )
        free_p = np.concatenate([free, np.zeros(pad, bool)])

        # remap landmark ids -> local indices
        remap = np.full(self.M, -1, np.int64)
        remap[pt_ids] = np.arange(len(pt_ids))
        obs_local = remap[np.maximum(self.kf_obs_np[slots_p], 0)]
        obs_local[self.kf_obs_np[slots_p] < 0] = -1
        obs_local[~slot_valid] = -1

        # pack bound columns first; bucket the static width
        bound = obs_local >= 0
        perm = np.argsort(~bound, axis=1, kind="stable")
        densest = int(bound.sum(axis=1).max()) if len(slots) else 0
        Ob = self.N // 2 if densest <= self.N // 2 else self.N
        perm = perm[:, :Ob]
        obs_local = np.take_along_axis(obs_local, perm, axis=1)

        pt_pad = Vp - len(pt_ids)
        pt_ids_p = np.concatenate([pt_ids, np.full(pt_pad, -1, np.int64)])
        return slots_p, slot_valid, free_p, obs_local, pt_ids_p, perm

    def build_ba_problem(
        self,
        slots: np.ndarray,       # keyframe slots participating
        free: np.ndarray,        # same length: optimize this slot's pose?
        pt_ids: np.ndarray,      # landmark ids participating
        Kb: int,                 # padded keyframe-slot count (static shape)
        Vp: int,                 # padded landmark count (static shape)
    ):
        """Assemble a padded BAProblem over the given keyframes/landmarks
        (shared by local and joint-global BA). Returns
        (problem, slots_j, free_p, pt_ids_p)."""
        slots_p, slot_valid, free_p, obs_local, pt_ids_p, perm = (
            self._ba_host_prep(slots, free, pt_ids, Kb, Vp)
        )
        gather_pts = jnp.asarray(np.maximum(pt_ids_p, 0).astype(np.int32))

        slots_j = jnp.asarray(slots_p.astype(np.int32))
        kf_pose, pt_pos, pt_valid, kf_xy, kf_ur, kf_is2, kf_kpv = (
            _gather_ba_inputs(
                self.arrays, slots_j, gather_pts,
                jnp.asarray(perm.astype(np.int32)),
            )
        )
        obs_ok = jnp.asarray(obs_local >= 0)
        prob = BAProblem(
            kf_pose=kf_pose,
            kf_free=jnp.asarray(free_p),
            kf_valid=jnp.asarray(slot_valid),
            points=pt_pos,
            point_valid=jnp.asarray(pt_ids_p >= 0) & pt_valid,
            obs_point=jnp.asarray(obs_local.astype(np.int32)),
            obs_uv=kf_xy,
            obs_ur=kf_ur,
            obs_inv_sigma2=kf_is2,
            obs_valid=kf_kpv & obs_ok,
        )
        return prob, slots_j, (free_p & slot_valid), pt_ids_p

    def apply_ba_result(self, slots_j, free_p, pt_ids_p, kf_pose, points):
        """Scatter optimized poses/points back into the map."""
        self.version += 1
        self.arrays = apply_ba_kernel(
            self.arrays,
            slots_j,
            jnp.asarray(free_p),
            kf_pose,
            jnp.asarray(pt_ids_p.astype(np.int32)),
            points,
        )

    def run_local_ba(self, center_slot: int):
        """Local BA around ``center_slot`` (Optimizer::LocalBundleAdjustment
        contract: covisible window free, frontier fixed)."""
        Lw = self.cfg.map.local_window
        Fw = self.cfg.map.fixed_window
        Vba = self.cfg.map.ba_max_points
        window = self.local_keyframes(center_slot, Lw)
        pt_ids = self.local_point_ids(window)
        P = min(len(pt_ids), Vba)
        if P == 0 or len(window) < 2:
            return
        if len(pt_ids) > P:
            order = np.argsort(-self.pt_obs_count[pt_ids])
            pt_ids = pt_ids[order[:P]]

        # frontier: KFs observing local points but outside the window
        inset = np.zeros(self.n_kfs, bool)
        inset[window] = True
        obs = self.kf_obs_np[: self.n_kfs]
        pt_set = np.zeros(self.M, bool)
        pt_set[pt_ids] = True
        observes = (pt_set[np.maximum(obs, 0)] & (obs >= 0)).any(axis=1)
        frontier = np.where(observes & ~inset)[0][:Fw]

        slots = np.concatenate([window, frontier])
        free = np.concatenate(
            [np.ones(len(window), bool), np.zeros(len(frontier), bool)]
        )
        # gauge: if nothing is fixed, fix the first window KF (reference
        # fixes KF 0 via its frontier or the origin KF)
        if len(frontier) == 0:
            free[0] = False

        slots_p, slot_valid, free_p, obs_local, pt_ids_p, perm = (
            self._ba_host_prep(slots, free, pt_ids, Lw + Fw, Vba)
        )
        self.version += 1
        self.arrays = _local_ba_fused(
            self.arrays,
            self.cam,
            jnp.asarray(slots_p.astype(np.int32)),
            jnp.asarray(slot_valid),
            jnp.asarray(free_p & slot_valid),
            jnp.asarray(obs_local.astype(np.int32)),
            jnp.asarray(pt_ids_p.astype(np.int32)),
            jnp.asarray(perm.astype(np.int32)),
        )

    # -- maintenance -----------------------------------------------------------
    def bump_stats(self, visible_ids: jax.Array, found_ids: jax.Array):
        self.arrays = bump_point_stats_kernel(self.arrays, visible_ids, found_ids)

    def apply_stats_rows(self, ids: jax.Array, acc: jax.Array):
        """Apply a (V, 2) [visible, found] accumulator (built for free in
        the fused frame program's device state chain) in one scatter --
        per-frame stat bumps then cost zero extra dispatches."""
        self.arrays = bump_point_stats_rows_kernel(self.arrays, ids, acc)

    def cull_points_dispatch(self):
        """Device half of MapPointCulling: the (2, M) stats fetch."""
        return _pt_stats_kernel(self.arrays)

    def cull_points(self):
        """Reference MapPointCulling: drop landmarks with found/visible < 0.25
        or stuck at <=2 observations several KFs after creation. (Blocking
        form; the pipelined system materializes cull_points_dispatch through
        its async fetcher and calls cull_points_resolve.)"""
        self.cull_points_resolve(np.asarray(self.cull_points_dispatch()))

    def cull_points_resolve(self, both: np.ndarray):
        vis, fnd = both[0], both[1]
        alive = self.pt_alive.copy()
        alive_ids = np.where(alive)[0]
        if len(alive_ids) == 0:
            return
        ratio_bad = (vis[alive_ids] > 4) & (
            fnd[alive_ids] < 0.25 * np.maximum(vis[alive_ids], 1)
        )
        stale = (self.pt_obs_count[alive_ids] <= 2) & (
            self.pt_birth_kf[alive_ids] <= self.n_kfs - 4
        )
        cull = alive_ids[ratio_bad | stale]
        if len(cull) == 0:
            return
        self.pt_alive[cull] = False
        self.version += 1
        # FIXED pad size: a variable pad means a fresh XLA compile per new
        # size (minutes each through a remote-compile tunnel); chunk if the
        # cull set ever exceeds the pad
        PAD = 2048
        for start in range(0, len(cull), PAD):
            chunk = cull[start : start + PAD]
            cull_p = np.full(PAD, -1, np.int64)
            cull_p[: len(chunk)] = chunk
            self.arrays = cull_points_kernel(
                self.arrays, jnp.asarray(cull_p.astype(np.int32))
            )
        # host mirror: erase observations
        hit = np.isin(self.kf_obs_np, cull)
        self.kf_obs_np[hit] = -1
