"""Loop detection, Sim3 verification, and loop correction.

Replaces the reference's LoopClosing thread (src/LoopClosing.cc:72-880:
DetectLoop with covisibility-consistency, ComputeSim3 RANSAC + OptimizeSim3
+ guided re-search, CorrectLoop with Sim3 propagation + SearchAndFuse +
OptimizeEssentialGraph + background global BA). Runs at keyframe rate on
the host, dispatching jitted device kernels:

  detect   -> BoW retrieval (kf_database) with 3-consistent covisibility
              groups (DetectLoop, src/LoopClosing.cc:134-250)
  verify   -> full Hamming match (no BoW windowing -- one MXU matmul),
              3D from matched LANDMARK positions (mono-capable, like
              src/Sim3Solver.cc:61-141) with per-keyframe depth as the
              RGB-D fallback; Horn Sim3/SE3 RANSAC; mutual-reprojection
              refinement (OptimizeSim3, src/Optimizer.cc:1364); then a
              corrected-pose guided re-search against the candidate's
              covisible landmark neighbourhood with the reference's >= 40
              accept gate (SearchByProjection(Scw), src/ORBmatcher.cc:388;
              gate at src/LoopClosing.cc:509-560)
  correct  -> essential-graph pose-graph GN over all keyframes with
              covisibility + odometry + loop edges (7-DoF with free scale
              for monocular, like OptimizeEssentialGraph's Sim3 vertices);
              landmark positions re-anchored through their reference
              keyframe's Sim3 correction; SearchAndFuse merges duplicate
              landmarks across the two sides of the loop
              (src/LoopClosing.cc:690-810)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import se3
from ..geometry.sim3 import Sim3
from ..geometry.camera import Camera, backproject, project, in_image
from ..ops import hamming
from ..solvers.sim3_solver import ransac_sim3, optimize_sim3
from ..solvers.pnp import ransac_pnp
from ..solvers.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..slam_map.slam_map import SlamMap
from .vocabulary import Vocabulary, transform, _transform_impl
from .kf_database import KeyFrameDatabase

import functools

_P = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("k", "depth"))
def _bow_for_slot(arrays, slot, levels, node_valid, idf, k: int, depth: int):
    """BoW transform of a stored keyframe's descriptors in ONE program
    (the eager kf_desc[slot]/kf_kp_valid[slot] gathers each paid a full
    tunnel round trip). Returns packed (2, N) float32 [word, weight]."""
    desc = arrays.kf_desc[slot]
    valid = arrays.kf_kp_valid[slot]
    words = _transform_impl(levels, node_valid, desc, k, depth)
    w = idf[words]
    words = jnp.where(valid, words, -1)
    w = jnp.where(valid, w, 0.0)
    return jnp.stack([words.astype(jnp.float32), w])


@jax.jit
def _loop_pairs_kernel(a, cam: Camera, slot, cand):
    """Match slot-KF keypoints against cand-KF keypoints and build 3D-3D
    correspondence pairs in camera coordinates, in ONE device program.

    3D comes from the matched keypoints' LANDMARK positions (transformed by
    the owning keyframe's pose) -- which exist for monocular maps -- with
    the keyframe depth image as fallback (RGB-D/stereo), mirroring how the
    reference feeds Sim3Solver from MapPoint positions
    (src/Sim3Solver.cc:61-141)."""
    d = hamming.hamming_matrix(a.kf_desc[slot], a.kf_desc[cand])
    ok = a.kf_kp_valid[slot][:, None] & a.kf_kp_valid[cand][None, :]
    res = hamming.match(
        hamming.apply_mask(d, ok), max_dist=60, nn_ratio=0.75, mutual=True,
        angle_q=a.kf_angle[slot], angle_t=a.kf_angle[cand],
    )
    j = jnp.maximum(res.idx, 0)

    def kp_3d(kf, kp_sel=None):
        """(camera-coord points, has-3d) for a keyframe's keypoint rows."""
        obs = a.kf_obs[kf] if kp_sel is None else a.kf_obs[kf][kp_sel]
        xy = a.kf_xy[kf] if kp_sel is None else a.kf_xy[kf][kp_sel]
        dep = a.kf_depth[kf] if kp_sel is None else a.kf_depth[kf][kp_sel]
        gather = jnp.maximum(obs, 0)
        has_lm = (obs >= 0) & a.pt_valid[gather]
        p_lm = se3.transform_points(a.kf_pose[kf], a.pt_pos[gather])
        p_d = backproject(cam, xy, jnp.maximum(dep, 1e-3))
        pc = jnp.where(has_lm[:, None], p_lm, p_d)
        return pc, has_lm | (dep > 0)

    p1c, has1 = kp_3d(slot)
    p2c, has2 = kp_3d(cand, j)
    pair_ok = res.valid & has1 & has2
    return (
        res.idx, pair_ok, p1c, p2c,
        a.kf_xy[slot], a.kf_xy[cand][j],
        a.kf_inv_sigma2[slot], a.kf_inv_sigma2[cand][j],
    )


@jax.jit
def _guided_search_kernel(
    a, cam: Camera, slot, cand,
    view_ids, gR, gt, gs, radius,
):
    """SearchByProjection with the corrected similarity (the reference's
    SearchByProjection(Scw), src/ORBmatcher.cc:388): project the candidate
    side's landmark neighbourhood into the SLOT keyframe through
    g^-1 o T_cand (slot-camera coords of cand-consistent world points),
    then window-match descriptors. Returns per-view-row (match kp index in
    slot, valid)."""
    g_inv = Sim3(R=gR, t=gt, s=gs).inverse()
    gather = jnp.maximum(view_ids, 0)
    pw = a.pt_pos[gather]
    vvalid = (view_ids >= 0) & a.pt_valid[gather]
    q2 = se3.transform_points(a.kf_pose[cand], pw)    # cand-camera coords
    q1 = g_inv.apply(q2)                              # slot-camera coords
    uv, z = project(cam, q1)
    vis = vvalid & (z > 0.05) & in_image(cam, uv, border=8.0)

    d = hamming.hamming_matrix(a.pt_desc[gather], a.kf_desc[slot])
    wmask = hamming.window_mask(
        uv, a.kf_xy[slot], radius, vis, a.kf_kp_valid[slot]
    )
    res = hamming.match(
        hamming.apply_mask(d, wmask), max_dist=55, nn_ratio=1.0, mutual=True,
    )
    return res.idx, res.valid, jnp.sum(res.valid.astype(jnp.int32))


class LoopCloser:
    def __init__(self, cfg: SystemConfig, cam: Camera, voc: Vocabulary,
                 slam_map: SlamMap):
        self.cfg = cfg
        self.cam = cam
        self.voc = voc
        self.map = slam_map
        self.db = KeyFrameDatabase(voc.n_words)
        # covisibility-consistency state: list of (group frozenset, streak)
        self.consistent_groups: List[Tuple[frozenset, int]] = []
        # reference mnCovisibilityConsistencyTh = 3 (src/LoopClosing.cc:48)
        self.consistency_th = cfg.map.loop_consistency_th
        self.last_loop_kf = -999
        self.loops_closed: List[Tuple[int, int]] = []
        self.fused_last_loop = 0  # SearchAndFuse merge count (diagnostics)
        self.rejected_by_gate = 0  # guided re-search rejections (diagnostics)
        # in-flight joint global BA (reference's detached GBA thread,
        # src/LoopClosing.cc:881): advanced one LM phase per keyframe tick,
        # aborted when a new loop verifies (mbStopGBA)
        self.gba = None
        self.gba_aborts = 0       # diagnostics

    # ------------------------------------------------------------------
    def bow_dispatch(self, slot: int) -> jax.Array:
        """Device half: the stored keyframe's BoW transform as one program
        (packed (2, N) [word, weight]); materialize and hand to
        :meth:`on_keyframe_resolve`."""
        return _bow_for_slot(
            self.map.arrays, jnp.asarray(slot, jnp.int32),
            self.voc.levels, self.voc.node_valid, self.voc.idf,
            self.voc.k, self.voc.depth,
        )

    def on_keyframe(self, slot: int) -> bool:
        """Process a freshly inserted keyframe; returns True if a loop was
        closed (poses/points were rewritten). (Blocking form; the pipelined
        system materializes bow_dispatch asynchronously.)"""
        return self.on_keyframe_resolve(slot, np.asarray(self.bow_dispatch(slot)))

    def on_keyframe_resolve(self, slot: int, ww: np.ndarray) -> bool:
        words_np = ww[0].astype(np.int64)
        weights_np = ww[1]

        # keyframes culled since the last tick leave the BoW index (the
        # reference's KeyFrameDatabase::erase on SetBadFlag)
        for culled in self.map.drain_culled():
            self.db.erase(culled)

        # advance the in-flight global BA by one LM phase per keyframe
        # (each step is one async device dispatch; the host never blocks
        # until the final finish() fetch)
        if self.gba is not None and not self.gba.step():
            self.gba.finish()
            self.gba = None

        closed = False
        if slot - self.last_loop_kf > 5 and self.map.n_kfs > 8:
            cand = self._detect(slot, words_np, weights_np)
            if cand is not None:
                closed = self._verify_and_correct(slot, cand)
                if closed:
                    self.last_loop_kf = slot
                    self.loops_closed.append((slot, cand))

        self.db.add(slot, words_np, weights_np)
        return closed

    # ------------------------------------------------------------------
    def remap_slots(self, lut: np.ndarray):
        """Rewrite keyframe slot references after a map compaction. An
        in-flight global BA snapshot indexes pre-compaction slots, so it is
        aborted (it restarts at the next loop closure)."""
        if self.gba is not None:
            self.gba.abort()
            self.gba = None
        self.db.remap(lut)
        groups = []
        for g, streak in self.consistent_groups:
            g2 = frozenset(int(lut[k]) for k in g if lut[k] >= 0)
            if g2:
                groups.append((g2, streak))
        self.consistent_groups = groups
        if self.last_loop_kf >= 0:
            self.last_loop_kf = (
                int(lut[self.last_loop_kf])
                if lut[self.last_loop_kf] >= 0 else -999
            )
        self.loops_closed = [
            (int(lut[a]) if lut[a] >= 0 else -1,
             int(lut[b]) if lut[b] >= 0 else -1)
            for a, b in self.loops_closed
        ]

    # ------------------------------------------------------------------
    def flush_gba(self):
        """Drain an in-flight global BA to completion (used at shutdown /
        before exporting trajectories, where the reference joins its GBA
        thread)."""
        if self.gba is not None:
            while self.gba.step():
                pass
            self.gba.finish()
            self.gba = None

    # ------------------------------------------------------------------
    def relocalize(self, feats) -> Optional[Tuple[np.ndarray, int]]:
        """Relocalize a LOST frame against the keyframe database.

        Contract of Tracking::Relocalization (src/Tracking.cc:2591): BoW
        candidates -> descriptor matching -> PnP-RANSAC on the matched
        keypoints' LANDMARK world positions (mono-capable, like the
        reference's MapPoint-based PnPsolver feed, src/Tracking.cc:2634)
        with depth backprojection as the RGB-D fallback. A sub-gate PnP
        pose is NOT discarded: the reference's second stage
        (src/Tracking.cc:2715-2788) re-searches by projection from the
        rough pose (th=10 px, ORBdist=100) against the candidate's local
        landmark neighbourhood and re-optimizes, accepting at >= 50
        inliers -- here that is one track_local_map call seeded with the
        PnP pose over the candidate's local view. Returns
        (Tcw, num_inliers) or None.
        """
        if not self.db.kf_bow:
            return None
        words, weights = transform(self.voc, feats.desc, feats.valid)
        cands = self.db.query(
            np.asarray(words), np.asarray(weights), max_candidates=3
        )
        a = self.map.arrays
        best = None
        for cand in cands:
            d = hamming.hamming_matrix(feats.desc, a.kf_desc[cand])
            ok = feats.valid[:, None] & a.kf_kp_valid[cand][None, :]
            res = hamming.match(
                hamming.apply_mask(d, ok), max_dist=60, nn_ratio=0.75,
                mutual=True,
            )
            j = jnp.maximum(res.idx, 0)
            obs = a.kf_obs[cand][j]
            gather = jnp.maximum(obs, 0)
            has_lm = (obs >= 0) & a.pt_valid[gather]
            pts_lm = a.pt_pos[gather]                    # world positions
            kf_depth = a.kf_depth[cand][j]
            Twc = se3.inv_T(a.kf_pose[cand])
            pc = backproject(
                self.cam, a.kf_xy[cand][j], jnp.maximum(kf_depth, 1e-3)
            )
            pts_d = se3.transform_points(Twc, pc)
            pts_w = jnp.where(has_lm[:, None], pts_lm, pts_d)
            pair_ok = res.valid & (has_lm | (kf_depth > 0))
            if int(jnp.sum(pair_ok)) < 15:
                continue
            pnp = ransac_pnp(
                self.cam, pts_w, feats.xy_un, pair_ok,
                jax.random.PRNGKey(cand + 99), inlier_th_px=4.0,
                min_inliers=10,
            )
            if not bool(pnp.ok):
                continue
            n = int(pnp.num_inliers)
            Tcw = pnp.Tcw
            # a solid first pass stands on its own; a marginal one ([10, 50)
            # inliers) is only usable if the second stage confirms it
            ok_cand = n >= 20
            if n < 50:
                # second-stage rescue (src/Tracking.cc:2715-2788): guided
                # projection search from the rough PnP pose over the
                # candidate keyframe's covisible landmark neighbourhood
                # (th=10 px window, ORBdist=100 loose descriptor gate --
                # track_local_map's max_dist default), then re-optimize.
                # Accept the rescued pose ONLY at the reference's >= 50
                # gate: a wide search seeded from a garbage pose can
                # fabricate a few dozen aliased "inliers", so anything
                # below the gate keeps (or drops) the first-pass result.
                from ..slam_map.slam_map import track_local_map

                view = self.map.local_view(cand)
                lm = track_local_map(
                    self.cam, feats, view, Tcw, jnp.asarray(10.0)
                )
                n2 = int(lm.num_inliers)
                if n2 >= 50 and n2 > n:
                    n, Tcw, ok_cand = n2, lm.Tcw, True
            if ok_cand and (best is None or n > best[1]):
                best = (np.asarray(Tcw), n)
        return best

    # ------------------------------------------------------------------
    def _covis_group(self, kf: int) -> frozenset:
        covis_row = self.map.covis[kf, : self.map.n_kfs]
        return frozenset(np.where(covis_row > 0)[0].tolist()) | {kf}

    def _detect(self, slot: int, words, weights) -> Optional[int]:
        """BoW candidates excluding the covisible neighbourhood, gated by
        the min covisible score, then COVISIBILITY-GROUP temporal
        consistency: a candidate is accepted only when its covisibility
        group has intersected a previously-detected group in >=
        consistency_th consecutive detections (DetectLoop,
        src/LoopClosing.cc:134-250)."""
        covis_row = self.map.covis[slot, : self.map.n_kfs]
        neighbours = set(np.where(covis_row > 0)[0].tolist())
        neighbours.add(slot)
        # also exclude temporally recent keyframes
        neighbours.update(range(max(0, slot - 4), slot + 1))

        from .vocabulary import bow_vector, l1_score

        min_score = 1e-3
        nz, vals = bow_vector(words, weights, self.voc.n_words)
        scores = [
            l1_score(nz, vals, *self.db.kf_bow[nb])
            for nb in np.where(covis_row >= self.cfg.map.covis_weight_th)[0]
            if nb in self.db.kf_bow
        ]
        if scores:
            min_score = max(min(scores), 1e-3)

        cands = self.db.query(
            words, weights, exclude=sorted(neighbours),
            min_score=min_score,
            covis=self.map.covis[: self.map.n_kfs, : self.map.n_kfs],
            max_candidates=3,
        )
        if not cands:
            self.consistent_groups = []
            return None

        # 3-consistent covisibility groups (the reference's
        # mvConsistentGroups logic): each candidate's group extends the
        # streak of any previous group it intersects.
        chosen = None
        new_groups: List[Tuple[frozenset, int]] = []
        for c in cands:
            group = self._covis_group(c)
            streak = 1
            for prev_group, prev_streak in self.consistent_groups:
                if group & prev_group:
                    streak = max(streak, prev_streak + 1)
            new_groups.append((group, streak))
            if streak >= self.consistency_th and chosen is None:
                chosen = c
        self.consistent_groups = new_groups
        return chosen

    # ------------------------------------------------------------------
    def _verify_and_correct(self, slot: int, cand: int) -> bool:
        a = self.map.arrays
        cam = self.cam
        mono = self.cfg.sensor == "mono"

        (idx, pair_ok, p1c, p2c, xy1, xy2, is2_1, is2_2) = _loop_pairs_kernel(
            a, cam, jnp.asarray(slot, jnp.int32), jnp.asarray(cand, jnp.int32)
        )

        # 3D-3D Horn RANSAC. The inlier threshold is metric for RGB-D; a
        # monocular map's scale is arbitrary (and drifts -- that is the
        # point of the 7-DoF correction), so the mono threshold scales
        # with the slot side's median scene depth.
        if mono:
            z = jnp.where(pair_ok, p1c[:, 2], jnp.nan)
            med_z = jnp.nanmedian(z)
            inlier_th = jnp.maximum(0.04 * med_z, 1e-4)
        else:
            inlier_th = jnp.asarray(0.08)
        sres = ransac_sim3(
            p1c, p2c, pair_ok, jax.random.PRNGKey(slot),
            fix_scale=not mono, inlier_th=inlier_th,
        )
        if not bool(sres.ok) or int(sres.num_inliers) < 20:
            return False

        # Sim3 refinement by mutual reprojection (OptimizeSim3,
        # src/Optimizer.cc:1364) over the RANSAC inliers.
        opt = optimize_sim3(
            cam, sres.sim3, p1c, xy1, p2c, xy2,
            pair_ok & sres.inliers, is2_1, is2_2, fix_scale=not mono,
        )
        if int(opt.num_inliers) < 20:
            return False
        g = opt.sim3

        # Guided re-search with the corrected similarity + the reference's
        # >= 40 accept gate (src/LoopClosing.cc:509-560): project the
        # candidate's covisible landmark neighbourhood into the slot
        # keyframe and demand broad agreement -- this is what kills
        # perceptual-aliasing false positives that survive the 3D RANSAC.
        cand_kfs = self.map.local_keyframes(cand, 6)
        view_ids = self.map.local_point_ids(cand_kfs)
        V = self.cfg.tracking.max_map_points_local
        if len(view_ids) > V:
            view_ids = view_ids[:V]
        ids_p = np.full(V, -1, np.int64)
        ids_p[: len(view_ids)] = view_ids
        gidx, gvalid, n_guided = _guided_search_kernel(
            a, cam, jnp.asarray(slot, jnp.int32), jnp.asarray(cand, jnp.int32),
            jnp.asarray(ids_p.astype(np.int32)),
            g.R, g.t, g.s, jnp.asarray(8.0),
        )
        n_g = int(n_guided)
        if n_g < 40:
            self.rejected_by_gate += 1
            return False

        # a verified new loop aborts any in-flight global BA before the
        # correction rewrites the map (reference mbStopGBA,
        # src/LoopClosing.cc:591-595)
        if self.gba is not None:
            self.gba.abort()
            self.gba = None
            self.gba_aborts += 1

        T_rel = np.eye(4, dtype=np.float32)
        T_rel[:3, :3] = np.asarray(g.R)
        T_rel[:3, 3] = np.asarray(g.t)
        s_rel = float(g.s)
        self._pose_graph_correct(slot, cand, T_rel, s_rel)
        # persist the loop edge (KeyFrame::AddLoopEdge): future essential
        # graphs keep this loop rigid, and its endpoints are cull-protected
        self.map.loop_edges.append((slot, cand, T_rel.copy(), s_rel))

        # SearchAndFuse (src/LoopClosing.cc:690-810): merge duplicate
        # landmarks across the two sides of the loop using the guided-
        # search matches (candidate-side landmark <-> slot keypoint).
        self.fused_last_loop = self._fuse_across_loop(
            slot, ids_p, np.asarray(gidx), np.asarray(gvalid)
        )

        # background joint global BA (RunGlobalBundleAdjustment,
        # src/LoopClosing.cc:881): first LM phase dispatched now (async on
        # device), later phases advanced by subsequent keyframe ticks, the
        # whole solve abortable if another loop verifies meanwhile
        from .global_ba import GlobalBundleAdjustment
        self.gba = GlobalBundleAdjustment(self.map, fixed_kf=cand)
        if not self.gba.step():
            self.gba.finish()
            self.gba = None
        return True

    # ------------------------------------------------------------------
    def _fuse_across_loop(
        self, slot: int, view_ids: np.ndarray, gidx: np.ndarray,
        gvalid: np.ndarray,
    ) -> int:
        """Host half of SearchAndFuse: for each candidate-side landmark
        matched into the slot keyframe, either merge it with the slot
        keypoint's existing (different) landmark -- keeping the one with
        more observations, like MapPoint::Replace -- or add the missing
        observation."""
        m = self.map
        merges = {}
        gained = []
        obs_slot = m.kf_obs_np[slot]
        for vi in np.where(gvalid & (view_ids >= 0))[0]:
            lm_cand = int(view_ids[vi])
            k = int(gidx[vi])
            if not m.pt_alive[lm_cand]:
                continue
            lm_slot = int(obs_slot[k])
            if lm_slot < 0:
                gained.append((k, lm_cand))
                m.kf_obs_np[slot][k] = lm_cand
                m.pt_obs_count[lm_cand] += 1
            elif lm_slot != lm_cand and m.pt_alive[lm_slot]:
                keep, lose = (
                    (lm_slot, lm_cand)
                    if m.pt_obs_count[lm_slot] >= m.pt_obs_count[lm_cand]
                    else (lm_cand, lm_slot)
                )
                merges[lose] = keep
        if gained:
            from ..slam_map.slam_map import _scatter_obs_kernel
            PAD = 256
            for start in range(0, len(gained), PAD):
                chunk = gained[start : start + PAD]
                js = np.zeros(PAD, np.int32)
                vs = np.full(PAD, -1, np.int32)
                js[: len(chunk)] = [gk for gk, _ in chunk]
                vs[: len(chunk)] = [gv for _, gv in chunk]
                m.arrays = _scatter_obs_kernel(
                    m.arrays, jnp.asarray(slot, jnp.int32),
                    jnp.asarray(js), jnp.asarray(vs),
                )
        if merges:
            m._apply_merges(merges)
            m.version += 1
        if gained:
            m._update_covisibility(slot)
            m.version += 1
        return len(merges)

    # ------------------------------------------------------------------
    def _pose_graph_correct(
        self, slot: int, cand: int, T_rel: np.ndarray, s_rel: float = 1.0
    ):
        """Essential-graph optimization with the new loop edge
        (CorrectLoop + OptimizeEssentialGraph). For monocular sensors the
        graph is 7-DoF (free per-keyframe scale, like the reference's Sim3
        vertices with bFixScale=false, src/Optimizer.cc:1017), which is
        what absorbs accumulated scale drift around the loop."""
        m = self.map
        K = m.n_kfs
        a = m.arrays
        mono = self.cfg.sensor == "mono"
        poses_old = np.array(a.kf_pose[:K])

        # essential graph = spanning tree + strong covisibility + persistent
        # loop edges + the new loop edge (src/Optimizer.cc:1017 builds the
        # same four families), fully vectorized (no per-edge Python loop)
        th = max(self.cfg.map.covis_weight_th, 30)
        ii, jj = np.nonzero(np.triu(m.covis[:K, :K] >= th, k=2))
        # spanning-tree backbone (KeyFrame::mpParent): child -> parent for
        # every alive keyframe; stays connected through culls via the
        # SetBadFlag reparenting in slam_map.remove_keyframe
        par = m.kf_parent[:K]
        child = np.where((par >= 0) & m.kf_alive[:K])[0]
        # persistent loop edges from earlier closures (KeyFrame::mLoopEdges)
        # keep already-closed loops rigid while this correction warps the
        # rest of the trajectory around the new one
        old_loops = [
            (i, j, T, s) for (i, j, T, s) in m.loop_edges
            if i < K and j < K and m.kf_alive[i] and m.kf_alive[j]
        ]
        oi = np.asarray([e[0] for e in old_loops], np.int64)
        oj = np.asarray([e[1] for e in old_loops], np.int64)
        ei = np.concatenate([child, ii, oi, [slot]]).astype(np.int64)
        ej = np.concatenate([par[child], jj, oj, [cand]]).astype(np.int64)
        ew = np.concatenate(
            [np.ones(len(child)), np.full(len(ii), 0.5),
             np.full(len(oi), 10.0), [10.0]]
        ).astype(np.float32)
        # rel[e] = T_j T_i^-1 with the batched SE3 inverse
        Ri = poses_old[ei, :3, :3]
        ti = poses_old[ei, :3, 3]
        Tj = poses_old[ej]
        RiT = Ri.transpose(0, 2, 1)
        eR = np.einsum("nij,njk->nik", Tj[:, :3, :3], RiT)
        et = Tj[:, :3, 3] - np.einsum("nij,nj->ni", eR, ti)
        E = len(ei)
        edge_s = np.ones(E, np.float32)
        # measured relative transforms for the old + new loop edges (the
        # odometry-derived rel would be wrong across a loop by definition)
        for k, (_, _, T_o, s_o) in enumerate(old_loops):
            eR[len(child) + len(ii) + k] = T_o[:3, :3]
            et[len(child) + len(ii) + k] = T_o[:3, 3]
            edge_s[len(child) + len(ii) + k] = s_o
        eR[-1] = T_rel[:3, :3]
        et[-1] = T_rel[:3, 3]
        edge_s[-1] = s_rel
        prob = PoseGraphProblem(
            R=jnp.asarray(poses_old[:, :3, :3].astype(np.float32)),
            t=jnp.asarray(poses_old[:, :3, 3].astype(np.float32)),
            s=jnp.ones(K),
            pose_valid=jnp.ones(K, bool),
            pose_fixed=jnp.zeros(K, bool).at[cand].set(True),
            edge_i=jnp.asarray(ei.astype(np.int32)),
            edge_j=jnp.asarray(ej.astype(np.int32)),
            edge_R=jnp.asarray(eR.astype(np.float32)),
            edge_t=jnp.asarray(et.astype(np.float32)),
            edge_s=jnp.asarray(edge_s),
            edge_w=jnp.asarray(ew),
        )
        res = optimize_pose_graph(prob, iters=15, fix_scale=not mono)
        R_new = np.asarray(res.R)
        t_new = np.asarray(res.t)
        s_new = np.asarray(res.s) if mono else np.ones(K, np.float32)

        # Keyframe SE3 poses from the corrected Sim3: Tcw = [R | t/s]
        # (the reference's CorrectLoop, src/LoopClosing.cc:640-648).
        poses_new = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        poses_new[:, :3, :3] = R_new
        poses_new[:, :3, 3] = t_new / np.maximum(s_new, 1e-9)[:, None]

        # Landmark re-anchoring through the first (reference) keyframe's
        # correction: pc = T_old p (camera coords, pre-correction), then
        # p' = S_new^-1 pc = (1/s) R^T (pc - t) (src/LoopClosing.cc:620-636).
        first = np.array(a.pt_first_kf)
        alive = m.pt_alive & (first >= 0) & (first < K)
        ids = np.where(alive)[0]
        if len(ids) > 0:
            f = first[ids]
            T_old = poses_old[f]
            pts = np.array(a.pt_pos[ids])
            pc = np.einsum("nij,nj->ni", T_old[:, :3, :3], pts) + T_old[:, :3, 3]
            Rn = R_new[f].transpose(0, 2, 1)
            sw = np.maximum(s_new[f], 1e-9)[:, None]
            pw = np.einsum("nij,nj->ni", Rn, pc - t_new[f]) / sw
            new_pts = pw.astype(np.float32)
        else:
            ids = np.zeros(0, np.int64)
            new_pts = np.zeros((0, 3), np.float32)

        # scatter back on device
        m.version += 1
        arr = a._replace(
            kf_pose=a.kf_pose.at[jnp.arange(K)].set(
                jnp.asarray(poses_new.astype(np.float32))
            ),
            pt_pos=a.pt_pos.at[jnp.asarray(ids.astype(np.int32))].set(
                jnp.asarray(new_pts)
            ) if len(ids) else a.pt_pos,
        )
        m.arrays = arr
