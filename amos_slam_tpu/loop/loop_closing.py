"""Loop detection, Sim3 verification, and loop correction.

Replaces the reference's LoopClosing thread (src/LoopClosing.cc:72-880:
DetectLoop with covisibility-consistency, ComputeSim3 RANSAC + guided
re-search, CorrectLoop with Sim3 propagation + SearchAndFuse +
OptimizeEssentialGraph + background global BA). Runs at keyframe rate on
the host, dispatching jitted device kernels:

  detect   -> BoW retrieval (kf_database) with temporal consistency
  verify   -> full Hamming match (no BoW windowing -- one MXU matmul) +
              3D-3D Horn Sim3/SE3 RANSAC on RGB-D backprojections
  correct  -> essential-graph pose-graph GN over all keyframes with
              covisibility + odometry + loop edges; landmark positions
              re-anchored through their reference keyframe's correction
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geometry import se3
from ..geometry.camera import Camera, backproject
from ..ops import hamming
from ..solvers.sim3_solver import ransac_sim3
from ..solvers.pnp import ransac_pnp
from ..solvers.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..slam_map.slam_map import SlamMap
from .vocabulary import Vocabulary, transform, _transform_impl
from .kf_database import KeyFrameDatabase

import functools


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


class LoopCloser:
    def __init__(self, cfg: SystemConfig, cam: Camera, voc: Vocabulary,
                 slam_map: SlamMap):
        self.cfg = cfg
        self.cam = cam
        self.voc = voc
        self.map = slam_map
        self.db = KeyFrameDatabase(voc.n_words)
        self.consistency: dict = {}
        self.last_loop_kf = -999
        self.loops_closed: List[Tuple[int, int]] = []

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
    def relocalize(self, feats) -> Optional[Tuple[np.ndarray, int]]:
        """Relocalize a LOST frame against the keyframe database.

        Contract of Tracking::Relocalization (src/Tracking.cc:2591): BoW
        candidates -> descriptor matching -> PnP-RANSAC -> accept on inlier
        count. Returns (Tcw, num_inliers) or None.
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
            kf_depth = a.kf_depth[cand][j]
            pair_ok = res.valid & (kf_depth > 0)
            if int(jnp.sum(pair_ok)) < 15:
                continue
            pc = backproject(
                self.cam, a.kf_xy[cand][j], jnp.maximum(kf_depth, 1e-3)
            )
            Twc = se3.inv_T(a.kf_pose[cand])
            pts_w = se3.transform_points(Twc, pc)
            pnp = ransac_pnp(
                self.cam, pts_w, feats.xy_un, pair_ok,
                jax.random.PRNGKey(cand + 99), inlier_th_px=4.0,
                min_inliers=20,
            )
            n = int(pnp.num_inliers)
            if bool(pnp.ok) and (best is None or n > best[1]):
                best = (np.asarray(pnp.Tcw), n)
        return best

    # ------------------------------------------------------------------
    def _detect(self, slot: int, words, weights) -> Optional[int]:
        """BoW candidates excluding the covisible neighbourhood, gated by
        the min covisible score (DetectLoop, src/LoopClosing.cc:134-250),
        with 2-keyframe temporal consistency."""
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
            self.consistency = {}
            return None
        # temporal consistency: a candidate region must recur
        new_consistency = {}
        chosen = None
        for c in cands:
            streak = 1 + max(
                (v for p, v in self.consistency.items() if abs(p - c) <= 3),
                default=0,
            )
            new_consistency[c] = streak
            if streak >= 2 and chosen is None:
                chosen = c
        self.consistency = new_consistency
        return chosen

    # ------------------------------------------------------------------
    def _verify_and_correct(self, slot: int, cand: int) -> bool:
        a = self.map.arrays
        cam = self.cam

        # descriptor matching current-KF vs candidate-KF (full matrix)
        d = hamming.hamming_matrix(a.kf_desc[slot], a.kf_desc[cand])
        ok = a.kf_kp_valid[slot][:, None] & a.kf_kp_valid[cand][None, :]
        res = hamming.match(
            hamming.apply_mask(d, ok), max_dist=60, nn_ratio=0.75, mutual=True,
            angle_q=a.kf_angle[slot], angle_t=a.kf_angle[cand],
        )
        # 3D-3D pairs from both keyframes' depth
        j = jnp.maximum(res.idx, 0)
        d1 = a.kf_depth[slot]
        d2 = a.kf_depth[cand][j]
        pair_ok = res.valid & (d1 > 0) & (d2 > 0)
        p1c = backproject(cam, a.kf_xy[slot], jnp.maximum(d1, 1e-3))
        p2c = backproject(cam, a.kf_xy[cand][j], jnp.maximum(d2, 1e-3))

        sres = ransac_sim3(
            p1c, p2c, pair_ok, jax.random.PRNGKey(slot),
            fix_scale=(self.cfg.sensor != "mono"), inlier_th=0.08,
        )
        if not bool(sres.ok) or int(sres.num_inliers) < 20:
            return False

        # Loop relative pose: S_cand_slot maps camera-slot coords into
        # camera-cand coords. Corrected pose of slot: T_slot' = S^-1... we
        # express the measured relative transform directly for the edge:
        # T_cand_from_slot (camera frames).
        g = sres.sim3
        T_rel = np.eye(4, dtype=np.float32)
        T_rel[:3, :3] = np.asarray(g.R)
        T_rel[:3, 3] = np.asarray(g.t)
        # edge measurement: S_ji with i=slot, j=cand: T_cand * T_slot^-1
        self._pose_graph_correct(slot, cand, T_rel)
        # background global BA equivalent (RunGlobalBundleAdjustment,
        # src/LoopClosing.cc:881): structure refit to the corrected poses;
        # dispatched async on device, overlapping subsequent tracking
        from .global_ba import run_global_refinement
        run_global_refinement(self.map, fixed_kf=cand, pose_iters=5)
        return True

    # ------------------------------------------------------------------
    def _pose_graph_correct(self, slot: int, cand: int, T_rel: np.ndarray):
        """Essential-graph optimization with the new loop edge
        (CorrectLoop + OptimizeEssentialGraph)."""
        m = self.map
        K = m.n_kfs
        a = m.arrays
        poses_old = np.array(a.kf_pose[:K])

        ei, ej, eR, et, ew = [], [], [], [], []

        def add_edge(i, j, w):
            rel = poses_old[j] @ np.linalg.inv(poses_old[i])
            ei.append(i)
            ej.append(j)
            eR.append(rel[:3, :3])
            et.append(rel[:3, 3])
            ew.append(w)

        # odometry chain (the reference's spanning tree)
        for kf in range(1, K):
            add_edge(kf - 1, kf, 1.0)
        # covisibility edges (weight >= threshold)
        th = max(self.cfg.map.covis_weight_th, 30)
        for i in range(K):
            for j in range(i + 2, K):
                if m.covis[i, j] >= th:
                    add_edge(i, j, 0.5)
        # the loop edge, with the *measured* relative transform
        ei.append(slot)
        ej.append(cand)
        eR.append(T_rel[:3, :3])
        et.append(T_rel[:3, 3])
        ew.append(10.0)

        E = len(ei)
        prob = PoseGraphProblem(
            R=jnp.asarray(poses_old[:, :3, :3].astype(np.float32)),
            t=jnp.asarray(poses_old[:, :3, 3].astype(np.float32)),
            s=jnp.ones(K),
            pose_valid=jnp.ones(K, bool),
            pose_fixed=jnp.zeros(K, bool).at[cand].set(True),
            edge_i=jnp.asarray(np.asarray(ei, np.int32)),
            edge_j=jnp.asarray(np.asarray(ej, np.int32)),
            edge_R=jnp.asarray(np.stack(eR).astype(np.float32)),
            edge_t=jnp.asarray(np.stack(et).astype(np.float32)),
            edge_s=jnp.ones(E),
            edge_w=jnp.asarray(np.asarray(ew, np.float32)),
        )
        res = optimize_pose_graph(prob, iters=15, fix_scale=True)
        poses_new = np.asarray(se3.make_T(res.R, res.t))

        # apply keyframe poses + re-anchor landmarks through their first
        # (reference) keyframe: p' = Twc_new * Tcw_old * p
        first = np.array(a.pt_first_kf)
        alive = m.pt_alive & (first >= 0) & (first < K)
        ids = np.where(alive)[0]
        if len(ids) > 0:
            f = first[ids]
            T_old = poses_old[f]
            T_new = poses_new[f]
            pts = np.array(a.pt_pos[ids])
            pc = np.einsum("nij,nj->ni", T_old[:, :3, :3], pts) + T_old[:, :3, 3]
            Rn = T_new[:, :3, :3].transpose(0, 2, 1)
            pw = np.einsum("nij,nj->ni", Rn, pc - T_new[:, :3, 3])
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
