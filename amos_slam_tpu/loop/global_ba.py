"""Global map refinement (the reference's background global BA).

LoopClosing::RunGlobalBundleAdjustment (reference src/LoopClosing.cc:881)
runs full BA in a detached thread after a loop closes, abortable when a new
loop arrives (mbStopGBA, src/LoopClosing.cc:591-595), with a spanning-tree
merge for keyframes inserted while it ran (src/LoopClosing.cc:920-1010).
Two TPU-native flavours live here:

* :class:`GlobalBundleAdjustment` -- **joint camera+structure LM** over all
  keyframes (Optimizer::GlobalBundleAdjustemnt, src/Optimizer.cc:55-361),
  reusing the local-BA Schur machinery with the keyframe axis padded to the
  map capacity and the landmark set capped to the most-observed points.
  Runs in PHASES of a few LM iterations each; between phases the host
  checks a cooperative abort flag -- the exact analogue of the reference's
  mbStopGBA check between g2o iterations. On finish, keyframes and
  landmarks created during the solve are merged by propagating their
  reference keyframe's correction.

* :func:`run_global_refinement` -- cheaper **motion-then-structure**
  alternation (pose-graph GN over all keyframes, then structure-only
  landmark refits), kept for keyframe-rate use and as the fallback when
  the map outgrows the joint solve's landmark cap.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3
from ..solvers.local_ba import solve_local_ba
from ..solvers.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..solvers.structure_only import refine_points


def _bucket(n: int, lo: int, hi: int) -> int:
    """Smallest power-of-two >= n, clamped to [lo, hi]."""
    b = lo
    while b < n:
        b *= 2
    return min(b, hi)


class GlobalBundleAdjustment:
    """Abortable, phase-wise joint global BA (see module docstring).

    Usage (blocking):
        gba = GlobalBundleAdjustment(slam_map, fixed_kf=cand)
        gba.run(abort_check=lambda: new_loop_arrived)
    or phase-wise (pipelined through a fetcher):
        while gba.step():
            if should_abort: gba.abort(); break
        gba.finish()   # no-op if aborted
    """

    def __init__(
        self,
        slam_map,
        fixed_kf: int = 0,
        phases: int = 3,
        iters_per_phase=(2, 2),
        max_points: Optional[int] = None,
    ):
        m = slam_map
        self.m = m
        self.aborted = False
        self.finished = False
        self.phases_left = phases
        self.iters = iters_per_phase
        self.k0 = m.n_kfs          # keyframes snapshot: later ones merge
        self.n_pts0 = m.n_pts

        alive = np.where(m.kf_alive[: m.n_kfs])[0]
        self.alive = alive
        free = alive != fixed_kf
        if free.all() and len(alive) > 0:
            free[0] = False        # gauge
        self.free = free
        cap = max_points or 4 * m.cfg.map.ba_max_points
        pt_ids = np.where(m.pt_alive)[0]
        self.capped = len(pt_ids) > cap
        if self.capped:
            pt_ids = pt_ids[np.argsort(-m.pt_obs_count[pt_ids])[:cap]]
        self.pt_set = pt_ids

        # Padded axes are BUCKETED to powers of two (clamped to the map
        # capacity): the Schur S_off einsum is O(K^2 M), so padding the
        # keyframe axis straight to capacity would waste ~16x FLOPs at
        # typical map sizes, while bucketing costs at most log2(K)
        # compiles over a whole run.
        Kb = _bucket(len(alive), 32, m.K)
        Pb = _bucket(len(pt_ids), 256, cap)
        prob, self.slots_j, self.free_p, self.pt_ids_p = m.build_ba_problem(
            alive, free, pt_ids, Kb, Pb
        )
        self.prob = prob

    def step(self) -> bool:
        """Dispatch one LM phase. Returns True while phases remain."""
        if self.aborted or self.finished or self.phases_left <= 0:
            return False
        res = solve_local_ba(
            self.m.cam, self.prob,
            iters_phase1=self.iters[0], iters_phase2=self.iters[1],
        )
        self.prob = self.prob._replace(kf_pose=res.kf_pose, points=res.points)
        self.phases_left -= 1
        return self.phases_left > 0

    def abort(self):
        """Cooperative abort (reference mbStopGBA): the result is discarded
        -- finish() becomes a no-op."""
        self.aborted = True

    def finish(self):
        """Apply the solution and merge keyframes/landmarks created while
        the solve ran (reference spanning-tree merge,
        src/LoopClosing.cc:920-1010)."""
        if self.aborted or self.finished:
            return
        self.finished = True
        m = self.m

        # Old poses of every current keyframe, BEFORE applying (one
        # loop-rate host fetch).
        K_now = m.n_kfs
        poses_old = np.array(m.arrays.kf_pose[:K_now])
        new_poses = np.array(self.prob.kf_pose)       # (K_cap, 4, 4)

        m.apply_ba_result(
            self.slots_j, self.free_p, self.pt_ids_p,
            self.prob.kf_pose, self.prob.points,
        )

        # --- merge: keyframes inserted after the snapshot propagate their
        # SPANNING-TREE parent's correction, in slot order (the reference's
        # mpParent walk, src/LoopClosing.cc:920-1010; parents always have a
        # lower slot, so slot order is a valid topological order). NOTE: the
        # BA problem's keyframe axis is in self.alive order, not slot order.
        if K_now > self.k0 or self.capped or m.n_pts > self.n_pts0:
            corrected = poses_old.copy()
            moved = self.alive[self.free]
            corrected[moved] = new_poses[: len(self.alive)][self.free]
            for k in range(self.k0, K_now):
                p = int(m.kf_parent[k]) if hasattr(m, "kf_parent") else -1
                parent = p if 0 <= p < k else k - 1
                rel = poses_old[k] @ np.linalg.inv(poses_old[parent])
                corrected[k] = rel @ corrected[parent]
            if K_now > self.k0:
                sl = jnp.asarray(
                    np.arange(self.k0, K_now, dtype=np.int32)
                )
                m.arrays = m.arrays._replace(
                    kf_pose=m.arrays.kf_pose.at[sl].set(
                        jnp.asarray(corrected[self.k0 :])
                    )
                )
            # landmarks outside the optimized set (capped out or created
            # during the solve): re-anchor through their first keyframe
            in_set = np.zeros(m.M, bool)
            in_set[self.pt_set] = True
            first = m.pt_birth_kf   # host mirror of pt_first_kf: free read
            todo = m.pt_alive & ~in_set & (first >= 0) & (first < K_now)
            ids = np.where(todo)[0]
            if len(ids) > 0:
                f = first[ids]
                T_old = poses_old[f]
                T_new = corrected[f]
                pts = np.array(m.arrays.pt_pos[ids])
                pc = np.einsum(
                    "nij,nj->ni", T_old[:, :3, :3], pts
                ) + T_old[:, :3, 3]
                Rn = T_new[:, :3, :3].transpose(0, 2, 1)
                pw = np.einsum("nij,nj->ni", Rn, pc - T_new[:, :3, 3])
                m.arrays = m.arrays._replace(
                    pt_pos=m.arrays.pt_pos.at[
                        jnp.asarray(ids.astype(np.int32))
                    ].set(jnp.asarray(pw.astype(np.float32)))
                )
            m.version += 1

    def run(self, abort_check: Optional[Callable[[], bool]] = None):
        """Blocking convenience driver: run all phases with the abort flag
        checked between them, then apply+merge."""
        while self.step():
            if abort_check is not None and abort_check():
                self.abort()
                return
        self.finish()


def harvest_observations(slam_map, ids: np.ndarray, max_obs: int = 8):
    """Padded (P, OBS) observation tables for the given landmark ids, from
    the host mirror (kf slot + keypoint index per observation)."""
    P = len(ids)
    kf_of = np.zeros((P, max_obs), np.int64)
    kp_of = np.zeros((P, max_obs), np.int64)
    cnt = np.zeros(P, np.int64)
    remap = {int(p): i for i, p in enumerate(ids)}
    obs = slam_map.kf_obs_np[: slam_map.n_kfs]
    kfs, kps = np.where(obs >= 0)
    for kf, kp in zip(kfs, kps):
        li = remap.get(int(obs[kf, kp]))
        if li is not None and cnt[li] < max_obs:
            kf_of[li, cnt[li]] = kf
            kp_of[li, cnt[li]] = kp
            cnt[li] += 1
    return kf_of, kp_of, cnt


def run_global_refinement(
    slam_map,
    fixed_kf: int = 0,
    pose_iters: int = 15,
    structure_iters: int = 4,
    covis_edge_th: int = 30,
    max_points: int = 0,
):
    """Motion-then-structure global refinement over the whole map."""
    m = slam_map
    K = m.n_kfs
    if K < 3:
        return

    # ---- 1. pose graph over all keyframes -------------------------------
    a = m.arrays
    poses_old = np.array(a.kf_pose[:K])
    kf_ok = np.array(a.kf_valid[:K])
    # odometry chain between consecutive ALIVE keyframes + covisibility
    # edges, fully vectorized (no per-edge Python at map scale)
    alive = np.where(kf_ok)[0]
    if len(alive) < 3:
        return
    covis_ok = np.triu(m.covis[:K, :K] >= covis_edge_th, k=2)
    covis_ok &= kf_ok[:, None] & kf_ok[None, :]
    ci, cj = np.nonzero(covis_ok)
    ei = np.concatenate([alive[:-1], ci]).astype(np.int64)
    ej = np.concatenate([alive[1:], cj]).astype(np.int64)
    ew = np.concatenate(
        [np.ones(len(alive) - 1), np.full(len(ci), 0.5)]
    ).astype(np.float32)
    Ri = poses_old[ei, :3, :3]
    ti = poses_old[ei, :3, 3]
    Tj = poses_old[ej]
    eR = np.einsum("nij,nkj->nik", Tj[:, :3, :3], Ri)  # Rj Ri^T
    et = Tj[:, :3, 3] - np.einsum("nij,nj->ni", eR, ti)
    E = len(ei)
    prob = PoseGraphProblem(
        R=jnp.asarray(poses_old[:, :3, :3].astype(np.float32)),
        t=jnp.asarray(poses_old[:, :3, 3].astype(np.float32)),
        s=jnp.ones(K),
        pose_valid=jnp.asarray(kf_ok),
        pose_fixed=jnp.zeros(K, bool).at[fixed_kf].set(True),
        edge_i=jnp.asarray(ei.astype(np.int32)),
        edge_j=jnp.asarray(ej.astype(np.int32)),
        edge_R=jnp.asarray(eR.astype(np.float32)),
        edge_t=jnp.asarray(et.astype(np.float32)),
        edge_s=jnp.ones(E),
        edge_w=jnp.asarray(ew),
    )
    res = optimize_pose_graph(prob, iters=pose_iters, fix_scale=True)
    poses_new = se3.make_T(res.R, res.t)

    m.version += 1
    m.arrays = m.arrays._replace(
        kf_pose=m.arrays.kf_pose.at[jnp.arange(K)].set(
            poses_new.astype(jnp.float32)
        )
    )

    # ---- 2. structure-only refinement -----------------------------------
    ids = np.where(m.pt_alive)[0]
    if max_points and len(ids) > max_points:
        ids = ids[np.argsort(-m.pt_obs_count[ids])[:max_points]]
    if len(ids) == 0:
        return
    kf_of, kp_of, cnt = harvest_observations(m, ids)
    OBS = kf_of.shape[1]
    a = m.arrays
    kf_j = jnp.asarray(kf_of.astype(np.int32))
    kp_j = jnp.asarray(kp_of.astype(np.int32))
    ids_j = jnp.asarray(ids.astype(np.int32))
    obs_valid = (
        jax.lax.broadcasted_iota(jnp.int32, kf_of.shape, 1)
        < jnp.asarray(cnt.astype(np.int32))[:, None]
    ).astype(jnp.float32)
    X, chi2 = refine_points(
        m.cam,
        a.pt_pos[ids_j],
        a.pt_valid[ids_j],
        a.kf_pose[kf_j],
        a.kf_xy[kf_j, kp_j],
        obs_valid,
        a.kf_inv_sigma2[kf_j, kp_j],
        iters=structure_iters,
    )
    m.arrays = m.arrays._replace(pt_pos=m.arrays.pt_pos.at[ids_j].set(X))
