"""Global map refinement (the reference's background global BA).

LoopClosing::RunGlobalBundleAdjustment (reference src/LoopClosing.cc:881)
runs full BA in a detached thread after a loop closes. A dense full BA over
512 keyframes x 32k landmarks does not fit the Schur dense-coupling layout
(the (K, M, 6, 3) coupling block alone would be >1 GB), so the TPU-native
decomposition is **motion-then-structure**:

  1. pose-graph GN over ALL keyframes (odometry + covisibility edges,
     exact Jacobians -- solvers/pose_graph.py), which carries the loop
     correction through the whole trajectory;
  2. structure-only refinement: with poses fixed, all landmarks solve their
     independent 3x3 GN problems simultaneously (solvers/structure_only.py).

Alternating these two steps converges to the same fixed point as full BA
for well-conditioned problems; one alternation after a loop matches the
reference's single GBA pass in practice.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3
from ..solvers.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..solvers.structure_only import refine_points


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
    ei, ej, eR, et, ew = [], [], [], [], []

    def add_edge(i, j, w):
        rel = poses_old[j] @ np.linalg.inv(poses_old[i])
        ei.append(i)
        ej.append(j)
        eR.append(rel[:3, :3])
        et.append(rel[:3, 3])
        ew.append(w)

    prev = None
    for kf in range(K):
        if not kf_ok[kf]:
            continue
        if prev is not None:
            add_edge(prev, kf, 1.0)
        prev = kf
    for i in range(K):
        if not kf_ok[i]:
            continue
        for j in range(i + 2, K):
            if kf_ok[j] and m.covis[i, j] >= covis_edge_th:
                add_edge(i, j, 0.5)
    if not ei:
        return
    E = len(ei)
    prob = PoseGraphProblem(
        R=jnp.asarray(poses_old[:, :3, :3].astype(np.float32)),
        t=jnp.asarray(poses_old[:, :3, 3].astype(np.float32)),
        s=jnp.ones(K),
        pose_valid=jnp.asarray(kf_ok),
        pose_fixed=jnp.zeros(K, bool).at[fixed_kf].set(True),
        edge_i=jnp.asarray(np.asarray(ei, np.int32)),
        edge_j=jnp.asarray(np.asarray(ej, np.int32)),
        edge_R=jnp.asarray(np.stack(eR).astype(np.float32)),
        edge_t=jnp.asarray(np.stack(et).astype(np.float32)),
        edge_s=jnp.ones(E),
        edge_w=jnp.asarray(np.asarray(ew, np.float32)),
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
