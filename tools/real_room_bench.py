#!/usr/bin/env python
"""Real-imagery room rows for BASELINE.md (round-5, VERDICT item 6).

Measures, on whatever backend is active (run on the TPU for the recorded
rows), the multi-plane REAL-textured room from io.warp_replay:

  static : chunked no-dynamics RGB-D SLAM -- FPS + ATE
  dynamic: the same room with a REAL-textured moving plane --
           two-stage (oracle stage-1 mask + geometric stage) vs
           unprotected ATE, and two-stage FPS

This is the closest achievable stand-in for the TUM fr1/xyz (static) and
fr3/walking_xyz (dynamic) table rows in an environment that vendors no
full TUM sequence (eval protocol: /root/reference/src/System.cc:429 +
groundtruth.txt).

Usage: cd /root/repo && timeout 1800 python tools/real_room_bench.py
Prints one JSON object.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amos_slam_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.io import synthetic, evaluate
from amos_slam_tpu.io.warp_replay import real_room, real_room_with_mover

CH = 8
N = 96


def chunks(frames_np):
    g = [jnp.stack([jnp.asarray(f[0], jnp.float32) for f in frames_np[k:k + CH]])
         for k in range(0, N, CH)]
    d = [jnp.stack([jnp.asarray(f[1], jnp.float32) for f in frames_np[k:k + CH]])
         for k in range(0, N, CH)]
    return g, d


def run_chunked(cfg, gs, ds, masks=None):
    slam = System(cfg)
    for k in range(len(gs)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        m = masks[k] if masks is not None else None
        slam.track_rgbd_chunk(gs[k], ds[k], ts, seg_masks=m)
    slam.shutdown()
    return slam


def ate_of(slam, gt):
    est = np.asarray(slam.corrected_poses_np())
    return float(evaluate.ate_rmse(
        evaluate.positions_from_cw(est),
        evaluate.positions_from_cw(np.asarray(gt)),
    ))


def main():
    out = {"device": str(jax.devices()[0])}
    gt = synthetic.orbit_trajectory(N, radius=0.1, advance=0.25)

    # ---- static real room ------------------------------------------------
    planes = real_room(seed=3)
    if planes is None:
        print(json.dumps({"error": "reference real frames not present"}))
        return
    frames = [synthetic.render(planes, T) for T in gt]
    gs, ds = chunks(frames)
    cfg = SystemConfig(use_dynamics=False)
    run_chunked(cfg, gs, ds)            # warmup/compile
    slam = System(cfg)
    t0 = time.perf_counter()
    for k in range(len(gs)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam.track_rgbd_chunk(gs[k], ds[k], ts)
    slam.shutdown()
    out["static_fps"] = round(N / (time.perf_counter() - t0), 2)
    out["static_ate_m"] = round(ate_of(slam, gt), 4)

    # ---- dynamic real room (real-textured mover) ------------------------
    dyn_frames, dyn_masks = [], []
    for i, T in enumerate(gt):
        planes, mover = real_room_with_mover(seed=3, t=i / 30.0, speed=1.5)
        g, d, ids = synthetic.render(planes, T, return_ids=True)
        dyn_frames.append((g, d))
        dyn_masks.append(ids == mover)
    gs, ds = chunks(dyn_frames)
    mstacks = [
        jnp.stack([jnp.asarray(dyn_masks[k + i]) for i in range(CH)])
        for k in range(0, N, CH)
    ]

    dcfg = SystemConfig(use_dynamics=True)
    run_chunked(dcfg, gs, ds, mstacks)  # warmup/compile
    slam_d = System(dcfg)
    t0 = time.perf_counter()
    for k in range(len(gs)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam_d.track_rgbd_chunk(gs[k], ds[k], ts, seg_masks=mstacks[k])
    slam_d.shutdown()
    out["dynamic_two_stage_fps"] = round(N / (time.perf_counter() - t0), 2)
    out["dynamic_two_stage_ate_m"] = round(ate_of(slam_d, gt), 4)

    slam_off = run_chunked(SystemConfig(use_dynamics=False), gs, ds)
    out["dynamic_unprotected_ate_m"] = round(ate_of(slam_off, gt), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
