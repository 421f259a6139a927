#!/usr/bin/env python
"""KITTI stereo driver (reference Examples/Stereo/stereo_kitti.cc).

Usage: python examples/stereo_kitti.py SEQUENCE_DIR --seq-id 0
Writes a KITTI-format trajectory usable with standard odometry evaluation.
"""

import argparse
import dataclasses
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--seq-id", type=int, default=0)
    ap.add_argument("--out", default="KittiTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from amos_slam_tpu.config import SystemConfig, ORBConfig
    from amos_slam_tpu.io.kitti import KittiStereoDataset, kitti_camera_config
    from amos_slam_tpu.system import System

    cam = kitti_camera_config(args.seq_id)
    cfg = SystemConfig(
        camera=cam,
        orb=ORBConfig(n_features=2000, max_kpts=2048),  # reference KITTI yaml
        sensor="stereo",
        use_dynamics=False,
    )
    ds = KittiStereoDataset(args.sequence)
    slam = System(cfg)
    times = []
    n = len(ds) if args.max_frames <= 0 else min(len(ds), args.max_frames)
    for i in range(n):
        left, right, ts = ds[i]
        t0 = time.perf_counter()
        slam.track_stereo(left, right, ts)
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            s = slam.stats[-1]
            print(f"[{i}/{n}] {slam.state.name} inliers={s['inliers']} "
                  f"kfs={slam.map.n_kfs}")
    slam.shutdown()
    slam.save_trajectory_kitti(args.out)
    times = np.asarray(times)
    print(f"median {np.median(times)*1e3:.1f} ms | mean {times.mean()*1e3:.1f} ms")


if __name__ == "__main__":
    main()
