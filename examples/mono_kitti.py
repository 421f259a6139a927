#!/usr/bin/env python
"""KITTI monocular driver (reference Examples/Monocular/mono_kitti.cc).

Usage:
    python examples/mono_kitti.py SEQ_DIR --sequence N
        [--out KeyFrameTrajectory.txt] [--max-frames N]

Tracks the left grayscale camera (image_0) monocularly with the per-
sequence KITTI intrinsics and writes the keyframe trajectory.
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir")
    ap.add_argument("--sequence", type=int, default=0,
                    help="KITTI sequence number for intrinsics (0-21)")
    ap.add_argument("--out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from amos_slam_tpu.config import SystemConfig, ORBConfig
    from amos_slam_tpu.io.kitti import kitti_camera_config
    from amos_slam_tpu.system import System

    cfg = SystemConfig(
        camera=kitti_camera_config(args.sequence),
        orb=ORBConfig(n_features=2000),   # reference mono_kitti: 2000
        sensor="mono",
        use_dynamics=False,
    )

    from PIL import Image

    left_dir = os.path.join(args.seq_dir, "image_0")
    names = sorted(os.listdir(left_dir))
    with open(os.path.join(args.seq_dir, "times.txt")) as f:
        times_list = [float(l) for l in f if l.strip()]
    n = min(len(names), len(times_list))
    if args.max_frames > 0:
        n = min(n, args.max_frames)

    slam = System(cfg)
    times = []
    for i in range(n):
        gray = np.asarray(
            Image.open(os.path.join(left_dir, names[i])).convert("L"),
            np.float32,
        )
        t0 = time.perf_counter()
        slam.track_monocular(gray, times_list[i])
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            s = slam.stats[-1]
            print(f"[{i}/{n}] {slam.state.name} inliers={s['inliers']}")
    slam.shutdown()
    slam.save_keyframe_trajectory_tum(args.out)
    times = np.asarray(times)
    print(f"median {np.median(times)*1e3:.1f} ms | mean {times.mean()*1e3:.1f} ms")
    print(f"keyframe trajectory -> {args.out}")


if __name__ == "__main__":
    main()
