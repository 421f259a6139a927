#!/usr/bin/env python
"""EuRoC monocular driver (reference Examples/Monocular/mono_euroc.cc).

Usage: python examples/mono_euroc.py MAV_ROOT [--out traj.txt]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from amos_slam_tpu.config import SystemConfig, ORBConfig
    from amos_slam_tpu.io.euroc import EurocMonoDataset, euroc_camera_config
    from amos_slam_tpu.system import System

    cfg = SystemConfig(
        camera=euroc_camera_config(),
        orb=ORBConfig(n_features=1000),
        sensor="mono",
        use_dynamics=False,
    )
    ds = EurocMonoDataset(args.root)
    slam = System(cfg)
    times = []
    n = len(ds) if args.max_frames <= 0 else min(len(ds), args.max_frames)
    for i in range(n):
        gray, ts = ds[i]
        t0 = time.perf_counter()
        slam.track_monocular(gray, ts)
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            s = slam.stats[-1]
            print(f"[{i}/{n}] {slam.state.name} inliers={s['inliers']}")
    slam.shutdown()
    slam.save_trajectory_tum(args.out)
    times = np.asarray(times)
    print(f"median {np.median(times)*1e3:.1f} ms | mean {times.mean()*1e3:.1f} ms")


if __name__ == "__main__":
    main()
