#!/usr/bin/env python
"""EuRoC stereo driver (reference Examples/Stereo/stereo_euroc.cc).

Note: EuRoC stereo requires rectification (the reference uses
cv::initUndistortRectifyMap from the yaml's rectification matrices). This
driver expects PRE-RECTIFIED image directories (e.g. produced offline) and
tracks with the cam0 pinhole intrinsics; for raw EuRoC use mono_euroc.py,
whose analytic undistortion handles the radtan model directly.

Usage: python examples/stereo_euroc.py MAV_ROOT --right MAV_ROOT2 [...]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="rectified cam0 root (mav0/cam0/data layout)")
    ap.add_argument("--right", required=True, help="rectified cam1 root")
    ap.add_argument("--bf", type=float, default=47.90639384423901)
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from amos_slam_tpu.config import SystemConfig, CameraConfig
    from amos_slam_tpu.io.euroc import EurocMonoDataset
    from amos_slam_tpu.system import System

    cam = CameraConfig(
        fx=435.2046959714599, fy=435.2046959714599,
        cx=367.4517211914062, cy=252.2008514404297,
        width=752, height=480, fps=20.0, bf=args.bf, th_depth=35.0,
    )  # reference Examples/Stereo/EuRoC.yaml rectified intrinsics
    left = EurocMonoDataset(args.root)
    right = EurocMonoDataset(args.right, cam="cam1")
    slam = System(SystemConfig(camera=cam, sensor="stereo", use_dynamics=False))
    n = len(left) if args.max_frames <= 0 else min(len(left), args.max_frames)
    times = []
    for i in range(n):
        gl, t = left[i]
        gr, _ = right[i]
        t0 = time.perf_counter()
        slam.track_stereo(gl, gr, t)
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            print(f"[{i}/{n}] {slam.state.name}")
    slam.shutdown()
    slam.save_trajectory_tum(args.out)
    print(f"median {np.median(times)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
