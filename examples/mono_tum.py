#!/usr/bin/env python
"""TUM monocular driver (reference Examples/Monocular/mono_tum.cc).

Usage:
    python examples/mono_tum.py SEQUENCE_DIR [--yaml TUM1.yaml]
        [--out KeyFrameTrajectory.txt] [--max-frames N]

Reads rgb.txt (timestamp path per line), tracks monocular, and writes the
keyframe trajectory in TUM format like the reference main (mono_tum.cc:141
SaveKeyFrameTrajectoryTUM -- mono scale is arbitrary, so the keyframe
trajectory is the meaningful export).
"""

import argparse
import os
import time

import numpy as np


def read_rgb_list(root):
    items = []
    with open(os.path.join(root, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, p = line.split()[:2]
            items.append((float(t), os.path.join(root, p)))
    return items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--yaml", default=None, help="reference-style settings yaml")
    ap.add_argument("--out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    import dataclasses

    from amos_slam_tpu.config import SystemConfig, load_yaml
    from amos_slam_tpu.system import System

    cfg = load_yaml(args.yaml) if args.yaml else SystemConfig()
    cfg = dataclasses.replace(cfg, sensor="mono", use_dynamics=False)

    from PIL import Image

    items = read_rgb_list(args.sequence)
    if args.max_frames > 0:
        items = items[: args.max_frames]
    slam = System(cfg)
    times = []
    for i, (ts, path) in enumerate(items):
        gray = np.asarray(
            Image.open(path).convert("L"), np.float32
        )
        t0 = time.perf_counter()
        slam.track_monocular(gray, ts)
        times.append(time.perf_counter() - t0)
        if i % 100 == 0:
            s = slam.stats[-1]
            print(f"[{i}/{len(items)}] {slam.state.name} inliers={s['inliers']}")
    slam.shutdown()
    slam.save_keyframe_trajectory_tum(args.out)
    times = np.asarray(times)
    print(f"median {np.median(times)*1e3:.1f} ms | mean {times.mean()*1e3:.1f} ms")
    print(f"keyframe trajectory -> {args.out}")


if __name__ == "__main__":
    main()
