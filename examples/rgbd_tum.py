#!/usr/bin/env python
"""TUM RGB-D driver: the reference's Examples/RGB-D/rgbd_tum.cc as a CLI.

Usage:
    python examples/rgbd_tum.py SEQUENCE_DIR [--assoc FILE] [--yaml TUM3.yaml]
        [--out CameraTrajectory.txt] [--seg] [--weights yolact.pth]
        [--max-frames N]

Prints per-frame tracking stats and median/mean frame time at the end
(rgbd_tum.cc:168-169), and writes the TUM-format trajectory.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--assoc", default=None)
    ap.add_argument("--yaml", default=None, help="reference-style settings yaml")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--kf-out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--seg", action="store_true", help="run YOLACT stage 1")
    ap.add_argument("--weights", default=None, help="yolact .pth for --seg")
    ap.add_argument("--no-dynamics", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from amos_slam_tpu.config import SystemConfig, load_yaml
    from amos_slam_tpu.io.tum import TumRGBDDataset
    from amos_slam_tpu.system import System

    cfg = load_yaml(args.yaml) if args.yaml else SystemConfig()
    if args.no_dynamics:
        import dataclasses

        cfg = dataclasses.replace(cfg, use_dynamics=False)

    seg = None
    if args.seg:
        from amos_slam_tpu.models.segmenter import Segmenter

        params = None
        if args.weights:
            from amos_slam_tpu.models.port_torch import load_pth

            params = load_pth(args.weights)
        seg = Segmenter(params=params)

    ds = TumRGBDDataset(args.sequence, args.assoc,
                        depth_factor=cfg.camera.depth_map_factor)
    slam = System(cfg)
    times = []
    n = len(ds) if args.max_frames <= 0 else min(len(ds), args.max_frames)
    for i in range(n):
        gray, depth, rgb, ts = ds[i]
        mask = np.asarray(seg.person_mask(rgb)) if seg is not None else None
        t0 = time.perf_counter()
        slam.track_rgbd(gray, depth, ts, seg_mask=mask)
        times.append(time.perf_counter() - t0)
        if i % 50 == 0:
            s = slam.stats[-1]
            print(f"[{i}/{n}] state={slam.state.name} inliers={s['inliers']}"
                  f" kfs={slam.map.n_kfs} pts={slam.map.n_pts}")
    slam.shutdown()
    slam.save_trajectory_tum(args.out)

    times = np.asarray(times)
    print(f"median tracking time: {np.median(times)*1e3:.1f} ms")
    print(f"mean tracking time:   {times.mean()*1e3:.1f} ms "
          f"({1.0/times.mean():.1f} FPS)")
    print(f"trajectory saved to {args.out}")


if __name__ == "__main__":
    main()
