#!/usr/bin/env python
"""Headline benchmark: RGB-D tracking throughput on one TPU chip.

Measures the full per-frame front end -- ORB pyramid/FAST/rBRIEF extraction
+ projection-windowed Hamming matching + robust motion-only BA -- in a
steady-state loop over a pre-rendered synthetic RGB-D sequence (the
reference's workload shape per SURVEY.md section 3.1, minus the not-yet-built
subsystems, which will be folded in as they land).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: the driver-set north star is >=120 FPS (4x the 30 FPS real-time
bar, BASELINE.md); vs_baseline = value / 120.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amos_slam_tpu.config import SystemConfig
    from amos_slam_tpu.frontend.features import ORBPipeline
    from amos_slam_tpu.frontend.tracking import track_motion_model
    from amos_slam_tpu.geometry import se3
    from amos_slam_tpu.io import synthetic

    cfg = SystemConfig()
    pipeline = ORBPipeline(cfg.orb, cfg.camera)

    n_frames = 20
    planes = synthetic.default_room(seed=1)
    poses = synthetic.orbit_trajectory(n_frames, radius=0.1, advance=0.2)
    host_frames = [synthetic.render(planes, T) for T in poses]
    frames = [
        (jax.device_put(jnp.asarray(g)), jax.device_put(jnp.asarray(d)))
        for g, d in host_frames
    ]
    radius = jnp.asarray(cfg.tracking.match_radius_motion)

    def run_pass():
        last_feats = None
        last_T = jnp.eye(4)
        vel = jnp.eye(4)
        inliers = []
        for g, d in frames:
            feats = pipeline.extract(g, depth_image=d)
            if last_feats is not None:
                T_pred = vel @ last_T
                res = track_motion_model(
                    pipeline.cam, feats, last_feats, last_T, T_pred, radius
                )
                vel = res.Tcw @ se3.inv_T(last_T)
                last_T = res.Tcw
                inliers.append(res.num_inliers)
            last_feats = feats
        jax.block_until_ready(last_T)
        return inliers

    run_pass()  # warmup/compile
    n_pass = 3
    t0 = time.perf_counter()
    for _ in range(n_pass):
        inl = run_pass()
    dt = time.perf_counter() - t0
    fps = n_pass * n_frames / dt

    med_inl = int(np.median([int(x) for x in inl]))
    result = {
        "metric": "rgbd_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 120.0, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "frames": n_frames,
            "median_inliers": med_inl,
            "note": "extract+match+pose-opt per 640x480 RGB-D frame",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
