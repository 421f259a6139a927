#!/usr/bin/env python
"""Decompose per-frame cost of the fused RGB-D fast path on the tunnel.

Phases:
  A. pure chained dispatch of fused_frame_step, sync once at the end
  B. full System.track_rgbd loop, per-frame time series (spot the spikes)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.io import synthetic

cfg = SystemConfig(use_dynamics=False)
n_frames = 100
planes = synthetic.default_room(seed=1)
poses = synthetic.orbit_trajectory(n_frames, radius=0.1, advance=0.25)
frames = [
    tuple(jax.device_put(jnp.asarray(a)) for a in synthetic.render(planes, T))
    for T in poses
]

# warmup / compile
slam = System(cfg)
for i, (g, d) in enumerate(frames[:40]):
    slam.track_rgbd(g, d, i / 30.0)
slam.shutdown()

# ---- phase A: raw dispatch throughput of the fused step, no supervision
from amos_slam_tpu.frontend.tracking import fused_frame_step

slam = System(cfg)
for i, (g, d) in enumerate(frames[:10]):
    slam.track_rgbd(g, d, i / 30.0)
slam._flush_pending()
view = slam.map.local_view(slam.ref_kf)
feats, Tcw, vel = slam.last_feats, slam.last_Tcw, slam.velocity
tcfg = cfg.tracking

res = fused_frame_step(slam.pipeline, frames[10][0], frames[10][1], feats,
                       Tcw, vel, view, slam._r_mm, slam._r_map,
                       min_lm=tcfg.min_inliers_local_map)
jax.block_until_ready(res.Tcw)
N = 60
t0 = time.perf_counter()
for k in range(N):
    g, d = frames[10 + (k % 80)]
    res = fused_frame_step(slam.pipeline, g, d, res.feats, res.Tcw,
                           res.velocity, view, slam._r_mm, slam._r_map,
                           min_lm=tcfg.min_inliers_local_map)
jax.block_until_ready(res.Tcw)
dt = time.perf_counter() - t0
print(f"A: chained dispatch, sync-at-end: {dt/N*1e3:.2f} ms/frame "
      f"({N/dt:.1f} FPS)")

# per-dispatch wall time (is dispatch itself blocking on the tunnel?)
ts = []
for k in range(N):
    g, d = frames[10 + (k % 80)]
    t1 = time.perf_counter()
    res = fused_frame_step(slam.pipeline, g, d, res.feats, res.Tcw,
                           res.velocity, view, slam._r_mm, slam._r_map,
                           min_lm=tcfg.min_inliers_local_map)
    ts.append(time.perf_counter() - t1)
jax.block_until_ready(res.Tcw)
ts = np.array(ts) * 1e3
print(f"A2: dispatch wall time: median {np.median(ts):.2f} ms, "
      f"p90 {np.percentile(ts, 90):.2f}, max {ts.max():.2f}")
slam.shutdown()

# ---- phase B: full loop time series
slam = System(cfg)
ft = []
t0 = time.perf_counter()
for i, (g, d) in enumerate(frames):
    t1 = time.perf_counter()
    slam.track_rgbd(g, d, i / 30.0)
    ft.append(time.perf_counter() - t1)
t_loop = time.perf_counter() - t0
t1 = time.perf_counter()
slam.shutdown()
t_shut = time.perf_counter() - t1
ft = np.array(ft) * 1e3
order = np.argsort(ft)[::-1]
print(f"B: full loop {n_frames/t_loop:.1f} FPS (loop {t_loop*1e3:.0f} ms "
      f"+ shutdown {t_shut*1e3:.0f} ms)")
print(f"   per-frame: median {np.median(ft):.2f} ms, mean {ft.mean():.2f}, "
      f"p90 {np.percentile(ft,90):.2f}")
print("   top-10 slow frames:", [(int(i), round(float(ft[i]),1)) for i in order[:10]])
kf_frames = [i for i, s in enumerate(slam.stats) if s.get("kf")]
print("   keyframe events at:", kf_frames)
