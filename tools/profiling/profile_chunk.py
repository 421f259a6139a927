#!/usr/bin/env python
"""Attribute per-chunk cost of System.track_rgbd_chunk on the tunnel.

Phases:
  A. raw fused_frame_scan chained dispatch (no supervision), sync at end
  B. full track_rgbd_chunk loop, per-chunk time series
  C. per-chunk segment timers (monkeypatched) for the steady state
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.io import synthetic

cfg = SystemConfig(use_dynamics=False)
n_frames = 96
CH = 8
planes = synthetic.default_room(seed=1)
poses = synthetic.orbit_trajectory(n_frames, radius=0.1, advance=0.25)
frames = [
    tuple(jax.device_put(jnp.asarray(a)) for a in synthetic.render(planes, T))
    for T in poses
]
gstack = [
    jnp.stack([frames[k + i][0] for i in range(CH)])
    for k in range(0, n_frames, CH)
]
dstack = [
    jnp.stack([frames[k + i][1] for i in range(CH)])
    for k in range(0, n_frames, CH)
]

def run(slam):
    for k in range(len(gstack)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
    slam.shutdown()

run(System(cfg))  # warmup/compile

# ---- phase A: raw chained scan dispatch, one sync at the end
from amos_slam_tpu.frontend.tracking import fused_frame_scan

slam = System(cfg)
for k in range(3):
    ts = [(k * CH + i) / 30.0 for i in range(CH)]
    slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
slam._flush_pending()
view = slam.map.local_view(slam.ref_kf)
feats, Tcw, vel = slam.last_feats, slam.last_Tcw, slam.velocity
tcfg = cfg.tracking

res = fused_frame_scan(slam.pipeline, gstack[3], dstack[3], feats, Tcw, vel,
                       view, slam._r_mm, slam._r_map,
                       min_lm=tcfg.min_inliers_local_map)
jax.block_until_ready(res.Tcw)
N = 24
t0 = time.perf_counter()
f, T, v, acc = feats, Tcw, vel, None
for k in range(N):
    r = fused_frame_scan(slam.pipeline, gstack[3 + (k % 8)],
                         dstack[3 + (k % 8)], f, T, v, view,
                         slam._r_mm, slam._r_map,
                         min_lm=tcfg.min_inliers_local_map, stats_acc=acc)
    f, T, v, acc = r.feats, r.Tcw, r.velocity, r.stats_acc
jax.block_until_ready(T)
dt = time.perf_counter() - t0
print(f"A raw scan chain: {dt/N*1e3:.1f} ms/chunk "
      f"({N*CH/dt:.1f} fps equivalent)")

# A2: same but materialize sup each chunk (simulates the reader fetch cost
# if it were synchronous)
t0 = time.perf_counter()
f, T, v, acc = feats, Tcw, vel, None
for k in range(N):
    r = fused_frame_scan(slam.pipeline, gstack[3 + (k % 8)],
                         dstack[3 + (k % 8)], f, T, v, view,
                         slam._r_mm, slam._r_map,
                         min_lm=tcfg.min_inliers_local_map, stats_acc=acc)
    f, T, v, acc = r.feats, r.Tcw, r.velocity, r.stats_acc
    _ = np.asarray(r.ys.sup)
dt = time.perf_counter() - t0
print(f"A2 scan + sync sup fetch: {dt/N*1e3:.1f} ms/chunk")
slam.shutdown()

# ---- phase B/C: full loop with segment timers
import amos_slam_tpu.system as sysmod

seg_t = {}
def wrap(obj, name, key):
    orig = getattr(obj, name)
    def timed(*a, **kw):
        t = time.perf_counter()
        out = orig(*a, **kw)
        seg_t[key] = seg_t.get(key, 0.0) + (time.perf_counter() - t)
        return out
    setattr(obj, name, timed)

slam = System(cfg)
wrap(slam.map, "local_view", "local_view")
wrap(slam, "_resolve_done", "resolve_done")
wrap(slam, "_flush_stats", "flush_stats")
wrap(slam._reader, "submit", "reader_submit")
wrap(slam._reader, "drain", "reader_drain")
wrap(slam._fetcher, "drain", "fetcher_drain")

chunk_times = []
t0 = time.perf_counter()
for k in range(len(gstack)):
    tc = time.perf_counter()
    ts = [(k * CH + i) / 30.0 for i in range(CH)]
    slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
    chunk_times.append(time.perf_counter() - tc)
slam.shutdown()
dt = time.perf_counter() - t0
print(f"B full loop: {n_frames/dt:.1f} fps, per-chunk ms:",
      [f"{t*1e3:.0f}" for t in chunk_times])
tot = sum(seg_t.values())
print("C segments (ms total over run):",
      {k: round(v * 1e3, 1) for k, v in sorted(seg_t.items(),
                                               key=lambda x: -x[1])})
print(f"  accounted {tot*1e3:.0f} / {dt*1e3:.0f} ms")
