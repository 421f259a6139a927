#!/usr/bin/env python
"""Attribute keyframe-rate cost: wrap each SlamMap maintenance method with a
block-until-ready timer, run the bench loop in deterministic mode."""
import time
from collections import defaultdict
import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.io import synthetic
from amos_slam_tpu.slam_map.slam_map import SlamMap

cfg = SystemConfig(use_dynamics=False, deterministic=True)
n_frames = 100
planes = synthetic.default_room(seed=1)
poses = synthetic.orbit_trajectory(n_frames, radius=0.1, advance=0.25)
frames = [
    tuple(jax.device_put(jnp.asarray(a)) for a in synthetic.render(planes, T))
    for T in poses
]

slam = System(cfg)
for i, (g, d) in enumerate(frames):
    slam.track_rgbd(g, d, i / 30.0)
slam.shutdown()

acc = defaultdict(lambda: [0.0, 0])
def wrap(obj, name):
    fn = getattr(obj, name)
    def wrapped(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        jax.block_until_ready(obj.arrays.kf_pose)
        if out is not None:
            try:
                jax.block_until_ready(out)
            except Exception:
                pass
        dt = time.perf_counter() - t0
        acc[name][0] += dt
        acc[name][1] += 1
        return out
    setattr(obj, name, wrapped)

slam = System(cfg)
m = slam.map
for name in ["insert_keyframe", "create_new_points_dispatch",
             "create_new_points_resolve", "fuse_neighbors_dispatch",
             "fuse_neighbors_resolve", "cull_points_dispatch",
             "cull_points_resolve", "cull_keyframes", "refresh_landmarks",
             "run_local_ba", "bump_stats", "local_view"]:
    wrap(m, name)

t0 = time.perf_counter()
for i, (g, d) in enumerate(frames):
    slam.track_rgbd(g, d, i / 30.0)
slam.shutdown()
total = time.perf_counter() - t0
print(f"deterministic loop total: {total*1e3:.0f} ms "
      f"({n_frames/total:.1f} FPS)")
rows = sorted(acc.items(), key=lambda kv: -kv[1][0])
for name, (t, n) in rows:
    print(f"  {name:32s} {t*1e3:8.1f} ms total  {n:4d} calls  "
          f"{t/n*1e3:7.1f} ms/call")
print("unattributed:",
      round((total - sum(t for t, _ in acc.values())) * 1e3), "ms")
