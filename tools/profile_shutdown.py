#!/usr/bin/env python
"""Fine-grain timing of the chunk-mode flush: which phase eats the budget.

SKIP_FINE=1 skips the per-method instrumented run and only does the
device_get-logged run (faster turnaround when iterating on read batching).
CH=<n> overrides the chunk width.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from amos_slam_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

from amos_slam_tpu.config import SystemConfig  # noqa: E402
from amos_slam_tpu.system import System  # noqa: E402
from amos_slam_tpu.io import synthetic  # noqa: E402

cfg = SystemConfig(use_dynamics=False)
n_frames = 96
CH = int(os.environ.get("CH", "8"))
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

TIMES = {}


def timed(obj, name, label=None):
    fn = getattr(obj, name)
    label = label or name

    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        TIMES[label] = TIMES.get(label, 0.0) + time.perf_counter() - t0
        TIMES[label + "#"] = TIMES.get(label + "#", 0) + 1
        return out

    setattr(obj, name, wrap)


def run(slam):
    for k in range(len(gstack)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
    slam.shutdown()
    return slam


run(System(cfg))  # warmup


def fine_grain():
    slam = System(cfg)
    timed(slam.map, "insert_keyframe")
    timed(slam.map, "create_new_points_dispatch")
    timed(slam.map, "create_new_points_resolve")
    timed(slam.map, "fuse_neighbors_dispatch")
    timed(slam.map, "fuse_neighbors_resolve")
    timed(slam.map, "cull_points_dispatch")
    timed(slam.map, "cull_points_resolve")
    timed(slam.map, "cull_keyframes")
    timed(slam.map, "refresh_landmarks")
    timed(slam.map, "run_local_ba")
    timed(slam, "_resolve_step")
    timed(slam, "_flush_stats")
    timed(slam._reader, "flush", "reader.flush")
    timed(slam._fetcher, "flush", "fetcher.flush")

    t0 = time.perf_counter()
    for k in range(len(gstack)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
    t_track = time.perf_counter() - t0
    if slam.loop is not None and "on_keyframe_resolve" not in TIMES:
        timed(slam.loop, "on_keyframe_resolve")
        timed(slam.loop, "bow_dispatch")
    t0 = time.perf_counter()
    slam._flush_pending()
    t_fp = time.perf_counter() - t0
    t0 = time.perf_counter()
    if slam.loop is not None:
        slam.loop.flush_gba()
    t_gba = time.perf_counter() - t0
    t0 = time.perf_counter()
    slam._reader.stop()
    slam._fetcher.stop()
    t_stop = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(slam.map.arrays)
    jax.block_until_ready(slam.last_Tcw)
    t_block = time.perf_counter() - t0

    print(f"track calls: {t_track*1e3:.0f} ms  flush_pending: {t_fp*1e3:.0f} "
          f"ms  flush_gba: {t_gba*1e3:.0f} ms  stop: {t_stop*1e3:.0f} ms  "
          f"block_until_ready: {t_block*1e3:.0f} ms")
    for k in sorted(TIMES):
        if not k.endswith("#"):
            print(f"  {k:32s} {TIMES[k]*1e3:8.1f} ms  x{TIMES.get(k+'#', 0)}")
    print(f"keyframes: {slam.map.n_kfs}")


if not os.environ.get("SKIP_FINE"):
    fine_grain()

# ---- device_get-logged run: reader read latency / grouping ----
orig_get = jax.device_get
READS = []


def logged_get(x):
    t0 = time.perf_counter()
    out = orig_get(x)
    READS.append((time.perf_counter() - t0,
                  len(x) if isinstance(x, list) else 1))
    return out


jax.device_get = logged_get
try:
    slam2 = System(cfg)
    t0 = time.perf_counter()
    for k in range(len(gstack)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam2.track_rgbd_chunk(gstack[k], dstack[k], ts)
    slam2.shutdown()
finally:
    jax.device_get = orig_get
print(f"run2 total: {(time.perf_counter()-t0)*1e3:.0f} ms  "
      f"CH={CH}  kfs={slam2.map.n_kfs}")
print("device_get calls (ms, group):",
      [(f"{t*1e3:.0f}", n) for t, n in READS])
