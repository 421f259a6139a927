#!/usr/bin/env python
"""Phase-level timing of the chunked RGB-D bench loop on the live backend.

Times, per chunk: the track_rgbd_chunk call itself (dispatch + any host
work), split out reader/fetcher resolution, and the final shutdown flush.
Prints a per-phase breakdown to find where the 43->120 FPS gap lives.
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


def run(slam, record=None):
    for k in range(len(gstack)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        t0 = time.perf_counter()
        slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
        if record is not None:
            record.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    slam.shutdown()
    if record is not None:
        record.append(("shutdown", time.perf_counter() - t0))
    return slam


# measure raw tunnel RTT
x = jnp.zeros(8)
for _ in range(3):
    np.asarray(x + 1)
t0 = time.perf_counter()
for _ in range(10):
    np.asarray(x + 1)
rtt = (time.perf_counter() - t0) / 10
print(f"tunnel RTT (tiny op + read): {rtt*1e3:.1f} ms")

# dispatch-only cost (no read)
f = jax.jit(lambda a: a + 1)
f(x)
t0 = time.perf_counter()
ys = [f(x) for _ in range(100)]
disp = (time.perf_counter() - t0) / 100
jax.block_until_ready(ys)
print(f"dispatch-only (tiny jitted op): {disp*1e3:.2f} ms")

run(System(cfg))  # warmup / compile
rec = []
t0 = time.perf_counter()
slam = run(System(cfg), rec)
total = time.perf_counter() - t0
chunk_times = [r for r in rec if not isinstance(r, tuple)]
shutdown_t = [r[1] for r in rec if isinstance(r, tuple)][0]
print(f"total: {total*1e3:.0f} ms for {n_frames} frames = {n_frames/total:.1f} FPS")
print(f"chunk call times (ms): {[f'{t*1e3:.0f}' for t in chunk_times]}")
print(f"sum chunk calls: {sum(chunk_times)*1e3:.0f} ms  shutdown: {shutdown_t*1e3:.0f} ms")
print(f"keyframes: {slam.map.n_kfs}  state: {slam.state.name}")
