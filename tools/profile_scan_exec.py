#!/usr/bin/env python
"""True device execution time of the fused chunk scan on the live backend.

Dispatches K chunk scans back-to-back over VARIED inputs (relay result
caching defeated) and forces one scalar read at the end: wall clock =
K executions + 1 RTT. Repeats at several chunk widths to separate
per-program relay overhead from per-frame compute.
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
from amos_slam_tpu.frontend.features import ORBPipeline  # noqa: E402
from amos_slam_tpu.frontend.tracking import fused_frame_scan  # noqa: E402
from amos_slam_tpu.io import synthetic  # noqa: E402
from amos_slam_tpu.parallel.multistream import empty_views  # noqa: E402

cfg = SystemConfig(use_dynamics=False)
pipe = ORBPipeline(cfg.orb, cfg.camera)
n_frames = 96
planes = synthetic.default_room(seed=1)
poses = synthetic.orbit_trajectory(n_frames, radius=0.1, advance=0.25)
frames = [
    tuple(jax.device_put(jnp.asarray(a)) for a in synthetic.render(planes, T))
    for T in poses
]
view = jax.tree.map(lambda x: x[0], empty_views(1, cfg.tracking.max_map_points_local))
r_mm = jnp.asarray(7.0)
r_map = jnp.asarray(6.0)

g0, d0 = frames[0]
last = pipe.extract(g0, depth_image=d0)

for CH in (8, 16):
    gs = [
        jnp.stack([frames[k + i][0] for i in range(CH)])
        for k in range(0, n_frames, CH)
    ]
    ds = [
        jnp.stack([frames[k + i][1] for i in range(CH)])
        for k in range(0, n_frames, CH)
    ]

    def run_once():
        feats, T, vel, acc = last, jnp.eye(4), jnp.eye(4), None
        res = None
        for k in range(len(gs)):
            res = fused_frame_scan(
                pipe, gs[k], ds[k], feats, T, vel, view, r_mm, r_map,
                stats_acc=acc,
            )
            feats, T, vel, acc = res.feats, res.Tcw, res.velocity, res.stats_acc
        return float(jnp.sum(res.Tcw))  # force full execution + 1 read

    run_once()  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run_once()
    dt = (time.perf_counter() - t0) / reps
    print(
        f"CH={CH:2d}: {len(gs)} scans of {CH} frames = {dt*1e3:6.0f} ms "
        f"({dt/n_frames*1e3:.2f} ms/frame, {n_frames/dt:.0f} FPS device-only)"
    )
