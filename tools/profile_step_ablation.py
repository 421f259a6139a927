#!/usr/bin/env python
"""Ablate the fused frame step's stages on the live backend.

Times scans of: extraction only; extraction + motion-model; the full step
(extraction + mm + local-map track). Differences isolate where the
~4.3 ms/frame device time (tools/profile_scan_exec.py, round 4) lives.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from amos_slam_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

from amos_slam_tpu.config import SystemConfig  # noqa: E402
from amos_slam_tpu.frontend.features import ORBPipeline  # noqa: E402
from amos_slam_tpu.frontend import tracking as T  # noqa: E402
from amos_slam_tpu.io import synthetic  # noqa: E402
from amos_slam_tpu.parallel.multistream import empty_views  # noqa: E402
from amos_slam_tpu.geometry import se3  # noqa: E402

cfg = SystemConfig(use_dynamics=False)
pipe = ORBPipeline(cfg.orb, cfg.camera)
n_frames = 96
CH = 8
planes = synthetic.default_room(seed=1)
poses = synthetic.orbit_trajectory(n_frames, radius=0.1, advance=0.25)
frames = [
    tuple(jax.device_put(jnp.asarray(a)) for a in synthetic.render(planes, T_))
    for T_ in poses
]
gs = [
    jnp.stack([frames[k + i][0] for i in range(CH)])
    for k in range(0, n_frames, CH)
]
ds = [
    jnp.stack([frames[k + i][1] for i in range(CH)])
    for k in range(0, n_frames, CH)
]
view = jax.tree.map(lambda x: x[0], empty_views(1, cfg.tracking.max_map_points_local))
r_mm = jnp.asarray(7.0)
r_map = jnp.asarray(6.0)
g0, d0 = frames[0]
last0 = pipe.extract(g0, depth_image=d0)


@functools.partial(jax.jit, static_argnums=(0,))
def scan_extract(pipe, images, depths, last):
    def body(carry, inp):
        g, d = inp
        kp, _, _, patches = pipe.detect_keypoints(g)
        feats = pipe.describe(kp, patches, d, None)
        return feats, feats.kp.xy[0, 0]

    return jax.lax.scan(body, last, (images, depths))


@functools.partial(jax.jit, static_argnums=(0,))
def scan_mm(pipe, images, depths, last, Tcw, vel):
    def body(carry, inp):
        feats0, Tcw, vel = carry
        g, d = inp
        kp, _, _, patches = pipe.detect_keypoints(g)
        feats = pipe.describe(kp, patches, d, None)
        mm = T.track_motion_model(pipe.cam, feats, feats0, Tcw, vel @ Tcw, r_mm)
        v = se3.orthonormalize(mm.Tcw @ se3.inv_T(Tcw))
        return (feats, mm.Tcw, v), mm.num_inliers

    return jax.lax.scan(body, (last, Tcw, vel), (images, depths))


def timed(label, fn):
    fn()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:32s} {dt*1e3:6.0f} ms  {dt/n_frames*1e3:5.2f} ms/frame")
    return dt


def run_extract():
    f = last0
    out = None
    for k in range(len(gs)):
        f, out = scan_extract(pipe, gs[k], ds[k], f)
    return float(jnp.sum(out))


def run_mm():
    carry = (last0, jnp.eye(4), jnp.eye(4))
    out = None
    for k in range(len(gs)):
        carry, out = scan_mm(pipe, gs[k], ds[k], *carry)
    return float(jnp.sum(out))


def run_full():
    feats, Tc, vel, acc = last0, jnp.eye(4), jnp.eye(4), None
    res = None
    for k in range(len(gs)):
        res = T.fused_frame_scan(
            pipe, gs[k], ds[k], feats, Tc, vel, view, r_mm, r_map,
            stats_acc=acc,
        )
        feats, Tc, vel, acc = res.feats, res.Tcw, res.velocity, res.stats_acc
    return float(jnp.sum(res.Tcw))


timed("extract only", run_extract)
timed("extract + motion model", run_mm)
timed("full fused step", run_full)
