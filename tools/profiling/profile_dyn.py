#!/usr/bin/env python
"""Measure device+dispatch time of each two-stage component on the tunnel:
segmenter forward, compute_dynamics, fused_frame_step."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from amos_slam_tpu.config import SystemConfig
from amos_slam_tpu.system import System
from amos_slam_tpu.io import synthetic
from amos_slam_tpu.models.segmenter import Segmenter
from amos_slam_tpu.frontend.dynamics import compute_dynamics

cfg = SystemConfig(use_dynamics=False)
planes = synthetic.default_room(seed=1)
poses = synthetic.orbit_trajectory(24, radius=0.1, advance=0.25)
frames = [
    tuple(jax.device_put(jnp.asarray(a)) for a in synthetic.render(planes, T))
    for T in poses
]
rgb = jnp.stack([frames[0][0]] * 3, -1)

def timeit(label, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:40s} {dt:8.2f} ms/call")
    return dt

seg = Segmenter()
timeit("segmenter.person_mask 640x480", lambda: seg.person_mask(rgb))

# batched segmenter
W = 8
rgbs = jnp.stack([rgb] * W)
try:
    masks = seg.person_mask_batch(rgbs)
    timeit(f"segmenter.person_mask_batch W={W}", lambda: seg.person_mask_batch(rgbs))
except AttributeError:
    print("no person_mask_batch")

# dynamics program
slam = System(cfg)
for i in range(12):
    slam.track_rgbd(frames[i][0], frames[i][1], i / 30.0)
slam._flush_pending()
slam.prev_gray, slam.prev_depth = frames[11][0], frames[11][1]
dcfg = SystemConfig(use_dynamics=True).dynamics
g, d = frames[12]
segm = seg.person_mask(rgb)
kw = dict(
    epi_outlier_th=dcfg.epipolar_outlier_th, mean_rpe_th=dcfg.mean_rpe_th,
    flow3d_th=dcfg.flow3d_th, n_clusters=dcfg.n_clusters,
    slic_cell=dcfg.slic_cell, slic_iters=dcfg.slic_iters,
    dilate_radius=dcfg.mask_dilate_radius,
    slic_compactness=dcfg.slic_compactness, has_seg=True,
    slic_downsample=dcfg.slic_downsample, lk_levels=dcfg.lk_levels,
    lk_win=dcfg.lk_win, lk_iters=dcfg.lk_iters,
    pnp_hypotheses=dcfg.pnp_hypotheses,
)
def dyn_call():
    return compute_dynamics(
        slam.cam, slam.prev_gray, slam.prev_depth, g, d, segm,
        slam.last_Tcw, slam.velocity,
        slam.last_feats.kp.xy, slam.last_feats.kp.valid, 12,
        gate_state=slam._dyn_gates, **kw,
    )
timeit("compute_dynamics 640x480", dyn_call)

from amos_slam_tpu.frontend.tracking import fused_frame_step
view = slam.map.local_view(slam.ref_kf)
dyn = dyn_call()
def step_call():
    return fused_frame_step(
        slam.pipeline, g, d, slam.last_feats, slam.last_Tcw, slam.velocity,
        view, slam._r_mm, slam._r_map,
        min_lm=cfg.tracking.min_inliers_local_map,
        suppress_mask=dyn.suppress_mask, stats_acc=slam._stats_acc,
    )
timeit("fused_frame_step (with suppress)", step_call)
slam.shutdown()
