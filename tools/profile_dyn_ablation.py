#!/usr/bin/env python
"""Knob ablation of compute_dynamics on the live backend: which stage owns
the ~5.5 ms/frame two-stage overhead (round 4)."""
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
from amos_slam_tpu.frontend.dynamics import compute_dynamics  # noqa: E402
from amos_slam_tpu.io import synthetic  # noqa: E402

cfg = SystemConfig()
dcfg = cfg.dynamics
pipe = ORBPipeline(cfg.orb, cfg.camera)
n = 48
planes = synthetic.default_room(seed=1)
poses = synthetic.orbit_trajectory(n + 1, radius=0.1, advance=0.25)
frames = [
    tuple(jax.device_put(jnp.asarray(a)) for a in synthetic.render(planes, T))
    for T in poses
]
g0, d0 = frames[0]
f0 = pipe.extract(g0, depth_image=d0)
kp_xy, kp_valid = f0.kp.xy, f0.kp.valid
seg = jnp.zeros(g0.shape, bool)


def run(label, **over):
    kw = dict(
        epi_outlier_th=dcfg.epipolar_outlier_th,
        mean_rpe_th=dcfg.mean_rpe_th,
        flow3d_th=dcfg.flow3d_th,
        n_clusters=dcfg.n_clusters,
        slic_cell=dcfg.slic_cell,
        slic_iters=dcfg.slic_iters,
        dilate_radius=dcfg.mask_dilate_radius,
        slic_compactness=dcfg.slic_compactness,
        has_seg=False,
        slic_downsample=dcfg.slic_downsample,
        lk_levels=dcfg.lk_levels,
        lk_win=dcfg.lk_win,
        lk_iters=dcfg.lk_iters,
        pnp_hypotheses=dcfg.pnp_hypotheses,
    )
    kw.update(over)

    def once():
        out = None
        for k in range(1, n + 1):
            g, d = frames[k]
            pg, pd = frames[k - 1]
            out = compute_dynamics(
                pipe.cam, pg, pd, g, d, seg, jnp.eye(4), jnp.eye(4),
                kp_xy, kp_valid, k, **kw,
            )
        return float(jnp.sum(out.suppress_mask))

    once()  # compile
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        once()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {dt*1e3:6.0f} ms  {dt/n*1e3:5.2f} ms/frame", flush=True)


run("full (defaults)")
run("slic_iters=1", slic_iters=1)
run("slic_cell=32", slic_cell=32)
run("lk_levels=2,iters=3", lk_levels=2, lk_iters=3)
run("pnp_hypotheses=64", pnp_hypotheses=64)
run("dilate_radius=7", dilate_radius=7)
run("slic_downsample=2", slic_downsample=2)
run("combo: slic ds2+it3, lk 3/4", slic_downsample=2, slic_iters=3,
    lk_levels=3, lk_iters=4)
