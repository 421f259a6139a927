#!/usr/bin/env python
"""Phase timing of the flagship two-stage + YOLACT chunked path on the live
backend: segmentation-only vs tracking-only vs combined, at im550 and im400.

Finds where the 67->120 FPS flagship gap lives (round-4 VERDICT item 1).
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
from amos_slam_tpu.models.segmenter import Segmenter  # noqa: E402

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
rgbstack = [jnp.stack([jnp.stack([g, g, g], -1) for g in gs]) for gs in gstack]


def timeit(label, fn, reps=1):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:40s} {dt*1e3:7.0f} ms  = {n_frames/dt:6.1f} FPS-equiv")
    return dt


# 1) segmentation alone (force the masks home each chunk? no -- force once
#    at the end; per-chunk np.asarray would serialize the tunnel)
for size in (550, 400):
    seg = Segmenter(img_size=size)

    def seg_only():
        ms = [seg.person_mask_batch(r) for r in rgbstack]
        jax.block_until_ready(ms[-1])
        # force real data home once (relay enqueue caveat)
        float(jnp.sum(ms[-1]))

    timeit(f"seg-only im{size} (12 chunks x 8)", seg_only)

# 2) tracking-only with dynamics (zero seg masks), chunked
dcfg = SystemConfig(use_dynamics=True)


def run_dyn_noseg():
    slam = System(dcfg)
    for k in range(len(gstack)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
    slam.shutdown()
    return slam


timeit("two-stage chunked, NO seg masks", run_dyn_noseg)

# 3) combined (current bench flagship), im550 and im400
for size in (550, 400):
    seg = Segmenter(img_size=size)

    def run_dyn_full():
        slam = System(dcfg)
        for k in range(len(gstack)):
            masks = seg.person_mask_batch(rgbstack[k])
            ts = [(k * CH + i) / 30.0 for i in range(CH)]
            slam.track_rgbd_chunk(gstack[k], dstack[k], ts, seg_masks=masks)
        slam.shutdown()
        return slam

    timeit(f"two-stage + YOLACT im{size} chunked", run_dyn_full)

# 4) plain no-dynamics chunked headline for comparison
cfg0 = SystemConfig(use_dynamics=False)


def run_plain():
    slam = System(cfg0)
    for k in range(len(gstack)):
        ts = [(k * CH + i) / 30.0 for i in range(CH)]
        slam.track_rgbd_chunk(gstack[k], dstack[k], ts)
    slam.shutdown()
    return slam


timeit("no-dynamics chunked headline", run_plain)
