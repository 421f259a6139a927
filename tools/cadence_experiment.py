#!/usr/bin/env python
"""Local-BA cadence A/B: per-keyframe (the reference's LocalMapping runs BA
for every keyframe when idle, src/LocalMapping.cc:122-141) vs every-2nd-slot
(the round-2/3 default). Round-4 VERDICT item 10: keep the winner, with
numbers. Runs on CPU.

Sequences: an out-and-back loop (loop-closure pressure), a fast orbit
(drift pressure), and a long 64-frame sweep (culling/fusion pressure).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from amos_slam_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

from amos_slam_tpu.config import SystemConfig, MapConfig, TrackingConfig  # noqa: E402
from amos_slam_tpu.system import System  # noqa: E402
from amos_slam_tpu.io import synthetic, evaluate  # noqa: E402


def sequences():
    out = {}
    planes = synthetic.default_room(seed=7)
    n = 36
    fwd = synthetic.orbit_trajectory(n // 2, radius=0.03, advance=0.9)
    poses = fwd + fwd[::-1][1:] + [fwd[0]]
    out["out_and_back"] = (planes, poses)
    planes2 = synthetic.default_room(seed=5)
    out["fast_orbit"] = (planes2, synthetic.orbit_trajectory(30, radius=0.12, advance=0.4))
    planes3 = synthetic.default_room(seed=9)
    out["long_sweep"] = (planes3, synthetic.orbit_trajectory(64, radius=0.08, advance=0.35))
    return out


def run(cadence: int, planes, poses):
    cfg = SystemConfig(
        map=MapConfig(max_keyframes=64, max_points=16384, ba_cadence=cadence),
        tracking=TrackingConfig(max_map_points_local=2048),
        use_dynamics=False,
        deterministic=True,
    )
    slam = System(cfg)
    for i, T in enumerate(poses):
        g, d = synthetic.render(planes, T)
        slam.track_rgbd(g, d, i / 30.0)
    slam.shutdown()
    est = np.asarray(slam.corrected_poses_np())
    gt = np.asarray(poses)
    ate = evaluate.ate_rmse(
        evaluate.positions_from_cw(est), evaluate.positions_from_cw(gt)
    )
    return float(ate), slam.map.n_kfs


for name, (planes, poses) in sequences().items():
    for cad in (1, 2):
        ate, kfs = run(cad, planes, poses)
        print(f"{name:14s} ba_cadence={cad}: ATE {ate:.4f} m  kfs={kfs}")
