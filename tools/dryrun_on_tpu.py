#!/usr/bin/env python
"""Run the driver's multichip dryrun body on the REAL TPU (1-device mesh).

Round-4 lesson (VERDICT item 9): the 8-virtual-CPU-device dryrun passed
while the identical shard_map multistream program failed on the chip. This
command runs the exact same body -- live-map multi-stream SLAM sharded
over a stream mesh + the DP YOLACT train step, with ATE/map-growth
gates -- on the real TPU, so CPU-mesh green is validated chip-side too.

Usage:  cd /root/repo && timeout 900 python tools/dryrun_on_tpu.py
Prints the dryrun summary line on success; any failure raises.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amos_slam_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402

import __graft_entry__ as ge  # noqa: E402

dev = jax.devices()
print(f"backend: {jax.default_backend()}, devices: {dev}")
ge.dryrun_body(dev[:1])
