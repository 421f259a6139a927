"""Multi-stream batched SLAM over a device mesh.

The reference's concurrency is 4-5 pthreads in one address space
(SURVEY.md section 2d); its TPU-native analogue for *scale-out* is a leading
stream axis: S independent camera streams batched with ``vmap`` and sharded
over ICI with a 1-D ``jax.sharding.Mesh`` (BASELINE.json stretch config:
8 concurrent RGB-D streams per chip/slice). Per-stream SLAM is
embarrassingly parallel -- no collectives are semantically required -- so
XLA partitions the batched program with zero communication; the mesh exists
so one jitted program drives all chips and keeps per-stream state resident
on its own shard.

Each step runs the full fused frame program (extraction + motion-model +
local-map tracking + pose/velocity update, frontend/tracking.py) per
stream; per-stream map views are batched ``LocalView`` pytrees (use
:func:`empty_views` for pure-odometry streams).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontend.features import ORBPipeline, FrameFeatures
from ..frontend.tracking import fused_frame_step
from ..slam_map.slam_map import LocalView


class StreamState(NamedTuple):
    """Per-stream tracker state, batch-first (S, ...)."""

    feats: FrameFeatures
    Tcw: jax.Array        # (S, 4, 4)
    velocity: jax.Array   # (S, 4, 4)


def make_stream_mesh(devices=None, axis: str = "stream") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def empty_views(S: int, V: int) -> LocalView:
    """Batched empty local views (odometry-only streams)."""
    return LocalView(
        ids=jnp.full((S, V), -1, jnp.int32),
        pos=jnp.zeros((S, V, 3)),
        desc=jnp.zeros((S, V, 256), jnp.int8),
        normal=jnp.zeros((S, V, 3)),
        min_dist=jnp.zeros((S, V)),
        max_dist=jnp.full((S, V), 1e9),
        valid=jnp.zeros((S, V), bool),
    )


def init_state(pipeline: ORBPipeline, images, depths) -> StreamState:
    """Bootstrap all S streams from their first frames."""
    feats = jax.vmap(lambda im, d: pipeline.extract(im, depth_image=d))(
        images, depths
    )
    S = images.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4), (S, 4, 4))
    return StreamState(feats=feats, Tcw=eye, velocity=eye)


def multistream_step(
    pipeline: ORBPipeline,
    state: StreamState,
    images: jax.Array,   # (S, H, W)
    depths: jax.Array,   # (S, H, W)
    views: LocalView,    # batched (S, ...) local views
    mm_radius: jax.Array,
    map_radius: jax.Array,
    min_lm: int = 30,
):
    """One fused tracking step for every stream: the 'training step' of
    this framework. Fully jittable; shard the leading axis over the mesh."""
    res = jax.vmap(
        lambda im, d, last, T, vel, vw: fused_frame_step(
            pipeline, im, d, last, T, vel, vw, mm_radius, map_radius,
            min_lm=min_lm,
        )
    )(images, depths, state.feats, state.Tcw, state.velocity, views)
    new_state = StreamState(
        feats=res.feats, Tcw=res.Tcw, velocity=res.velocity
    )
    return new_state, res.counts


def shard_step(pipeline: ORBPipeline, mesh: Mesh, axis: str = "stream",
               min_lm: int = 30):
    """jit the multistream step with stream-axis shardings over ``mesh``."""
    batch = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def step(state, images, depths, views, mm_radius, map_radius):
        return multistream_step(
            pipeline, state, images, depths, views, mm_radius, map_radius,
            min_lm=min_lm,
        )

    # ``batch`` as a pytree prefix shards every leaf of the state/views
    # along the stream axis; per-stream state stays resident on its shard
    # across steps (donated), so steady-state needs no host round-trips.
    return jax.jit(
        step,
        in_shardings=(batch, batch, batch, batch, repl, repl),
        out_shardings=(batch, batch),
        donate_argnums=(0,),
    )
