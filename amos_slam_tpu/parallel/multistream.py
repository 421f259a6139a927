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
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontend.features import ORBPipeline, FrameFeatures
from ..frontend.tracking import track_motion_model, TrackStepResult
from ..geometry import se3


class StreamState(NamedTuple):
    """Per-stream tracker state, batch-first (S, ...)."""

    feats: FrameFeatures
    Tcw: jax.Array        # (S, 4, 4)
    velocity: jax.Array   # (S, 4, 4)
    initialized: jax.Array  # (S,) bool


def make_stream_mesh(devices=None, axis: str = "stream") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def init_state(pipeline: ORBPipeline, images, depths) -> StreamState:
    """Bootstrap all S streams from their first frames."""
    feats = jax.vmap(lambda im, d: pipeline.extract(im, depth_image=d))(
        images, depths
    )
    S = images.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4), (S, 4, 4))
    return StreamState(
        feats=feats, Tcw=eye, velocity=eye,
        initialized=jnp.ones((S,), bool),
    )


def multistream_step(
    pipeline: ORBPipeline,
    state: StreamState,
    images: jax.Array,   # (S, H, W)
    depths: jax.Array,   # (S, H, W)
    radius: jax.Array,   # ()
):
    """One tracking step for every stream: the 'training step' of this
    framework. Fully jittable; shard the leading axis over the mesh."""

    feats = jax.vmap(lambda im, d: pipeline.extract(im, depth_image=d))(
        images, depths
    )
    T_pred = state.velocity @ state.Tcw

    res = jax.vmap(
        lambda c, l, lt, tp: track_motion_model(
            pipeline.cam, c, l, lt, tp, radius
        )
    )(feats, state.feats, state.Tcw, T_pred)

    # LOST guard per stream (mask form of the host-side logic).
    ok = res.num_inliers >= 10
    Tcw = jnp.where(ok[:, None, None], res.Tcw, state.Tcw)
    vel = jnp.where(
        ok[:, None, None],
        Tcw @ se3.inv_T(state.Tcw),
        jnp.broadcast_to(jnp.eye(4), Tcw.shape),
    )
    new_state = StreamState(
        feats=feats, Tcw=Tcw, velocity=vel, initialized=state.initialized
    )
    return new_state, res


def shard_step(pipeline: ORBPipeline, mesh: Mesh, axis: str = "stream"):
    """jit the multistream step with stream-axis shardings over ``mesh``."""
    batch = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def step(state, images, depths, radius):
        return multistream_step(pipeline, state, images, depths, radius)

    # ``batch`` as a pytree prefix shards every leaf of the state along the
    # stream axis; per-stream state stays resident on its shard across steps
    # (donated), so steady-state needs no host round-trips.
    return jax.jit(
        step,
        in_shardings=(batch, batch, batch, repl),
        out_shardings=(batch, batch),
        donate_argnums=(0,),
    )
