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
    """Bootstrap all S streams from their first frames.

    Tcw and velocity MUST be DISTINCT device buffers: shard_step donates
    the state, and donating one buffer referenced by two pytree leaves
    makes XLA alias a single donated input to two outputs -- a runtime
    ``INVALID_ARGUMENT: TPU backend error`` on real TPUs (the bug behind
    four rounds of multistream bench crashes; CPU never catches it because
    buffer donation is a no-op there)."""
    feats = jax.vmap(lambda im, d: pipeline.extract(im, depth_image=d))(
        images, depths
    )
    S = images.shape[0]
    eye = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
    return StreamState(
        feats=feats, Tcw=jnp.asarray(eye), velocity=jnp.asarray(eye.copy())
    )


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
    this framework. Fully jittable; shard the leading axis over the mesh.

    Returns (new_state, sup (S, 3) int32 count rows, sup_heavy (S, 3N)
    keyframe-insertion payload rows). Only `sup` needs a host read per
    step; heavy rows are sliced lazily for the streams that actually
    insert a keyframe (see MultiStreamSLAM)."""
    res = jax.vmap(
        lambda im, d, last, T, vel, vw: fused_frame_step(
            pipeline, im, d, last, T, vel, vw, mm_radius, map_radius,
            min_lm=min_lm,
        )
    )(images, depths, state.feats, state.Tcw, state.velocity, views)
    new_state = StreamState(
        feats=res.feats, Tcw=res.Tcw, velocity=res.velocity
    )
    return new_state, res.sup, res.sup_heavy


def shard_step(pipeline: ORBPipeline, mesh: Mesh, axis: str = "stream",
               min_lm: int = 30):
    """jit the multistream step sharded over the mesh's stream axis.

    Built on ``shard_map``, not jit-with-in_shardings: per-stream SLAM
    needs no collectives, so each device runs the per-shard program on its
    local streams verbatim -- and the Pallas FAST kernel inside the fused
    step lowers as ordinary per-device code, which XLA's SPMD partitioner
    cannot do (a partitioned pallas_call fails at runtime on TPU;
    measured round 4)."""

    def local_step(state, images, depths, views, mm_radius, map_radius):
        return multistream_step(
            pipeline, state, images, depths, views, mm_radius, map_radius,
            min_lm=min_lm,
        )

    b = P(axis)
    r = P()
    mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(b, b, b, b, r, r),
        out_specs=(b, b, b),
        check_vma=False,
    )
    # NOT donated: keyframe supervision resolves 1-2 steps late (the
    # pipelined reader below), so the host still holds references into
    # step t's state when step t+1 dispatches -- donating would invalidate
    # them. The state is a few MB for 8 streams; the double-buffering cost
    # is noise next to the ~30 ms/step tunnel RTT that pipelining hides.
    # (Donation here also carried a real hazard: see init_state's
    # buffer-aliasing note, the round-4 crash.)
    return jax.jit(mapped)


class MultiStreamSLAM:
    """S concurrent RGB-D SLAM streams with LIVE per-stream maps.

    The device half is ONE sharded program per step (all S fused frame
    steps batched over the mesh's stream axis). The host half mirrors
    System's keyframe supervision per stream -- PIPELINED one step behind
    exactly like System's _SupervisionReader: the (S, 3) count rows are
    materialized on a side thread (the blocking device->host read releases
    the GIL, hiding the ~30 ms tunnel RTT behind the next step's
    dispatch), and keyframe decisions resolve when the read lands, 1-2
    steps late. For streams that trigger insertion, the (3N,) payload row
    of THAT step's (retained, undonated) state is fetched, the stream's
    own SlamMap inserts the keyframe (landmark creation from close depth,
    covisibility, spanning tree -- slam_map.insert_keyframe), new points
    triangulate, local BA runs, and the stream's LocalView refreshes --
    the reference's LocalMapping cycle (src/LocalMapping.cc:73-175) per
    stream, with the same consumer-thread latency. Streams therefore
    track against growing maps: 8-stream SLAM, not 8-stream odometry.
    """

    def __init__(self, cfg, S: int, mesh: Mesh = None, run_ba: bool = True):
        from ..slam_map.slam_map import SlamMap
        from ..system import _SupervisionReader

        self.cfg = cfg
        self.S = S
        self.run_ba = run_ba
        self.pipeline = ORBPipeline(cfg.orb, cfg.camera)
        self.mesh = mesh if mesh is not None else make_stream_mesh(
            jax.devices()[:1]
        )
        self.maps = [SlamMap(cfg, self.pipeline.cam) for _ in range(S)]
        self.ref_kf = [0] * S
        self.last_kf_frame = [-999] * S
        self.last_kf_inliers = [0] * S
        self.frame = -1
        self.state: StreamState = None
        self.views: LocalView = None
        tc = cfg.tracking
        self._r_mm = jnp.asarray(tc.match_radius_motion)
        self._r_map = jnp.asarray(tc.match_radius_map * 2.0)
        self._batch = NamedSharding(self.mesh, P("stream"))
        self._step = shard_step(
            self.pipeline, self.mesh, min_lm=tc.min_inliers_local_map
        )
        # pipelined supervision (System's reader pattern, stream-batched)
        self._reader = _SupervisionReader()
        self.last_sup = np.zeros((S, 3), np.int64)

    # -- lifecycle -----------------------------------------------------
    def initialize(self, images, depths):
        """Bootstrap every stream: first frame becomes its keyframe 0 with
        landmarks from valid close depth (StereoInitialization semantics,
        src/Tracking.cc:1343, per stream)."""
        imgs = jax.device_put(jnp.asarray(images), self._batch)
        deps = jax.device_put(jnp.asarray(depths), self._batch)
        self.state = jax.device_put(
            init_state(self.pipeline, imgs, deps), self._batch
        )
        N = self.cfg.orb.max_kpts
        none = np.full(N, -1, np.int64)
        for s in range(self.S):
            feats_s = jax.tree.map(lambda x: x[s], self.state.feats)
            self.ref_kf[s] = self.maps[s].insert_keyframe(
                feats_s, jnp.eye(4), none, 0
            )
            self.last_kf_frame[s] = 0
            self.last_kf_inliers[s] = 1
        self.frame = 0
        self._refresh_views()

    def _refresh_views(self):
        views = [
            self.maps[s].local_view(self.ref_kf[s]) for s in range(self.S)
        ]
        # stream-axis placement: each stream's view lives on its shard
        self.views = jax.device_put(
            jax.tree.map(lambda *xs: jnp.stack(xs), *views), self._batch
        )

    # -- per-frame step ------------------------------------------------
    def step(self, images, depths):
        """Track one frame on every stream; returns ((S, 4, 4) poses,
        (S, 3) count rows of the most recently RESOLVED step -- keyframe
        supervision is pipelined 1-2 steps behind dispatch, see class
        docstring)."""
        self.frame += 1
        st, sup, heavy = self._step(
            self.state,
            jax.device_put(jnp.asarray(images), self._batch),
            jax.device_put(jnp.asarray(depths), self._batch),
            self.views, self._r_mm, self._r_map,
        )
        self.state = st
        # resolve whatever supervision reads have landed; keep dispatch
        # running at most 2 steps ahead so maintenance interleaves
        self._reader.submit((sup, (st, heavy, self.frame)))
        self._reader.wait_until(2)
        for done in self._reader.drain():
            self._resolve_step(*done)
        return self.state.Tcw, self.last_sup

    def flush(self):
        """Resolve every in-flight supervision read (call before reading
        maps/trajectories at end of run)."""
        for done in self._reader.flush():
            self._resolve_step(*done)

    def _resolve_step(self, st, heavy, frame, sup_np):
        self.last_sup = sup_np
        tc = self.cfg.tracking
        need = []
        for s in range(self.S):
            n_mm, n_lm, n_close = (int(v) for v in sup_np[s])
            gap = frame - self.last_kf_frame[s]
            if n_lm >= tc.min_inliers_local_map:
                if (
                    gap >= 30
                    or (gap >= 3
                        and n_lm < 0.75 * max(self.last_kf_inliers[s], 1))
                    or n_lm < 50
                ):
                    need.append((s, n_lm, True))
            elif n_mm >= 10 and gap >= 3 and n_close >= 100:
                need.append((s, max(n_mm, 1), False))
        if need:
            self._insert_keyframes(need, heavy, st, frame)

    def _insert_keyframes(self, need, heavy, st, frame):
        N = self.cfg.orb.max_kpts
        rows = jax.device_get([heavy[s] for (s, _, _) in need])
        for (s, inl, matched), hv in zip(need, rows):
            hv = np.asarray(hv)
            feats_s = jax.tree.map(lambda x: x[s], st.feats)
            kp = hv[:N].astype(np.int64) if matched else np.full(
                N, -1, np.int64
            )
            valid = hv[N : 2 * N] > 0
            close = hv[2 * N :] > 0
            m = self.maps[s]
            if m.n_kfs >= m.K - 2:
                if m.kf_alive[: m.n_kfs].all():
                    m.grow_keyframes()
                else:
                    lut = m.compact_keyframes()
                    if lut is not None:
                        self.ref_kf[s] = (
                            int(lut[self.ref_kf[s]])
                            if lut[self.ref_kf[s]] >= 0 else m.n_kfs - 1
                        )
            self.ref_kf[s] = m.insert_keyframe(
                feats_s, st.Tcw[s], kp, frame,
                valid_close=(valid, close),
            )
            self.last_kf_frame[s] = frame
            self.last_kf_inliers[s] = inl
            # keyframe-rate maintenance for this stream: triangulate new
            # landmarks with covisible neighbours, then local BA
            disp = m.create_new_points_dispatch(self.ref_kf[s])
            if disp is not None:
                m.create_new_points_resolve(
                    self.ref_kf[s], disp, np.asarray(disp["packed"])
                )
            if self.run_ba:
                m.run_local_ba(self.ref_kf[s])
        self._refresh_views()
