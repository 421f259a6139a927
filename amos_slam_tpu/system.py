"""System facade: the public API of the framework.

Mirrors the reference's System class (src/System.cc:38-645: construction,
TrackRGBD, Reset, Shutdown, SaveTrajectoryTUM/KITTI) and the sensor-agnostic
Tracking state machine (src/Tracking.cc:467). The reference's 4 threads
become: tracking = the caller's loop of jitted device programs; local
mapping = jitted kernels dispatched at keyframe rate (JAX async dispatch
overlaps them with subsequent tracking work); loop closing hooks in via
loop/ (see that package).
"""

from __future__ import annotations

import collections
import enum
import queue
import threading
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import SystemConfig
from .geometry import se3
from .frontend.features import ORBPipeline, FrameFeatures
from .frontend.tracking import track_motion_model
from .frontend.dynamics import compute_dynamics
from .ops.slic import dilate_mask
from .slam_map.slam_map import SlamMap, track_local_map
from .io import trajectory


class TrackingState(enum.Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


class _SupervisionReader:
    """Background thread that materializes packed supervision vectors.

    A blocking device->host read releases the GIL, so a side thread hides
    the whole transfer latency behind the main thread's dispatch work
    (measured on the axon tunnel: ~30 ms RTT per read fully overlapped).
    If reads are slower than frames arrive, the thread groups everything
    queued into ONE stacked fetch, so read throughput scales with group
    size and supervision lag stays bounded. Results come out in FIFO order.

    This replaces the reference's LocalMapping/LoopClosing consumer-thread
    queues (src/LocalMapping.cc:176): here the worker only *reads*; all map
    mutation stays on the caller's thread, keeping the no-locks functional
    map design.
    """

    _MAX_GROUP = 32

    def __init__(self):
        self._in = queue.Queue()
        self._out = collections.deque()
        self._thread = None
        # count of submitted-but-not-yet-materialized items, used by
        # wait_until to bound how far dispatch runs ahead of supervision
        self._pending = 0
        self._cv = threading.Condition()

    def submit(self, item):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
        with self._cv:
            self._pending += 1
        self._in.put(item)

    def wait_until(self, max_pending: int):
        """Block until at most ``max_pending`` submitted items are still
        unmaterialized. Bounding the in-flight window keeps keyframe
        maintenance kernels INTERLEAVED with tracking scans in the
        device's FIFO queue -- unbounded dispatch enqueues every chunk
        first, so all maintenance work (and its fetch round trips)
        serializes after the full tracking compute (measured: a ~600 ms
        flush tail on a 96-frame run, round 4)."""
        with self._cv:
            while self._pending > max_pending:
                if self._thread is None or not self._thread.is_alive():
                    # reader died (device_get raised): surface the failure
                    # on the tracking thread instead of spinning forever
                    raise RuntimeError(
                        "supervision reader thread died with "
                        f"{self._pending} reads outstanding"
                    )
                self._cv.wait(timeout=1.0)

    def _run(self):
        while True:
            item = self._in.get()
            if item is None:
                self._in.task_done()
                return
            group = [item]
            try:
                while len(group) < self._MAX_GROUP:
                    group.append(self._in.get_nowait())
            except queue.Empty:
                pass
            n_got = len(group)
            stop = any(g is None for g in group)
            group = [g for g in group if g is not None]
            try:
                # ONE bulk transfer for the whole group: device_get starts
                # every copy asynchronously before blocking, so N queued
                # supervision vectors cost ~1 tunnel round trip, not N
                # serialized ones (measured: the serial form was 500+ ms of
                # the shutdown flush)
                sups_np = jax.device_get([sup for (sup, _) in group])
                for (_, (res, view, frame_id)), sup in zip(group, sups_np):
                    self._out.append((res, view, frame_id, sup))
            finally:
                # decrement + notify even if device_get raised, so
                # wait_until never deadlocks on a dead reader
                with self._cv:
                    self._pending -= len(group)
                    self._cv.notify_all()
                for _ in range(n_got):
                    self._in.task_done()
            if stop:
                return

    def drain(self):
        """Non-blocking: everything already materialized, oldest first."""
        out = []
        while self._out:
            out.append(self._out.popleft())
        return out

    def flush(self):
        """Block until every submitted frame is materialized, then drain."""
        if self._thread is not None and self._thread.is_alive():
            self._in.join()
        return self.drain()

    def stop(self):
        if self._thread is not None and self._thread.is_alive():
            self._in.put(None)
            self._in.join()


class _AsyncFetcher:
    """FIFO device->host materializer with host continuations.

    Keyframe-rate maintenance (triangulation, fusion, culling, loop BoW)
    each need ONE small device fetch whose ~30 ms tunnel round trip used to
    stall the tracking thread. Here the blocking np.asarray runs on a side
    thread (releasing the GIL, overlapped with dispatch); the host half of
    each operation runs as a continuation on the *tracking* thread at the
    next drain point, in submission order -- so all map mutation stays
    single-threaded (the no-locks design), exactly like the reference's
    LocalMapping consumer thread but without shared-state mutexes
    (src/LocalMapping.cc:176)."""

    def __init__(self):
        self._in = queue.Queue()
        self._out = collections.deque()
        self._thread = None

    def submit(self, dev, cont):
        """dev: pytree of device arrays; cont(host_pytree) runs at drain."""
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
        self._in.put((dev, cont))

    _MAX_GROUP = 16

    def _run(self):
        while True:
            item = self._in.get()
            if item is None:
                self._in.task_done()
                return
            group = [item]
            try:
                while len(group) < self._MAX_GROUP:
                    nxt = self._in.get_nowait()
                    if nxt is None:
                        # keep the sentinel ordered after this group
                        self._in.put(None)
                        self._in.task_done()
                        break
                    group.append(nxt)
            except queue.Empty:
                pass
            # ONE bulk transfer for every leaf of every queued fetch:
            # device_get issues all copies asynchronously before blocking,
            # so a group costs ~1 tunnel round trip instead of one per leaf
            hosts = jax.device_get([dev for (dev, _) in group])
            for (_, cont), host in zip(group, hosts):
                self._out.append((cont, host))
            for _ in range(len(group)):
                self._in.task_done()

    def drain(self):
        """Run finished continuations (tracking thread only)."""
        while self._out:
            cont, host = self._out.popleft()
            cont(host)

    def flush(self):
        """Block until everything submitted so far has resolved -- looped,
        because continuations may submit follow-up fetches."""
        while True:
            if self._thread is None or not self._thread.is_alive():
                self.drain()
                if self._in.empty() and not self._out:
                    return
                continue
            self._in.join()
            self.drain()
            if self._in.empty() and not self._out:
                return

    def stop(self):
        # flush-first contract: the queue is empty when the sentinel is
        # enqueued, so the worker's requeue-sentinel-at-tail grouping in
        # _run can never order real work after the sentinel
        self.flush()
        if self._thread is not None and self._thread.is_alive():
            self._in.put(None)
            self._in.join()


@jax.jit
def _slice_row(tree, j):
    """Row j of every leaf of a stacked pytree in ONE device program.

    Per-leaf eager slicing costs one relay dispatch each (~5 ms fixed
    overhead through the tunnel); a keyframe insertion touches ~13 leaves,
    so the per-leaf form burned ~60 ms of device-queue time per keyframe
    (measured round 4)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_index_in_dim(x, j, keepdims=False), tree
    )


class _ChunkRow:
    """Lazy per-frame view over a FusedChunkResult: device arrays are
    sliced only if the supervisor actually needs them (keyframe insertion
    happens for a few % of frames). The slice materializes ALL row leaves
    (features, pose, insertion payload) in one jitted program on first
    access."""

    __slots__ = ("_chunk", "_j", "_row")

    def __init__(self, chunk, j: int):
        self._chunk = chunk
        self._j = j
        self._row = None

    def _materialize(self):
        if self._row is None:
            self._row = _slice_row(
                self._chunk.ys, jnp.asarray(self._j, jnp.int32)
            )
        return self._row

    @property
    def feats(self):
        return self._materialize().feats

    @property
    def Tcw(self):
        return self._materialize().Tcw

    @property
    def sup_heavy(self):
        return self._materialize().sup_heavy


class System:
    """The SLAM system facade for RGB-D, stereo, and monocular sensors.

    Usage matches the reference (System::TrackRGBD/TrackStereo/
    TrackMonocular, src/System.cc:172-396):
        slam = System(cfg)
        for rgb, depth, t in frames:
            Tcw = slam.track_rgbd(gray, depth, t)
        slam.save_trajectory_tum("CameraTrajectory.txt")
    """

    def __init__(self, cfg: Optional[SystemConfig] = None, vocabulary=None,
                 debug_dir: Optional[str] = None):
        self.cfg = cfg or SystemConfig()
        self.pipeline = ORBPipeline(self.cfg.orb, self.cfg.camera)
        self.cam = self.pipeline.cam
        self.map = SlamMap(self.cfg, self.cam)
        # Place recognition: a pretrained vocabulary can be supplied (see
        # loop.vocab_io for ORBvoc.txt import); otherwise one is trained
        # from the session's own early descriptors at the first keyframe --
        # a session-local quantizer is sufficient for within-session
        # relocalization and loop closure.
        self._vocabulary = vocabulary
        self.loop = None

        self.state = TrackingState.NOT_INITIALIZED
        self.last_feats: Optional[FrameFeatures] = None
        self.last_Tcw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.ref_kf = 0
        self.last_kf_frame = -999
        self.last_kf_inliers = 0
        self.frame_id = -1

        self.timestamps = []
        self.poses_cw = []
        # one entry per poses_cw entry: index into self._ref_epochs (the
        # (ref-keyframe uid, ref pose at track time) snapshot the frame was
        # tracked against), or -1 pre-init. Used by corrected_poses_np to
        # replay loop/GBA corrections into the full-frame trajectory (the
        # reference's mlpReferences + track-time Tcr, src/Tracking.cc:806-815).
        self.frame_refs = []
        self._ref_epochs = []   # (uid, device/host (4,4) ref Tcw) snapshots
        self._epoch_key = None  # (map identity, map.version, ref_kf) of [-1]
        self.stats = []
        # localization-only mode (reference ActivateLocalizationMode,
        # src/System.cc: tracking continues, the map is frozen)
        self.localization_only = False

        # pipelined fast path: a reader thread materializes each frame's
        # packed supervision vector concurrently with dispatch; the main
        # thread drains finished results every frame and runs the state
        # machine / keyframe decisions on them (lag ~ 1-2 frames = the
        # tunnel round trip, never blocking dispatch)
        self._compacting = False
        self._reader = _SupervisionReader()
        # async materializer for keyframe-rate maintenance fetches
        self._fetcher = _AsyncFetcher()
        tc = self.cfg.tracking
        self._r_mm = jnp.asarray(tc.match_radius_motion)
        self._r_map = jnp.asarray(tc.match_radius_map * 2.0)

        # per-frame debug artifact dumping (the reference writes
        # output/<id>_rgb/_seg/_mask.png every frame, src/Tracking.cc:392-396)
        self.debug_dir = debug_dir
        if debug_dir:
            import os
            os.makedirs(debug_dir, exist_ok=True)

        # previous-frame state for the dynamic stage
        self.prev_gray = None
        self.prev_depth = None
        # EMA gate levels for the dynamic stage (device (3,) array carried
        # frame to frame; None = cold start at the absolute thresholds)
        self._dyn_gates = None
        # last suppression mask (device (H, W) bool), reused on skipped
        # frames when dynamics.dyn_stride > 1
        self._dyn_mask = None
        self.prev_kp_xy = None
        self.prev_kp_valid = None
        # mono fast path: last frame's per-keypoint landmark ids (device
        # array from its local-map track; None until a slow-path frame or
        # fast-path frame produces one)
        self._last_pid = None
        self._zero_masks = {}   # (H, W) -> cached device all-false mask
        # landmark visible/found counters accumulate INSIDE the fused frame
        # program ((V,2) carried in the device state chain) and apply to the
        # map in one scatter per keyframe -- a per-frame bump_stats dispatch
        # costs a full tunnel dispatch (~5 ms measured), doubling frame cost
        self._stats_acc = None
        self._acc_ids = None
        # cached two-stage chunk programs keyed (has_seg, use_rgb)
        self._dyn_chunk_fns = {}
        # auto-reset when tracking is lost soon after initialization with a
        # tiny map (reference src/Tracking.cc:785-793: "Track lost soon
        # after initialisation, reseting..."): relocalization against <= 5
        # keyframes of a bad bootstrap rarely succeeds, so start over.
        self._pending_reset = False

    def _maybe_auto_reset(self):
        if self._pending_reset:
            # Resolve everything in flight first: with lagged supervision,
            # the LOST verdict that scheduled this reset may be stale -- a
            # later frame can already have re-anchored (its OK resolve
            # clears the flag, _resolve_step). Resetting a map that
            # recovered frames ago would discard good tracking (observed:
            # a 3-frame blackout whose recovery resolved late wiped the
            # map 6 frames after tracking was healthy again).
            self._flush_pending()
        if self._pending_reset:
            self._pending_reset = False
            self.reset()

    def _on_lost(self):
        self.state = TrackingState.LOST
        if self.map.n_kfs <= 5 and not self.localization_only:
            self._pending_reset = True

    def _flush_stats(self):
        """Apply the accumulated [visible, found] counters to the map (one
        scatter), then reset the accumulator."""
        if self._stats_acc is not None and self._acc_ids is not None:
            self.map.apply_stats_rows(self._acc_ids, self._stats_acc)
        self._stats_acc = None
        self._acc_ids = None

    def _zero_mask(self, g) -> jax.Array:
        """Cached all-false segmentation mask (allocating one per frame is
        an eager dispatch -- a tunnel round trip)."""
        m = self._zero_masks.get(g.shape)
        if m is None:
            m = jnp.zeros(g.shape, bool)
            self._zero_masks[g.shape] = m
        return m

    # ------------------------------------------------------------------ api
    def track_rgbd(
        self,
        gray: np.ndarray,
        depth: np.ndarray,
        timestamp: float,
        seg_mask: Optional[np.ndarray] = None,
        rgb: Optional[np.ndarray] = None,
    ):
        """One frame in, camera pose out (reference System::TrackRGBD).

        seg_mask: optional (H, W) stage-1 semantic dynamic-object mask (the
        reference's YOLACT person mask; see models/segmenter to produce one).
        rgb: optional (H, W, 3) color frame; with use_dynamics the SLIC
        stage then clusters in CIELAB like the reference
        (src/cluster.cc:88-146) -- chroma-distinct movers stay separable
        even when luma-matched to their background.
        """
        self._maybe_auto_reset()
        self.frame_id += 1
        g = jnp.asarray(gray)
        d = jnp.asarray(depth)
        c = jnp.asarray(rgb) if rgb is not None else None
        if self.prev_gray is not None and self.prev_gray.ndim == 3:
            # chunk-mode -> per-frame transition: the chunk path keeps the
            # whole previous stack; the per-frame path needs its last row
            self.prev_gray = self.prev_gray[-1]
            self.prev_depth = self.prev_depth[-1]

        # resolve whatever supervision the reader finished BEFORE deciding
        # this frame's path: keyframes inserted here reach this very
        # frame's local-map view (one frame less supervision lag). In
        # deterministic mode, *wait* for all of it -- supervision lag is
        # then exactly zero frames and runs are reproducible.
        if self.cfg.deterministic:
            self._flush_pending()
        else:
            for done in self._reader.drain():
                self._resolve_done(*done)
            self._fetcher.drain()
            # bounded dispatch run-ahead (see _SupervisionReader.wait_until):
            # loose 16-frame window -- enough to hide the tunnel RTT, tight
            # enough that keyframe maintenance interleaves with tracking in
            # the device queue
            self._reader.wait_until(16)
            for done in self._reader.drain():
                self._resolve_done(*done)
            self._fetcher.drain()

        # Fast path: with neither a seg mask nor the geometric stage active,
        # the whole frame -- extraction + both tracking stages + the pose/
        # velocity update -- is ONE fused XLA program, and the host state
        # machine runs PIPELINED one frame behind: the device state chain
        # (pose, velocity, features) is self-consistent inside the program
        # (including its own LOST fallback), so the host only supervises
        # (keyframes, relocalization) and can consume frame i's inlier
        # counts while frame i+1 computes. This hides the device->host
        # round trip, which costs more than the entire frame's compute.
        use_dyn_fast = (
            self.cfg.use_dynamics
            and self.state is TrackingState.OK
            and self.prev_gray is not None
            and self.prev_depth is not None
        )
        use_plain_fast = (
            not self.cfg.use_dynamics
            and seg_mask is None
            and self.state is TrackingState.OK
        )
        if use_dyn_fast or use_plain_fast:
            from .frontend.tracking import fused_frame_step

            tcfg = self.cfg.tracking
            dcfg = self.cfg.dynamics
            view = self.map.local_view(self.ref_kf)
            if self._acc_ids is not None and view.ids is not self._acc_ids:
                self._flush_stats()   # view changed: apply counts to old ids
            if use_dyn_fast:
                # TWO dispatches by design: dynamics program + tracking
                # program (see fused_frame_step's suppress_mask note -- the
                # combined graph compiles ~6x slower than the parts).
                # NO eager device math here: every eager op in this branch
                # is a per-frame tunnel dispatch (~55 ms/frame measured);
                # pose prediction and the RANSAC key derive inside the
                # jitted program from (velocity, last_Tcw, frame_id).
                seg = seg_mask if seg_mask is not None else self._zero_mask(g)
                if (
                    dcfg.dyn_stride > 1
                    and self.frame_id % dcfg.dyn_stride != 0
                    and self._dyn_mask is not None
                ):
                    # stride frame: reuse the last GEOMETRIC cluster mask;
                    # the stage-1 seg mask applies fresh (a mover trails
                    # a reused seg mask within one frame)
                    suppress = (
                        dilate_mask(seg, dcfg.mask_dilate_radius)
                        | self._dyn_mask
                        if seg_mask is not None else self._dyn_mask
                    )
                else:
                    dyn = compute_dynamics(
                        self.cam, self.prev_gray, self.prev_depth, g, d, seg,
                        self.last_Tcw, self.velocity,
                        self.last_feats.kp.xy, self.last_feats.kp.valid,
                        self.frame_id,
                        epi_outlier_th=dcfg.epipolar_outlier_th,
                        mean_rpe_th=dcfg.mean_rpe_th,
                        flow3d_th=dcfg.flow3d_th,
                        n_clusters=dcfg.n_clusters,
                        slic_cell=dcfg.slic_cell,
                        slic_iters=dcfg.slic_iters,
                        dilate_radius=dcfg.mask_dilate_radius,
                        slic_compactness=dcfg.slic_compactness,
                        has_seg=seg_mask is not None,
                        slic_downsample=dcfg.slic_downsample,
                        lk_levels=dcfg.lk_levels,
                        lk_win=dcfg.lk_win,
                        lk_iters=dcfg.lk_iters,
                        lk_downsample=dcfg.lk_downsample,
                        pnp_hypotheses=dcfg.pnp_hypotheses,
                        cur_rgb=c,
                        gate_state=self._dyn_gates,
                    )
                    self._dyn_gates = dyn.gate_state
                    suppress = dyn.suppress_mask
                    self._dyn_mask = dyn.geom_mask
                res = fused_frame_step(
                    self.pipeline, g, d, self.last_feats, self.last_Tcw,
                    self.velocity, view, self._r_mm, self._r_map,
                    min_lm=tcfg.min_inliers_local_map,
                    suppress_mask=suppress,
                    stats_acc=self._stats_acc,
                )
            else:
                res = fused_frame_step(
                    self.pipeline, g, d, self.last_feats, self.last_Tcw,
                    self.velocity, view, self._r_mm, self._r_map,
                    min_lm=tcfg.min_inliers_local_map,
                    stats_acc=self._stats_acc,
                )
            self._stats_acc = res.stats_acc
            self._acc_ids = view.ids
            # advance the device state chain immediately
            self.last_feats = res.feats
            self.last_Tcw = res.Tcw
            self.velocity = res.velocity
            self.prev_kp_xy = res.feats.kp.xy
            self.prev_kp_valid = res.feats.kp.valid
            self.prev_gray, self.prev_depth = g, d
            self.timestamps.append(timestamp)
            self.poses_cw.append(res.Tcw)
            self.frame_refs.append(self._ref_epoch())

            self._reader.submit((res.sup, (res, view, self.frame_id)))
            for done in self._reader.drain():
                self._resolve_done(*done)
            self._fetcher.drain()
            if self.debug_dir is not None:
                self._dump_debug(res.feats, g)
            return res.Tcw

        self._flush_pending()
        seg = (
            jnp.asarray(seg_mask) if seg_mask is not None
            else self._zero_mask(g)
        )
        feats = self._extract_with_dynamics(
            g, d, seg, seg_mask is not None, rgb=c
        )

        if self.state is TrackingState.NOT_INITIALIZED:
            Tcw = self._initialize(feats)
        else:
            Tcw = self._track(feats)
        return self._finish_frame(feats, Tcw, g, d, timestamp)

    def track_rgbd_chunk(self, grays, depths, timestamps, seg_masks=None,
                         rgbs=None):
        """Throughput mode: track W frames in ONE device dispatch.

        grays/depths: (W, H, Wd) stacked frames; timestamps: length-W list.
        seg_masks: optional (W, H, Wd) stage-1 semantic masks for the whole
        chunk (produce with models.segmenter.person_mask_batch -- one
        batched backbone forward). rgbs: optional (W, H, Wd, 3) color for
        CIELAB SLIC in the dynamic stage. Returns the (W, 4, 4) poses.

        The W fused frame steps run under one lax.scan, so the fixed
        per-dispatch cost (dominant through a remote-dispatch link, ~5 ms
        vs ~0.2 ms of per-frame compute) is paid once per chunk, and the
        per-frame supervision rows come home as one (W, S) fetch. With
        use_dynamics the scan body additionally runs the full Amos
        geometric stage feeding keypoint suppression (see
        tracking.make_dyn_chunk_fn). Keyframe decisions resolve at chunk
        granularity (supervision lag <= 2W frames vs <= 2 in the per-frame
        API) -- the same async-LocalMapping semantics as the reference's
        consumer thread, with a deeper queue. Falls back to the per-frame
        path while not initialized / LOST / deterministic."""
        from .frontend.tracking import fused_frame_scan

        g = jnp.asarray(grays)
        d = jnp.asarray(depths)
        W = g.shape[0]
        use_dyn = (
            self.cfg.use_dynamics
            and self.prev_gray is not None
            and self.prev_depth is not None
        )
        if (
            self.cfg.deterministic
            or self.state is not TrackingState.OK
            or (self.cfg.use_dynamics and not use_dyn)
        ):
            # per-frame fallback (eager row slices; only around init/LOST)
            out = []
            for j in range(W):
                m = None if seg_masks is None else seg_masks[j]
                c = None if rgbs is None else rgbs[j]
                out.append(
                    self.track_rgbd(g[j], d[j], timestamps[j],
                                    seg_mask=m, rgb=c)
                )
            return jnp.stack(out)

        for done in self._reader.drain():
            self._resolve_done(*done)
        self._fetcher.drain()
        # bounded dispatch window: at most dispatch_window unresolved
        # chunks ahead, so keyframe maintenance interleaves with tracking
        # scans in the device queue instead of serializing after all of
        # them (see _SupervisionReader.wait_until). At least two: the
        # supervision read lands ~1 tunnel RTT after its chunk's compute
        # finishes, and a window of one puts that RTT in the per-chunk
        # critical path (measured: 112 -> 90 FPS when the tunnel RTT
        # spiked to 36 ms).
        self._reader.wait_until(self.cfg.tracking.dispatch_window)
        for done in self._reader.drain():
            self._resolve_done(*done)
        self._fetcher.drain()

        tcfg = self.cfg.tracking
        view = self.map.local_view(self.ref_kf)
        if self._acc_ids is not None and view.ids is not self._acc_ids:
            self._flush_stats()
        fid0 = self.frame_id + 1
        self.frame_id += W
        if use_dyn:
            res = self._dyn_chunk_call(g, d, seg_masks, rgbs, view, fid0)
        else:
            res = fused_frame_scan(
                self.pipeline, g, d, self.last_feats, self.last_Tcw,
                self.velocity, view, self._r_mm, self._r_map,
                min_lm=tcfg.min_inliers_local_map,
                stats_acc=self._stats_acc,
            )
        self._stats_acc = res.stats_acc
        self._acc_ids = view.ids
        self.last_feats = res.feats
        self.last_Tcw = res.Tcw
        self.velocity = res.velocity
        self.prev_kp_xy = res.feats.kp.xy
        self.prev_kp_valid = res.feats.kp.valid
        self.timestamps.extend(timestamps)
        self.poses_cw.append(res.ys.Tcw)   # (W,4,4) chunk entry
        self.frame_refs.append(self._ref_epoch())
        self._reader.submit((res.ys.sup, (res, view, fid0)))
        for done in self._reader.drain():
            self._resolve_done(*done)
        self._fetcher.drain()
        return res.ys.Tcw

    def _dyn_chunk_call(self, g, d, seg_masks, rgbs, view, fid0):
        """Dispatch the two-stage W-frame chunk program (cached per
        (has_seg, use_rgb) static variant)."""
        from .frontend.tracking import make_dyn_chunk_fn

        has_seg = seg_masks is not None
        use_rgb = rgbs is not None
        key = (has_seg, use_rgb)
        fn = self._dyn_chunk_fns.get(key)
        if fn is None:
            fn = make_dyn_chunk_fn(
                self.pipeline, self.cfg.dynamics,
                self.cfg.tracking.min_inliers_local_map, has_seg, use_rgb,
            )
            self._dyn_chunk_fns[key] = fn
        segs = (
            jnp.asarray(seg_masks) if has_seg
            else jnp.zeros(g.shape, bool)
        )
        rgb_stack = jnp.asarray(rgbs) if use_rgb else None
        # previous-frame stacks: steady state reuses the last chunk's
        # device stacks wholesale (the program uses only their [-1] rows);
        # the per-frame -> chunk transition lifts the single (H, W) frames
        # once
        pg, pd = self.prev_gray, self.prev_depth
        if pg.ndim == 2:
            pg, pd = pg[None], pd[None]
        gates = (
            self._dyn_gates if self._dyn_gates is not None
            else jnp.zeros(3, jnp.float32)
        )
        mask_in = (
            self._dyn_mask if self._dyn_mask is not None
            else self._zero_mask(g[0])
        )
        res = fn(
            g, d, pg, pd, segs, rgb_stack, self.last_feats, self.last_Tcw,
            self.velocity, gates, mask_in, view, self._r_mm, self._r_map,
            jnp.asarray(fid0), self._stats_acc,
        )
        self._dyn_gates = res.gate_state
        self._dyn_mask = res.geom_mask   # geometric cluster mask carried
                                         # across chunks for dyn_stride reuse
        # keep the full stacks: the next chunk slices [-1] inside its
        # program; a host-side slice would be an extra dispatch per chunk
        self.prev_gray, self.prev_depth = g, d
        return res

    def _ref_uid(self) -> int:
        """uid of the current reference keyframe (-1 before initialization)."""
        if self.map.n_kfs == 0:
            return -1
        return int(self.map.slot_uid[self.ref_kf])

    def _ref_epoch(self) -> int:
        """Index into self._ref_epochs for the CURRENT (ref uid, ref pose)
        pair; -1 before initialization.

        The reference computes each frame's relative pose Tcr against the
        reference keyframe's pose AS OF THAT FRAME'S TRACK TIME
        (src/Tracking.cc:806-815: Tcr = Tcw * pRefKF->GetPoseInverse() in
        Track()), not its insert-time pose -- after a loop correction
        rebases the tracker (see _resolve of maintenance, the
        inv(Told) @ Tnew rebase) the subsequent frames are already in the
        corrected frame, and composing them against the insert-time pose
        would apply the correction twice at export. So each frame records
        an epoch: a (uid, device (4,4) kf_pose slice) snapshot taken the
        first time a frame is tracked after any map mutation / ref change.
        The slice is a lazy async device op (no host sync); epochs are
        created at map-mutation rate (~keyframe rate), not frame rate."""
        if self.map.n_kfs == 0:
            return -1
        key = (id(self.map), self.map.version, self.ref_kf)
        if key != self._epoch_key:
            self._epoch_key = key
            self._ref_epochs.append((
                int(self.map.slot_uid[self.ref_kf]),
                self.map.arrays.kf_pose[self.ref_kf],
            ))
        return len(self._ref_epochs) - 1

    def _frame_poses_refs(self):
        """(per-frame raw Tcw float64 list, per-frame ref-keyframe uid list);
        chunk-mode entries ((W, 4, 4) stacks) expand in order. ONE bulk
        device_get for the whole trajectory."""
        raws = jax.device_get(self.poses_cw)
        out, refs = [], []
        for T, u in zip(raws, self.frame_refs):
            a = np.asarray(T, np.float64)
            if a.ndim == 3:
                out.extend(a)
                refs.extend([u] * a.shape[0])
            else:
                out.append(a)
                refs.append(u)
        return out, refs

    def poses_np(self):
        """All frame poses as recorded at track time (no retroactive
        corrections; see corrected_poses_np for the replayed export)."""
        self._flush_pending()
        return self._frame_poses_refs()[0]

    def corrected_poses_np(self):
        """Full-frame trajectory with loop-closure / BA corrections applied
        retroactively: each frame pose is recomposed as
        ``Tcw = Tcr @ Tcw_ref(current)`` with
        ``Tcr = Tcw(track) @ inv(Tcw_ref(track))`` -- the reference's
        SaveTrajectoryTUM replay (src/System.cc:444-516; relative list
        built at src/Tracking.cc:806-815). ``Tcw_ref(track)`` is the
        track-time epoch snapshot (see _ref_epoch), so frames tracked
        after a loop rebase / local BA compose against the pose they were
        actually tracked in -- never double-applying a correction. A culled
        reference keyframe resolves through its recorded cull-time
        spanning-tree relative pose (KeyFrame::mTcp, src/System.cc:468-476)
        to the nearest surviving ancestor. Frames whose reference cannot be
        resolved (pre-init, or tracked before a System.reset) fall back to
        their raw pose."""
        self._flush_pending()
        if self.loop is not None:
            self.loop.flush_gba()
        raw, refs = self._frame_poses_refs()
        m = self.map
        cull_keys = list(m.uid_cull)
        # one bulk host read for every device-resident 4x4 involved
        fetched = jax.device_get(
            [m.arrays.kf_pose]
            + [T for (_, T) in self._ref_epochs]
            + [m.uid_cull[u][1] for u in cull_keys]
        )
        kf_now = np.asarray(fetched[0], np.float64)
        n_ep = len(self._ref_epochs)
        epochs = [
            (u, np.asarray(T, np.float64))
            for (u, _), T in zip(self._ref_epochs, fetched[1 : 1 + n_ep])
        ]
        cull = {
            u: (m.uid_cull[u][0], np.asarray(T, np.float64))
            for u, T in zip(cull_keys, fetched[1 + n_ep :])
        }
        uid2slot = {
            int(m.slot_uid[s]): s
            for s in range(m.n_kfs)
            if m.kf_alive[s] and m.slot_uid[s] >= 0
        }
        out = []
        for T_raw, e in zip(raw, refs):
            if e < 0:
                out.append(T_raw)
                continue
            u, T_ref = epochs[e]
            Tcr = T_raw @ trajectory._twc(T_ref)   # cam <- ref at track time
            ok = True
            while u not in uid2slot:
                nxt = cull.get(u)
                if nxt is None:   # chain broken (reset dropped the map)
                    ok = False
                    break
                pu, Tcp = nxt
                Tcr = Tcr @ Tcp
                u = pu
            out.append(Tcr @ kf_now[uid2slot[u]] if ok else T_raw)
        return out

    def track_stereo(self, left: np.ndarray, right: np.ndarray, timestamp: float):
        """Rectified stereo pair in, pose out (reference System::TrackStereo).

        The reference extracts left/right ORB in two std::threads
        (src/Frame.cc:161-170); here both extraction programs dispatch
        asynchronously to the device back to back.
        """
        from .ops.stereo import match_stereo

        self._maybe_auto_reset()
        self.frame_id += 1
        gl = jnp.asarray(left)
        gr = jnp.asarray(right)
        min_z = self.cam.bf / self.cam.fx  # disparity <= fx => depth >= b
        if self.cfg.deterministic:
            self._flush_pending()
        else:
            for done in self._reader.drain():
                self._resolve_done(*done)
            self._fetcher.drain()

        # pipelined fused fast path, like track_rgbd
        if self.state is TrackingState.OK:
            from .frontend.tracking import fused_stereo_step

            tcfg = self.cfg.tracking
            view = self.map.local_view(self.ref_kf)
            if self._acc_ids is not None and view.ids is not self._acc_ids:
                self._flush_stats()
            res = fused_stereo_step(
                self.pipeline, gl, gr, self.last_feats, self.last_Tcw,
                self.velocity, view, self._r_mm, self._r_map,
                jnp.asarray(min_z), min_lm=tcfg.min_inliers_local_map,
                stats_acc=self._stats_acc,
            )
            self._stats_acc = res.stats_acc
            self._acc_ids = view.ids
            self.last_feats = res.feats
            self.last_Tcw = res.Tcw
            self.velocity = res.velocity
            self.prev_kp_xy = res.feats.kp.xy
            self.prev_kp_valid = res.feats.kp.valid
            self.timestamps.append(timestamp)
            self.poses_cw.append(res.Tcw)
            self.frame_refs.append(self._ref_epoch())
            self._reader.submit((res.sup, (res, view, self.frame_id)))
            for done in self._reader.drain():
                self._resolve_done(*done)
            self._fetcher.drain()
            if self.debug_dir is not None:
                self._dump_debug(res.feats, gl)
            return res.Tcw

        self._flush_pending()
        kp_l, _, bl, pl = self.pipeline.detect_keypoints(gl)
        kp_r, _, br, pr = self.pipeline.detect_keypoints(gr)
        fl = self.pipeline.describe(kp_l, pl)
        fr = self.pipeline.describe(kp_r, pr)
        sm = match_stereo(
            fl.desc, kp_l.xy, kp_l.level, fl.valid,
            fr.desc, kp_r.xy, kp_r.level, fr.valid,
            bl[0], br[0], self.cam.bf, jnp.asarray(min_z),
        )
        feats = fl._replace(depth=sm.depth, u_right=sm.u_right)
        self.prev_kp_xy, self.prev_kp_valid = kp_l.xy, kp_l.valid

        if self.state is TrackingState.NOT_INITIALIZED:
            Tcw = self._initialize(feats)
        else:
            Tcw = self._track(feats)
        return self._finish_frame(feats, Tcw, gl, None, timestamp)

    def track_monocular(self, gray: np.ndarray, timestamp: float):
        """Single image in, pose out (reference System::TrackMonocular)."""
        self._maybe_auto_reset()
        self.frame_id += 1
        g = jnp.asarray(gray)

        # Pipelined fused fast path, like track_rgbd: the motion model's 3D
        # comes from the landmarks the last frame matched (_last_pid, a
        # device array carried frame to frame without any host read).
        if self.state is TrackingState.OK and self._last_pid is not None:
            from .frontend.tracking import fused_mono_step

            if self.cfg.deterministic:
                self._flush_pending()
            else:
                for done in self._reader.drain():
                    self._resolve_done(*done)
                self._fetcher.drain()
            if self.state is TrackingState.OK and self._last_pid is not None:
                tcfg = self.cfg.tracking
                view = self.map.local_view(self.ref_kf)
                a = self.map.arrays
                if self._acc_ids is not None and view.ids is not self._acc_ids:
                    self._flush_stats()
                res = fused_mono_step(
                    self.pipeline, g, self.last_feats, self._last_pid,
                    a.pt_pos, a.pt_valid, self.last_Tcw, self.velocity,
                    view, self._r_mm, self._r_map,
                    min_lm=tcfg.min_inliers_local_map,
                    stats_acc=self._stats_acc,
                )
                self._stats_acc = res.stats_acc
                self._acc_ids = view.ids
                self.last_feats = res.feats
                self.last_Tcw = res.Tcw
                self.velocity = res.velocity
                self._last_pid = res.lm.kp_point_id
                self.prev_kp_xy = res.feats.kp.xy
                self.prev_kp_valid = res.feats.kp.valid
                self.timestamps.append(timestamp)
                self.poses_cw.append(res.Tcw)
                self.frame_refs.append(self._ref_epoch())
                self._reader.submit((res.sup, (res, view, self.frame_id)))
                for done in self._reader.drain():
                    self._resolve_done(*done)
                self._fetcher.drain()
                if self.debug_dir is not None:
                    self._dump_debug(res.feats, g)
                return res.Tcw

        self._flush_pending()
        kp, _, _, patches = self.pipeline.detect_keypoints(g)
        feats = self.pipeline.describe(kp, patches)
        self.prev_kp_xy, self.prev_kp_valid = kp.xy, kp.valid

        if self.state is TrackingState.NOT_INITIALIZED:
            Tcw = self._initialize_mono(feats)
        else:
            Tcw = self._track(feats)
        return self._finish_frame(feats, Tcw, g, None, timestamp)

    def _dump_debug(self, feats, gray):
        from . import viewer

        overlay = viewer.draw_frame(np.asarray(gray), feats)
        try:
            from PIL import Image

            Image.fromarray(overlay).save(
                f"{self.debug_dir}/{self.frame_id:06d}_frame.png"
            )
        except ImportError:
            np.save(f"{self.debug_dir}/{self.frame_id:06d}_frame.npy", overlay)

    # ---------------------------------------------------- pipelined resolve
    def _resolve_done(self, res, view, frame_id: int, sup):
        """Route one materialized reader item: a (S,) row supervises one
        frame; a (W, S) block supervises a whole chunk scan row by row."""
        if sup.ndim == 2:
            for j in range(sup.shape[0]):
                self._resolve_step(
                    _ChunkRow(res, j), view, frame_id + j, sup[j]
                )
        else:
            self._resolve_step(res, view, frame_id, sup)

    def _resolve_step(self, res, view, frame_id: int, sup=None):
        """Lagged host supervision of one fused fast-path frame: state
        machine, keyframe decision, stats. `sup` is the frame's (3,)
        count vector [mm_inliers, lm_inliers, n_close], normally
        materialized by the reader thread so this never blocks on a
        device read. The DECISION needs only these counts; the heavy
        insertion payload (kp_point/valid/close, res.sup_heavy) is
        fetched asynchronously only when a keyframe is actually inserted
        -- shipping it per frame made the reader bulk fetch
        bandwidth-bound on the tunnel (measured ~340 ms per 96-frame
        flush, round 4)."""
        tcfg = self.cfg.tracking
        if sup is None:
            sup = np.asarray(res.sup)
        n_mm, n_lm, n_close = int(sup[0]), int(sup[1]), int(sup[2])
        made_kf = False
        if n_lm >= tcfg.min_inliers_local_map:
            self.state = TrackingState.OK
            self._pending_reset = False   # recovery cancels a stale reset
            # per-frame visible/found counters accumulate inside the fused
            # program (res.stats_acc); they apply to the map in one scatter
            # when the view changes or a keyframe is inserted (below)
            need_kf = (
                (frame_id - self.last_kf_frame >= 30)
                or (
                    frame_id - self.last_kf_frame >= 3
                    and n_lm < 0.75 * max(self.last_kf_inliers, 1)
                )
                or n_lm < 50
            )
            if need_kf and not self.localization_only:
                self._insert_kf_async(res, frame_id, n_lm, matched=True)
                made_kf = True
        elif n_mm >= 10:
            self.state = TrackingState.OK   # pure odometry frame
            self._pending_reset = False
            # Close-point-starved: the local map has fallen behind the
            # camera. Re-seed it with a keyframe built from this frame's
            # close-depth keypoints (all-new landmarks), the reference's
            # NeedNewKeyFrame insert-on-few-close-points rule
            # (src/Tracking.cc:2064-2208) -- without this, a long local-map
            # dropout degrades to raw odometry with no recovery path.
            if (
                not self.localization_only
                and frame_id - self.last_kf_frame >= 3
                and n_close >= 100
            ):
                self._insert_kf_async(
                    res, frame_id, max(n_mm, 1), matched=False
                )
                made_kf = True
        else:
            # the device chain already held the pose; the next frame takes
            # the slow path, which runs relocalization
            self._on_lost()
        self.stats.append({"matches": n_mm, "inliers": n_lm, "kf": made_kf})

    def _insert_kf_async(self, res, frame_id: int, kf_inliers: int,
                         matched: bool):
        """Insert a keyframe from a fused fast-path frame WITHOUT blocking
        on the insertion payload: the keyframe cadence state updates now
        (so subsequent frames' decisions see it), while the (3N,) payload
        materializes on the fetcher thread and the actual map insertion +
        maintenance runs as its continuation, in FIFO order with all other
        map mutations. `matched=False` is the odometry re-seed path (all
        landmarks new)."""
        N = self.cfg.orb.max_kpts
        self.last_kf_frame = frame_id
        self.last_kf_inliers = kf_inliers

        def cont(heavy):
            self._maybe_compact()
            self._flush_stats()   # cull decisions see fresh counters
            if matched:
                kp_point = heavy[:N].astype(np.int64)
            else:
                kp_point = np.full(N, -1, np.int64)
            valid = heavy[N : 2 * N] > 0
            close = heavy[2 * N :] > 0
            self.ref_kf = self.map.insert_keyframe(
                res.feats, res.Tcw, kp_point, frame_id,
                valid_close=(valid, close),
            )
            self._keyframe_maintenance(self.ref_kf)

        self._fetcher.submit(res.sup_heavy, cont)

    def _maybe_compact(self):
        """Reclaim culled keyframe slots when the map is near capacity
        (keyframe slot reuse -- removes the 512-keyframe ceiling for long
        sequences; see SlamMap.compact_keyframes). Pending continuations
        hold pre-compaction slot ids, so they resolve first. Reentrancy
        guard: the flush can resolve frames that themselves insert
        keyframes and land back here."""
        if self.map.n_kfs < self.map.K - 2 or self._compacting:
            return
        self._compacting = True
        try:
            self._flush_pending()
            if self.map.n_kfs < self.map.K - 2:
                return   # a nested resolve already compacted/culled
            # hysteresis: compacting for a handful of slots would thrash
            # (each compaction is a full-map gather + an insert-rate retrig)
            dead = self.map.n_kfs - int(
                self.map.kf_alive[: self.map.n_kfs].sum()
            )
            if dead < max(4, self.map.K // 16):
                # a long exploratory sequence genuinely needs more slots
                self.map.grow_keyframes()
                return
            lut = self.map.compact_keyframes()
            if lut[self.ref_kf] >= 0:
                self.ref_kf = int(lut[self.ref_kf])
            else:
                self.ref_kf = self.map.n_kfs - 1
            if self.loop is not None:
                self.loop.remap_slots(lut)
        finally:
            self._compacting = False

    def _flush_pending(self):
        for done in self._reader.flush():
            self._resolve_done(*done)
        self._fetcher.flush()
        self._flush_stats()

    # ------------------------------------------------- keyframe maintenance
    def _keyframe_maintenance(self, slot: int):
        """Post-insertion maintenance for keyframe ``slot``: triangulation,
        (on a cadence) fusion + culling + landmark refresh, loop detection,
        local BA. The reference runs all of this on the LocalMapping /
        LoopClosing threads (src/LocalMapping.cc:73, src/LoopClosing.cc:72);
        here every device program dispatches from the tracking thread, and
        the few small host fetches resolve asynchronously through
        self._fetcher, so the tracking loop never blocks on a transfer
        round trip.

        Fetch-chain depth is TWO round trips, not four: the triangulation
        match table and the loop BoW transform are independent device
        programs, so they ship home as ONE combined fetch; likewise the
        fuse match table and the cull stats. Each tunnel round trip is
        ~30-45 ms -- chain depth, not payload size, is what a keyframe
        costs the pipeline.

          [triangulate + loop BoW] -> resolve both, detect loop
                                   -> [fuse + cull stats] -> resolve,
                                      refresh -> local BA dispatch

        Heavy maintenance runs every 3rd keyframe: fusion/culling act on
        slowly-accumulating redundancy, and the reference's LocalMapping
        also skips them under load via its interrupt flags."""
        disp = self.map.create_new_points_dispatch(slot)
        bow = self.loop.bow_dispatch(slot) if self.loop is not None else None
        Told = self.map.arrays.kf_pose[slot] if self.loop is not None else None

        fetch = {}
        if disp is not None:
            fetch["tri"] = disp["packed"]
        if bow is not None:
            fetch["bow"] = bow

        def cont(host):
            if disp is not None:
                self.map.create_new_points_resolve(slot, disp, host["tri"])
            if bow is not None and self.loop.on_keyframe_resolve(
                slot, host["bow"]
            ):
                # poses were rewritten: rebase the tracker by the
                # keyframe's correction (relative motion since the
                # keyframe is preserved, so velocity stands)
                Tnew = self.map.arrays.kf_pose[slot]
                self.last_Tcw = self.last_Tcw @ se3.inv_T(Told) @ Tnew
            self._post_triangulation(slot)

        if fetch:
            self._fetcher.submit(fetch, cont)
        else:
            self._post_triangulation(slot)

    def _post_triangulation(self, slot: int):
        mcfg = self.cfg.map

        def finish():
            # BA last, so it optimizes the post-fusion observation set
            # (reference LocalMapping order: CreateNewMapPoints ->
            # SearchInNeighbors -> local BA -> KeyFrameCulling)
            if slot % mcfg.ba_cadence == 0 or slot < 4:
                self.map.run_local_ba(slot)

        if slot % mcfg.maintenance_cadence == 1:
            fdisp = self.map.fuse_neighbors_dispatch(slot)
            fetch = {"cull": self.map.cull_points_dispatch()}
            if fdisp is not None:
                fetch["fuse"] = fdisp["packed"]

            def cont_maint(host):
                if fdisp is not None:
                    self.map.fuse_neighbors_resolve(slot, fdisp, host["fuse"])
                self.map.cull_points_resolve(host["cull"])
                self.map.cull_keyframes(slot)
                self.map.refresh_landmarks(slot)
                finish()

            self._fetcher.submit(fetch, cont_maint)
        else:
            finish()

    def _finish_frame(self, feats, Tcw, gray, depth, timestamp):
        if self.debug_dir is not None:
            self._dump_debug(feats, gray)
        self.last_feats = feats
        self.last_Tcw = Tcw
        self.prev_gray = gray
        self.prev_depth = depth
        self.timestamps.append(timestamp)
        # Keep the pose on device: a per-frame host conversion is a tunnel
        # round trip. poses_cw materializes lazily (np.asarray at save time).
        self.poses_cw.append(Tcw)
        self.frame_refs.append(self._ref_epoch())
        return Tcw

    def _extract_with_dynamics(
        self, g, d, seg, has_seg: bool, rgb=None
    ) -> FrameFeatures:
        """The Amos split pipeline: keypoints -> dynamic mask -> descriptors
        (reference GrabImageRGBD, src/Tracking.cc:297-406)."""
        dcfg = self.cfg.dynamics
        kp, pyr, blurred, patches = self.pipeline.detect_keypoints(g)
        # flow sources for the NEXT frame's geometric stage: all detected
        # corners of this frame, pre-suppression
        kp_xy, kp_valid = kp.xy, kp.valid

        suppress = None
        if (
            self.cfg.use_dynamics
            and self.state is TrackingState.OK
            and self.prev_gray is not None
        ) and (
            dcfg.dyn_stride <= 1
            or self.frame_id % dcfg.dyn_stride == 0
            or self._dyn_mask is None
        ):
            dyn = compute_dynamics(
                self.cam,
                self.prev_gray, self.prev_depth, g, d, seg,
                self.last_Tcw, self.velocity,
                self.prev_kp_xy, self.prev_kp_valid,
                self.frame_id,
                epi_outlier_th=dcfg.epipolar_outlier_th,
                mean_rpe_th=dcfg.mean_rpe_th,
                flow3d_th=dcfg.flow3d_th,
                n_clusters=dcfg.n_clusters,
                slic_cell=dcfg.slic_cell,
                slic_iters=dcfg.slic_iters,
                dilate_radius=dcfg.mask_dilate_radius,
                slic_compactness=dcfg.slic_compactness,
                has_seg=has_seg,
                slic_downsample=dcfg.slic_downsample,
                lk_levels=dcfg.lk_levels,
                lk_win=dcfg.lk_win,
                lk_iters=dcfg.lk_iters,
                lk_downsample=dcfg.lk_downsample,
                pnp_hypotheses=dcfg.pnp_hypotheses,
                cur_rgb=rgb,
                gate_state=self._dyn_gates,
            )
            self._dyn_gates = dyn.gate_state
            suppress = dyn.suppress_mask
            self._dyn_mask = dyn.geom_mask
        elif (
            self.cfg.use_dynamics
            and self.state is TrackingState.OK
            and self._dyn_mask is not None
        ):
            # stride frame: reuse the geometric mask, fresh seg on top
            suppress = (
                dilate_mask(seg, dcfg.mask_dilate_radius) | self._dyn_mask
                if has_seg else self._dyn_mask
            )
        elif has_seg:
            suppress = dilate_mask(seg, dcfg.mask_dilate_radius)

        self.prev_kp_xy, self.prev_kp_valid = kp_xy, kp_valid
        return self.pipeline.describe(kp, patches, d, suppress)

    def save_trajectory_tum(self, path: str):
        """Full-frame TUM export with corrections replayed against current
        keyframe poses (reference SaveTrajectoryTUM, src/System.cc:429)."""
        trajectory.save_tum(path, self.timestamps, self.corrected_poses_np())

    def save_trajectory_kitti(self, path: str):
        trajectory.save_kitti(path, self.corrected_poses_np())

    def save_keyframe_trajectory_tum(self, path: str):
        """Keyframe poses only (SaveKeyFrameTrajectoryTUM,
        src/System.cc:484): the meaningful export for monocular runs where
        per-frame scale is arbitrary; keyframe poses carry every loop /
        global-BA correction."""
        self._flush_pending()
        if self.loop is not None:
            self.loop.flush_gba()
        m = self.map
        poses, stamps = [], []
        kf_poses = np.asarray(m.arrays.kf_pose[: m.n_kfs], np.float64)
        for k in range(m.n_kfs):
            if not m.kf_alive[k]:
                continue
            fid = int(m.kf_frame_id[k])
            if 0 <= fid < len(self.timestamps):
                stamps.append(self.timestamps[fid])
                poses.append(kf_poses[k])
        trajectory.save_tum(path, stamps, poses)

    def save_map(self, path: str):
        """Persist the full map (the reference's SaveMap TODO,
        include/System.h:148-151, made trivial by array storage)."""
        from .slam_map.checkpoint import save_map

        save_map(path, self.map)

    def load_map(self, path: str):
        from .slam_map.checkpoint import load_map

        load_map(path, self.map)
        self.ref_kf = max(self.map.n_kfs - 1, 0)
        self._epoch_key = None   # force a fresh track-time ref snapshot

    def activate_localization_mode(self):
        """Track against the existing map without extending it
        (reference System::ActivateLocalizationMode)."""
        self._flush_pending()
        self.localization_only = True

    def deactivate_localization_mode(self):
        self._flush_pending()
        self.localization_only = False

    def reset(self):
        """Drop the map and tracking state (reference System::Reset)."""
        self._flush_pending()
        uid_next = self.map.kf_uid_next
        self.map = SlamMap(self.cfg, self.cam)
        # keep keyframe uids globally unique across resets so frame_refs
        # recorded before the reset never alias new keyframes (they fall
        # back to raw poses in corrected_poses_np)
        self.map.kf_uid_next = uid_next
        self.loop = None
        self.state = TrackingState.NOT_INITIALIZED
        self.last_feats = None
        self.last_Tcw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.ref_kf = 0
        self.last_kf_frame = -999
        self.last_kf_inliers = 0
        self._mono_ref = None
        self._last_pid = None
        self._dyn_gates = None
        self._dyn_mask = None
        self._stats_acc = None
        self._acc_ids = None
        # epochs recorded before the reset stay (old frames reference them
        # by index); the key reset forces a fresh snapshot for new frames
        self._epoch_key = None

    def global_refine(self):
        """Full-map refinement (reference global BA): joint camera+structure
        LM over all keyframes (Optimizer::GlobalBundleAdjustemnt), preceded
        by a pose-graph + structure-only pass that carries gross corrections
        so the joint solve starts near its basin."""
        self._flush_pending()
        from .loop.global_ba import GlobalBundleAdjustment, run_global_refinement

        if self.loop is not None:
            self.loop.flush_gba()
        run_global_refinement(self.map)
        if self.map.n_kfs >= 3:
            GlobalBundleAdjustment(self.map).run()

    def shutdown(self):
        """Resolve pending supervision and drain dispatched device work."""
        self._flush_pending()
        if self.loop is not None:
            self.loop.flush_gba()
        self._reader.stop()
        self._fetcher.stop()
        jax.block_until_ready(self.map.arrays)
        jax.block_until_ready(self.last_Tcw)

    # ------------------------------------------------------------- internals
    def _initialize(self, feats: FrameFeatures) -> jax.Array:
        """StereoInitialization (src/Tracking.cc:1343): first frame with
        enough depth-valid keypoints becomes KF 0 + initial landmarks."""
        n_depth = int(jnp.sum(feats.valid & (feats.depth > 0)))
        if n_depth < 100:
            self.stats.append({"matches": 0, "inliers": 0, "kf": False})
            return jnp.eye(4)
        Tcw = jnp.eye(4)
        kp_point = np.full(self.cfg.orb.max_kpts, -1, np.int64)
        self.ref_kf = self.map.insert_keyframe(feats, Tcw, kp_point, self.frame_id)
        self.last_kf_frame = self.frame_id
        self.last_kf_inliers = n_depth
        self.state = TrackingState.OK
        self._ensure_loop_closer(feats)
        self.loop.on_keyframe(self.ref_kf)
        self.stats.append({"matches": n_depth, "inliers": n_depth, "kf": True})
        return Tcw

    def _initialize_mono(self, feats: FrameFeatures) -> jax.Array:
        """Monocular bootstrapping (MonocularInitialization +
        CreateInitialMapMonocular, src/Tracking.cc:1441/1558): hold a
        reference frame, wide-window match, batched H/F initialization,
        inverse-median-depth scale normalization, two keyframes + landmarks,
        then a local BA polish."""
        from .ops import hamming
        from .solvers.initializer import initialize_two_view
        from .slam_map.map_state import add_points_kernel

        n_kp = int(jnp.sum(feats.valid))
        if getattr(self, "_mono_ref", None) is None:
            if n_kp >= 100:
                self._mono_ref = feats
            self.stats.append({"matches": 0, "inliers": 0, "kf": False})
            return jnp.eye(4)

        ref = self._mono_ref
        if n_kp < 100:
            self._mono_ref = None
            self.stats.append({"matches": 0, "inliers": 0, "kf": False})
            return jnp.eye(4)

        # SearchForInitialization (src/ORBmatcher.cc:515): 100 px window,
        # ratio 0.9, rotation consistency.
        dist = hamming.hamming_matrix(ref.desc, feats.desc)
        wmask = hamming.window_mask(
            ref.xy_un, feats.xy_un, 100.0, ref.valid, feats.valid
        )
        res = hamming.match(
            hamming.apply_mask(dist, wmask), max_dist=50, nn_ratio=0.9,
            mutual=True, angle_q=ref.kp.angle, angle_t=feats.kp.angle,
        )
        n_match = int(jnp.sum(res.valid))
        if n_match < 100:
            self._mono_ref = feats if n_kp >= 100 else None
            self.stats.append({"matches": n_match, "inliers": 0, "kf": False})
            return jnp.eye(4)

        j = jnp.maximum(res.idx, 0)
        init = initialize_two_view(
            self.cam, ref.xy_un, feats.xy_un[j], res.valid,
            jax.random.PRNGKey(self.frame_id),
        )
        if not bool(init.ok):
            self.stats.append({"matches": n_match, "inliers": 0, "kf": False})
            return jnp.eye(4)

        # scale: median scene depth -> 1 (inverse-median-depth, :1558)
        good = np.array(init.point_ok)
        pts = np.array(init.points)
        med = float(np.median(pts[good][:, 2]))
        scale = 1.0 / max(med, 1e-6)
        pts = pts * scale
        T2 = np.array(init.Tcw2)
        T2[:3, 3] *= scale
        T2 = jnp.asarray(T2)

        none = np.full(self.cfg.orb.max_kpts, -1, np.int64)
        kf0 = self.map.insert_keyframe(ref, jnp.eye(4), none, self.frame_id - 1)
        kf1 = self.map.insert_keyframe(feats, T2, none, self.frame_id)

        # landmarks with observations in both keyframes
        N = self.cfg.orb.max_kpts
        n_new = int(good.sum())
        cap = self.map.M - 1 - self.map.n_pts
        n_new = min(n_new, cap)
        sel = np.where(good)[0][:n_new]
        ids = np.full(N, -1, np.int64)
        ids[sel] = self.map.n_pts + np.arange(n_new)
        self.map.n_pts += n_new
        view = pts - 0.0
        d = np.linalg.norm(view, axis=-1)
        normal = view / np.maximum(d, 1e-9)[:, None]
        match_np = np.array(res.idx)
        self.map.arrays = add_points_kernel(
            self.map.arrays,
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(pts.astype(np.float32)),
            ref.desc,
            jnp.asarray(normal.astype(np.float32)),
            jnp.asarray((d / 1.2 ** 7).astype(np.float32)),
            jnp.asarray((d * 1.2).astype(np.float32)),
            jnp.asarray(kf0, jnp.int32),
            jnp.asarray(kf0, jnp.int32),
            jnp.asarray(np.where(ids >= 0, np.arange(N), -1).astype(np.int32)),
            jnp.asarray(kf1, jnp.int32),
            jnp.asarray(np.where(ids >= 0, match_np, -1).astype(np.int32)),
        )
        cids = ids[ids >= 0]
        self.map.pt_alive[cids] = True
        self.map.pt_birth_kf[cids] = kf0
        self.map.pt_obs_count[cids] = 2
        self.map.kf_obs_np[kf0][ids >= 0] = cids
        self.map.kf_obs_np[kf1][match_np[ids >= 0]] = cids
        self.map._update_covisibility(kf1)
        self.map.run_local_ba(kf1)

        self.ref_kf = kf1
        self.last_kf_frame = self.frame_id
        self.last_kf_inliers = n_new
        self.state = TrackingState.OK
        self._ensure_loop_closer(feats)
        self.loop.on_keyframe(kf0)
        self.loop.on_keyframe(kf1)
        self._mono_ref = None
        self.stats.append({"matches": n_match, "inliers": n_new, "kf": True})
        return T2

    def _ensure_loop_closer(self, feats: FrameFeatures):
        if self.loop is not None:
            return
        from .loop.loop_closing import LoopCloser
        if self._vocabulary is None:
            # ship a default vocabulary pretrained on diverse synthetic
            # scenes (amos_slam_tpu/data); train session-locally only if
            # the asset is unavailable
            import os
            default = os.path.join(
                os.path.dirname(__file__), "data", "default_vocab.npz"
            )
            if os.path.exists(default):
                from .loop.vocab_io import load_npz
                self._vocabulary = load_npz(default)
            else:
                from .loop.vocabulary import train_vocabulary
                desc = np.array(feats.desc)[np.array(feats.valid)]
                self._vocabulary = train_vocabulary(desc, k=8, depth=3, iters=5)
        self.loop = LoopCloser(self.cfg, self.cam, self._vocabulary, self.map)

    def _track(self, feats: FrameFeatures) -> jax.Array:
        tcfg = self.cfg.tracking
        T_pred = self.velocity @ self.last_Tcw
        view = self.map.local_view(self.ref_kf)

        # 1) motion-model tracking against the last frame. Monocular frames
        # carry no depth, so the temporal-point motion model does not apply
        # (the reference builds those points from RGBD/stereo depth in
        # UpdateLastFrame); mono goes straight to map tracking from the
        # velocity prediction.
        if self.cfg.sensor == "mono":
            n_mm = 0
            T0 = T_pred
            map_radius = tcfg.match_radius_map * 4.0
        else:
            mm = track_motion_model(
                self.cam, feats, self.last_feats, self.last_Tcw, T_pred,
                jnp.asarray(tcfg.match_radius_motion),
            )
            n_mm = int(mm.num_inliers)
            # Motion-model failure means the constant-velocity prediction is
            # wrong -- fall back to the LAST pose, not the extrapolation
            # (the reference's TrackReferenceKeyFrame starts from mLastFrame's
            # pose for the same reason, src/Tracking.cc:1736).
            T0 = mm.Tcw if n_mm >= 10 else self.last_Tcw
            map_radius = tcfg.match_radius_map * (2.0 if n_mm >= 10 else 6.0)

        # 2) local-map tracking (anchors drift to the map)
        lm = track_local_map(
            self.cam, feats, view, T0, jnp.asarray(map_radius),
        )
        mm_Tcw = T0 if n_mm >= 10 else None
        return self._post_track(feats, n_mm, mm_Tcw, lm, view)

    def _post_track(self, feats, n_mm, mm_Tcw, lm, view, n_lm=None) -> jax.Array:
        """Decision tail shared by the split and fused tracking paths."""
        tcfg = self.cfg.tracking
        if n_lm is None:
            n_lm = int(lm.num_inliers)

        kp_point = None   # fetched lazily: it is a 30 ms host read
        if n_lm >= tcfg.min_inliers_local_map:
            Tcw = lm.Tcw
            self.state = TrackingState.OK
            self._last_pid = lm.kp_point_id   # device array, no read
            self.map.bump_stats(lm.visible_ids, lm.found_ids)
        elif n_mm >= 10 and mm_Tcw is not None:
            Tcw = mm_Tcw
            kp_point = np.full(self.cfg.orb.max_kpts, -1, np.int64)
            self.state = TrackingState.OK
            self._last_pid = lm.kp_point_id   # below-gate matches still seed
                                              # the next mono motion model
        else:
            # LOST: attempt BoW relocalization (Tracking::Relocalization,
            # src/Tracking.cc:2591); otherwise hold the pose.
            reloc = self.loop.relocalize(feats) if self.loop else None
            if reloc is not None and reloc[1] >= 25:
                Tcw = jnp.asarray(reloc[0])
                # re-anchor to the map from the relocalized pose
                lm2 = track_local_map(
                    self.cam, feats, view, Tcw,
                    jnp.asarray(tcfg.match_radius_map * 3.0),
                )
                if int(lm2.num_inliers) >= tcfg.min_inliers_local_map:
                    self.state = TrackingState.OK
                    self.velocity = jnp.eye(4)
                    self._last_pid = lm2.kp_point_id
                    self.stats.append(
                        {"matches": n_mm, "inliers": int(lm2.num_inliers),
                         "kf": False, "reloc": True}
                    )
                    return lm2.Tcw
            self._on_lost()
            self.velocity = jnp.eye(4)
            self._last_pid = None
            self.stats.append({"matches": n_mm, "inliers": 0, "kf": False})
            return self.last_Tcw

        self.velocity = se3.orthonormalize(Tcw @ se3.inv_T(self.last_Tcw))

        # 3) keyframe decision (NeedNewKeyFrame, src/Tracking.cc:2064)
        need_kf = self.state is TrackingState.OK and (
            (self.frame_id - self.last_kf_frame >= 30)
            or (
                self.frame_id - self.last_kf_frame >= 3
                and n_lm < 0.75 * max(self.last_kf_inliers, 1)
            )
            or n_lm < 50
        )
        made_kf = False
        if need_kf and n_lm >= tcfg.min_inliers_local_map and not self.localization_only:
            self._maybe_compact()
            if kp_point is None:
                kp_point = np.array(lm.kp_point_id)
            self.ref_kf = self.map.insert_keyframe(
                feats, Tcw, kp_point, self.frame_id
            )
            self.last_kf_frame = self.frame_id
            self.last_kf_inliers = n_lm
            # triangulation + fusion/culling + loop detection + local BA,
            # with fetches resolved asynchronously (see the helper); a loop
            # closure rebases self.last_Tcw in its continuation
            self._keyframe_maintenance(self.ref_kf)
            made_kf = True

        self.stats.append({"matches": n_mm, "inliers": n_lm, "kf": made_kf})
        return Tcw
