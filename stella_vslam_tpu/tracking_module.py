"""Tracking module: per-frame pose estimation state machine (pipelined).

Reference: src/stella_vslam/tracking_module.{h,cc} — {Initializing, Tracking,
Lost} states (cc:153-167), monocular initialization, 3-tier tracking cascade
(motion-model -> keyframe match -> robust match, frame_tracker.cc), local-map
tracking, keyframe-need decision, motion-model update (cc:401-413), auto
relocalization-on-lost and auto-reset when loss occurs within 5 s of
initialization (cc:26-28, 162-166).

TPU-native pipelining: the whole cascade is ONE device program
(module/tracking_kernels.track_frame). When the previous frame's readback has
already landed, feed_frame() finalizes it FIRST so this dispatch sees the
freshest map; when the readback is still in flight, the current frame is
dispatched AHEAD of it so the device->host round trip overlaps this frame's
device compute (the same tracking-vs-mapping freshness race the reference's
3-thread design has). Association state — positions, validity, and landmark
ids — chains on-device between frames, and the motion-model prediction is
computed on device from the chained poses, so a dispatch needs no host-side
values from the not-yet-finalized previous frame.
"""
from __future__ import annotations

import logging
import threading
import time as _time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.camera.base import Setup
from stella_vslam_tpu.data.frame import Frame
from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark
from stella_vslam_tpu.module.initializer import Initializer
from stella_vslam_tpu.module.keyframe_inserter import KeyframeInserter
from stella_vslam_tpu.module.tracking_kernels import TrackingKernels, make_cam_scalars
from stella_vslam_tpu.ops.optim import ba as ba_mod
from stella_vslam_tpu.util.fetch import fetch_all
from stella_vslam_tpu.util.perf import PERF

_log = logging.getLogger(__name__)

STATE_INITIALIZING = "Initializing"
STATE_TRACKING = "Tracking"
STATE_LOST = "Lost"


@jax.jit
def _rebase_chain(la_pos, la_valid, la_id, tbl_ids, tbl_pos, A_R, A_t,
                  R_last, t_last, R_prev, t_prev):
    """Re-sync the device-chained tracking state with a freshly published
    landmark table WITHOUT draining the dispatch pipeline.

    Landmark side: chained association positions are re-gathered from the
    new table by landmark id; ids absent from the new covisibility-local
    table are INVALIDATED — they were culled, replaced by fusion, or fell
    out of the local window, and carrying their stale positions forward
    degrades every subsequent pose (the host resync drops them the same
    way). Pose side: the chained cam-from-world poses are re-anchored by
    the reference keyframe's own correction A = inv(T_ref_old_cw) @
    T_ref_new_cw, i.e. T_new = T_old @ A — exactly the reference's
    update_last_frame re-anchoring (tracking_module.cc:433) on device."""
    eq = la_id[:, None] == tbl_ids[None, :]  # [N, C]
    found = eq.any(axis=1) & (la_id >= 0)
    row = jnp.argmax(eq, axis=1)
    new_pos = jnp.where(found[:, None], tbl_pos[row], la_pos)
    new_valid = la_valid & found
    new_id = jnp.where(found, la_id, -1)
    R_l = R_last @ A_R
    t_l = R_last @ A_t + t_last
    R_p = R_prev @ A_R
    t_p = R_prev @ A_t + t_prev
    return new_pos, new_valid, new_id, R_l, t_l, R_p, t_p


class _Pending:
    __slots__ = ("frm", "out", "last_frm", "tbl_ids", "host_packed",
                 "fetched", "t_dispatch", "ref_kf_at_dispatch",
                 "ref_pose_at_dispatch", "snap_kf_poses")

    def __init__(self, frm, out, last_frm, tbl_ids, ref_kf_at_dispatch=None,
                 ref_pose_at_dispatch=None, snap_kf_poses=None):
        self.frm = frm
        self.out = out
        self.last_frm = last_frm
        # snapshot of the device-table id layout at DISPATCH time: the table
        # may be refreshed (rows reordered) by the mapper before this frame is
        # finalized, so the observability mask in `out` resolves against this,
        # not the table's current ids (refresh rebinds a new ids array, so
        # holding the reference is a true snapshot)
        self.tbl_ids = tbl_ids
        # gauge anchors at DISPATCH time: the reference keyframe this frame
        # was tracked against and its pose AS THE TRACKER SAW IT (snap pose /
        # creation pose). The finalized rel-pose record is computed against
        # poses from this gauge, so a concurrent correction (loop closure,
        # BA writeback) landing between dispatch and finalize cannot pair a
        # pre-correction frame pose with a post-correction keyframe pose —
        # the reconstruction rel @ live_pose then propagates the correction
        # instead of double-counting it (measured 0.3-0.5 m excursions).
        self.ref_kf_at_dispatch = ref_kf_at_dispatch
        self.ref_pose_at_dispatch = ref_pose_at_dispatch
        self.snap_kf_poses = snap_kf_poses
        self.host_packed = None  # numpy result, set by the fetcher thread
        self.fetched = None  # threading.Event, set when host_packed landed
        self.t_dispatch = _time.monotonic()


class _ResultFetcher:
    """Background materialization of device results, batched.

    The tunneled runtime only flushes/completes queued device work when a
    blocking call forces it, and EVERY blocking fetch costs a ~10-30 ms round
    trip regardless of size. Two levers amortize that: (1) K frames' packed
    outputs are stacked into one device array and fetched with ONE round
    trip; (2) the fetch runs on a worker thread, overlapping the round trip
    with the tracking thread's dispatch of subsequent frames (jax releases
    the GIL while waiting)."""

    def __init__(self, batch_size: int = 8):
        self._pool = None
        self.batch_size = batch_size
        # EMA of submit->landing delay for a fetch batch: the tunnel's
        # effective round-trip latency varies by 5-10x between windows, and
        # the tracker's pipeline bounds scale with it (see
        # _feed_frame_locked) — fixed bounds sized for a good window turn a
        # high-latency window into a per-frame lag-bound stall
        self.latency_ema = 0.04

    def submit_batch(self, ps):
        import threading
        for p in ps:
            p.fetched = threading.Event()
        if self._pool is None:
            import concurrent.futures as _cf
            self._pool = _cf.ThreadPoolExecutor(
                max_workers=3, thread_name_prefix="track-fetch")
        # pad partial batches to ONE fixed stack width: every distinct K
        # would otherwise compile its own stack program, and on the tunneled
        # backend a cold mid-run compile stalls the device pipeline for
        # seconds (a partial flush size can first occur minutes into a run)
        outs = [p.out.packed for p in ps]
        K = self.batch_size
        if len(outs) < K:
            outs = outs + [outs[-1]] * (K - len(outs))
        stacked = jnp.stack(outs)
        try:
            stacked.copy_to_host_async()
        except Exception:
            pass
        self._pool.submit(self._fetch, stacked, list(ps), self,
                          _time.monotonic())

    @staticmethod
    def _fetch(stacked, ps, fetcher, t_submit):
        try:
            rows = np.asarray(stacked)
            lat = _time.monotonic() - t_submit
            fetcher.latency_ema += 0.25 * (lat - fetcher.latency_ema)
            for i, p in enumerate(ps):
                p.host_packed = rows[i]
                p.fetched.set()
        except Exception as e:  # surfaced at finalize
            for p in ps:
                p.host_packed = e
                p.fetched.set()


class TrackingModule:
    def __init__(self, map_db, camera, orb_params, *,
                 enable_auto_relocalization: bool = True,
                 use_fixed_seed: bool = False,
                 num_matches_thr: int = 10,
                 min_num_tracked_lms: int = 20,
                 margin_last_frame_projection: float = 20.0,
                 margin_local_map_projection: float = 5.0,
                 margin_local_map_projection_unstable: float = 20.0,
                 max_num_local_keyfrms: int = 60):
        self.map_db = map_db
        self.camera = camera
        self.orb_params = orb_params
        self.kernels = TrackingKernels(
            camera, orb_params, num_matches_thr=num_matches_thr,
            margin_last=margin_last_frame_projection,
            margin_local=margin_local_map_projection,
            margin_local_unstable=margin_local_map_projection_unstable)
        # reference Tracking.max_num_local_keyfrms (tracking_module.cc:32):
        # caps the covisibility neighborhood whose landmarks are
        # tracking-visible in the device table
        self.max_num_local_keyfrms = max_num_local_keyfrms
        # reference Tracking.enable_auto_relocalization (cc:29): when false,
        # a Lost tracker waits for an external relocalize_by_pose request
        # instead of running the BoW cascade on every frame
        self.enable_auto_relocalization = enable_auto_relocalization
        # external pose-hint relocalization request (reference
        # system.cc:604-624): (pose_cw, candidate keyframe ids), consumed by
        # the next Lost-state frame
        self._pose_hint = None
        self.initializer = Initializer(camera, orb_params, use_fixed_seed=use_fixed_seed)
        self.keyfrm_inserter = KeyframeInserter(camera)
        self.relocalizer = None  # wired by system
        self.mapper = None
        self.num_matches_thr = num_matches_thr
        self.min_num_tracked_lms = min_num_tracked_lms

        self.state = STATE_INITIALIZING
        self.last_frm: Optional[Frame] = None
        self.ref_keyfrm_id: Optional[int] = None
        self.twist: Optional[np.ndarray] = None
        self.last_keyfrm_time = 0.0
        self.init_time = 0.0
        self.last_reloc_frm_id = -10
        self.num_relocalizations = 0  # successful BoW relocalizations
        self.num_tracked_lms = 0
        self.mapping_is_enabled = True
        # reference tracking pause protocol (tracking_module.cc:127-130);
        # the caller owns this thread, so paused frames are skipped instead
        # of blocking
        self.pause_is_requested = False

        self._pending = []  # in-flight frames: dispatch runs ahead of
        # finalize so the readback round trip overlaps later frames' compute.
        # Results are fetched in batches of `fetch_batch` frames (one tunnel
        # round trip per batch); `max_inflight` leaves the oldest frame a few
        # frames of slack past its batch submission so the round trip lands
        # before a forced finalize waits on it.
        # Fetch round trips (~40-50 ms loaded) only pipeline while the
        # dispatch thread keeps running ahead — a blocking wait on the caller
        # thread collapses the pipeline to one round trip per batch. So
        # finalization runs on its OWN thread (_fin_loop), consuming pending
        # frames in order as their batch fetches land; the caller thread
        # blocks only at the `max_inflight` hard memory/lag bound.
        import os
        # swept on-chip: batch 8 gives mean 9.7 ms/frame (4 -> 11.2, 16 ->
        # rare half-second stalls from over-buffering)
        self.fetch_batch = int(os.environ.get("SVT_FETCH_BATCH", "8"))
        # two fetch batches keep the tunnel round trips fully pipelined;
        # anything deeper only grows the device queue the mapper's keyframe
        # event round trips must wait behind (measured: depth 40 pushed the
        # mapper's grouped fetch from ~80 ms to 200-300 ms per event)
        self.max_inflight = int(os.environ.get("SVT_MAX_INFLIGHT", "16"))
        # lag bound in TIME: keyframe decisions happen at finalize, so the
        # oldest in-flight frame caps how stale the map can get. A pure
        # frame-count bound scales badly with FPS (40 frames at 100 FPS is
        # 400 ms of motion — enough to outrun the matching margins on fast
        # sequences; the deterministic mode never loses the same workload).
        self.max_lag_s = float(os.environ.get("SVT_MAX_LAG_S", "0.15"))
        # during a keyframe event the window shrinks so the mapper's grouped
        # fetch is not queued behind a full tracking pipeline — but not all
        # the way down: swept on-chip on the 1180-frame bench, 4 -> 59.2 FPS,
        # 10 -> 60.3, 16 (no shrink) -> 59.7 with the staged (never-blocking)
        # event pipeline
        self.inflight_mapper_busy = int(
            os.environ.get("SVT_INFLIGHT_MAPPER_BUSY", "10"))
        self.batch_linger = 0.010  # s: flush a partial batch after this long
        # (bounds finalize lag for slow real-time feeds, where a batch would
        # otherwise take fetch_batch camera periods to fill)
        self._batch = []  # dispatched frames not yet submitted for fetch
        self._fetcher = _ResultFetcher(self.fetch_batch)
        # RLock so the finalize thread's bookkeeping (which may reset() on
        # loss) and nested finalize_pending() calls re-enter safely;
        # Condition.wait releases recursive holds in full
        self._cond = threading.Condition(threading.RLock())
        self._fin_thread = None
        # synchronous=True finalizes every frame inline on the caller thread
        # (no fin thread): fully deterministic, used by inline_mapping tests
        # and any caller that needs the reference's DETERMINISTIC behavior
        # (type.h:158-171). The async path trades determinism of keyframe
        # cadence for pipelined fetch round trips.
        self.synchronous = False
        self._discard_pending = False
        # keyframe whose insertion host-work is deferred off the tracker
        # lock (_drain_insert); single slot, claimed under the lock
        self._insert_pending = None
        self._insert_busy = False
        # device-chained association + pose state of the last tracked frame
        self._last_assoc_pos = None  # [N,3] device
        self._last_assoc_valid = None  # [N] device
        self._last_assoc_id = None  # [N] i32 device landmark ids
        self._dev_pose = None  # (R_cw, t_cw) device of frame t-1
        self._dev_pose_prev = None  # of frame t-2
        # map-sync state: when the mapper has updated the map (BA moved
        # landmarks/keyframes, culling) since the device chain was built,
        # the chain is re-anchored from the map before the next dispatch
        # (reference update_last_frame, tracking_module.cc:433)
        self._chain_tbl_version = None
        self._chain_anchor = None  # (ref_kf_id, pose_cw) for _try_rebase_chain
        self._last_rel = None  # last frame's rel pose to its ref keyframe
        self._prev_host_pose = None  # host pose of frame t-2
        # reference-keyframe device association arrays
        self._kf_assoc_pos = None
        self._kf_assoc_valid = None
        self._kf_assoc_id = None
        self._kf_for_assoc = None
        # finalized per-frame results: (frame_id, ts, pose_cw|None, ref_kf_id)
        self.finalized = []
        self._warm_threads: list = []  # joined at System.shutdown: a compile
        # thread killed at interpreter exit aborts inside the PJRT client

    # ------------------------------------------------------------------
    def warmup(self, num_slots: int, table_capacity: int = 4096):
        """Pre-trace + compile/load the tracking program in every static-arg
        variant the state machine can dispatch (motion x margin), at the
        table's ONE fixed capacity. The margin-switch variants otherwise
        compile mid-run at the first post-reloc frame — a multi-second stall
        at the worst moment. There is deliberately no capacity-growth
        warming: on the tunneled backend even a background-thread compile
        blocks the device pipeline for its whole duration (measured 12.5 s
        for a speculative next-bucket warm), so the device table never
        changes shape after startup (DeviceLandmarkTable truncates instead)."""
        self._compile_track_variants(num_slots, table_capacity)
        # two-keyframe init BA: background compile overlaps the pre-init
        # frames; at worst the init waits on the in-flight compile (jit
        # dedups concurrent lowerings of one signature)
        th = threading.Thread(
            target=self._compile_init_ba, args=(num_slots,), daemon=True,
            name="warm-init-ba",
        )
        self._warm_threads.append(th)
        th.start()

    def _compile_init_ba(self, num_slots: int):
        try:
            L = self._init_ba_capacity(num_slots)
            D = 2
            prob = ba_mod.BAProblem(
                cam_R=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (2, 1, 1)),
                cam_t=jnp.zeros((2, 3), jnp.float32),
                cam_fixed=jnp.asarray([True, False]),
                cam_valid=jnp.asarray([True, True]),
                lm_pos=jnp.zeros((L, 3), jnp.float32),
                lm_valid=jnp.zeros(L, bool),
                obs_cam=jnp.zeros((L, D), jnp.int32),
                obs_uv=jnp.zeros((L, D, 2), jnp.float32),
                obs_x_right=jnp.full((L, D), -1.0),
                obs_inv_sigma_sq=jnp.ones((L, D), jnp.float32),
                obs_valid=jnp.zeros((L, D), bool),
            )
            res = ba_mod.bundle_adjust(
                prob, make_cam_scalars(self.camera),
                model=self.camera.model.name.lower(),
            )
            jax.block_until_ready(res.cost)
        except Exception:  # pragma: no cover - best-effort prewarm
            pass

    def _compile_track_variants(self, N: int, C: int):
        f32 = lambda *s: jnp.zeros(s, jnp.float32)
        i32 = lambda *s: jnp.zeros(s, jnp.int32)
        u32 = lambda *s: jnp.zeros(s, jnp.uint32)
        bl = lambda *s: jnp.zeros(s, bool)
        eye = jnp.eye(3, dtype=jnp.float32)
        k = self.kernels
        outs = []
        for use_motion in (True, False):
            for margin in (k.margin_local, k.margin_local_unstable):
                outs.append(k.track_frame(
                    f32(N, 2), i32(N), u32(N, 8), bl(N), f32(N), f32(N),
                    u32(N, 8), i32(N), f32(N),
                    f32(N, 3), bl(N), jnp.full(N, -1, jnp.int32),
                    u32(N, 8), f32(N),
                    f32(N, 3), bl(N), jnp.full(N, -1, jnp.int32),
                    f32(C, 8), u32(C, 10),
                    eye, f32(3), eye, f32(3),
                    use_motion=use_motion, margin_local=float(margin),
                ))
        for out in outs:
            jax.block_until_ready(out.R_cw)
        # the chain-rebase program fires at the FIRST table publish (right
        # after init) — compile it now, not mid-run
        reb = _rebase_chain(
            f32(N, 3), bl(N), jnp.full(N, -1, jnp.int32),
            jnp.full(C, -1, jnp.int32), f32(C, 3),
            eye, f32(3), eye, f32(3), eye, f32(3),
        )
        jax.block_until_ready(reb[0])
        # the result-fetcher's fixed-width stack program
        jax.block_until_ready(
            jnp.stack([outs[0].packed] * self.fetch_batch))

    def join_warm_threads(self, timeout: float = 60.0):
        deadline = _time.time() + timeout
        for th in self._warm_threads:
            th.join(max(0.0, deadline - _time.time()))
        self._warm_threads = [t for t in self._warm_threads if t.is_alive()]

    # ------------------------------------------------------------------
    def feed_frame(self, frm: Frame) -> Optional[np.ndarray]:
        """Dispatch tracking for `frm`; returns the pose of the PREVIOUSLY
        finalized frame when pipelining (None during init/loss). Finalized
        per-frame poses accumulate in self.finalized."""
        if self.pause_is_requested:
            self.finalized.append((frm.id, frm.timestamp, None, None, None))
            return None
        if self.state != STATE_TRACKING:
            self.finalize_pending()
        with self._cond:
            return self._feed_frame_locked(frm)

    def _feed_frame_locked(self, frm: Frame) -> Optional[np.ndarray]:
        if self.state != STATE_TRACKING and self._pending:
            # the finalize thread flipped state between the caller's barrier
            # and this lock acquisition: drain the (discard-marked) frames
            # inline so self.finalized stays in frame order
            self._flush_batch()
            while self._pending:
                self._finalize_one()
            self._drain_insert()
        if self.state == STATE_INITIALIZING:
            ok = self._initialize(frm)
            if ok:
                self.state = STATE_TRACKING
                self.init_time = frm.timestamp
                self._set_chain_from_frame(frm)
                self._dev_pose = None
                self._dev_pose_prev = None
            self.last_frm = frm
            self.finalized.append(
                (frm.id, frm.timestamp,
                 frm.pose_cw.copy() if ok else None, frm.ref_keyfrm_id,
                 self._rel_to_ref(frm) if ok else None)
            )
            return frm.pose_cw if ok else None

        if self.state == STATE_LOST:
            ok = self._relocalize(frm)
            self.last_frm = frm
            self.finalized.append(
                (frm.id, frm.timestamp,
                 frm.pose_cw.copy() if ok else None, frm.ref_keyfrm_id,
                 self._rel_to_ref(frm) if ok else None)
            )
            if ok:
                self.state = STATE_TRACKING
                self.last_reloc_frm_id = frm.id
                self.num_relocalizations += 1
                if frm.ref_keyfrm_id is not None:
                    self.ref_keyfrm_id = frm.ref_keyfrm_id
                # re-center the tracking-visible local map on the keyframe we
                # relocalized against (the old center may be far away)
                self.map_db.refresh_device_table(
                    center_kf_id=self.ref_keyfrm_id,
                    max_local_keyframes=self.max_num_local_keyfrms)
                self._set_chain_from_frame(frm)
                self.twist = None
                self._dev_pose = None
                self._dev_pose_prev = None
            return frm.pose_cw if ok else None

        # STATE_TRACKING: dispatch and hand completion to the finalize
        # thread. The finalize thread applies results in dispatch order as
        # each fetch batch lands — the dispatch thread keeps running ahead,
        # which is what keeps the fetch round trips pipelined (a blocking
        # wait here collapses throughput to one round trip per batch). This
        # is the same tracking-vs-mapping freshness race the reference's
        # 3-thread design has (system.cc:207-210), with the state machine
        # decisions lagging by the in-flight depth.
        # ONE snapshot read per feed: the rebase below and the dispatch use
        # the SAME snap, so the chain can never be stamped as synced to a
        # version it was not rebased against (the mapper may publish again
        # between these lines — the next feed picks that up)
        snap = self.map_db.device_table.snap
        if (
            self._pending
            and self._chain_tbl_version is not None
            and snap is not None
            and snap.version != self._chain_tbl_version
        ):
            # The mapper published a new device table (keyframe event: local
            # BA moved landmarks/keyframes, fusion replaced some). The chained
            # device state still references pre-update positions. Fast path:
            # rebase the chain ON DEVICE (_rebase_chain) — re-gather chained
            # landmark positions from the new table by id and re-anchor the
            # chained poses by the reference keyframe's own correction — so
            # the pipeline keeps flowing. Fallback (no usable anchor): drain
            # and let _dispatch's host-side resync re-anchor against
            # finalized poses. Without either, the chain drifts away from
            # the optimized map until tracking is lost (the reference
            # re-reads the map under its mutex every frame,
            # tracking_module.cc:193).
            if not self._try_rebase_chain(snap):
                t0 = _time.monotonic()
                self._flush_batch()
                while self._pending:
                    self._finalize_one()
                self._drain_insert()
                _log.debug("drain bubble frame %d: %.1f ms", frm.id,
                           (_time.monotonic() - t0) * 1e3)
                if self.state != STATE_TRACKING:
                    # drained frames flipped the state (lost/reset)
                    return self._feed_frame_locked(frm)
                snap = self.map_db.device_table.snap
        self._dispatch(frm, snap)
        if self.synchronous:
            self._flush_batch()
            while self._pending:
                self._finalize_one()
            self._drain_insert()
            return self.last_frm.pose_cw if self.last_frm is not None else None
        self._ensure_fin_thread()
        self._cond.notify_all()
        # while the mapper is actively processing a keyframe, its sequential
        # device round trips queue behind every in-flight tracking program —
        # at full depth the mapper crawls (measured 10-30 s/keyframe vs ~1 s
        # uncontended) and the backpressure veto then starves keyframe
        # insertion. Shrinking the pipeline to a few slots costs ~nothing in
        # tracking throughput but bounds the mapper's per-sync wait.
        mapper_busy = (
            self.mapper is not None and not self.synchronous
            and not self.mapper.is_idle()
        )
        max_inflight = self.inflight_mapper_busy if mapper_busy \
            else self.max_inflight
        # latency-adaptive bounds, STRICTLY conservative: a genuinely bad
        # tunnel window (fetch batches landing 120+ ms after submit — good
        # windows run 30-60 ms) turns the fixed 16-frame / 150 ms bounds
        # into a per-frame lag-bound stall (measured: 24 s of feed waits in
        # one run whose median frame was a healthy 5.2 ms). Only then:
        # deepen the pipeline (never while the mapper is busy — a deep
        # tracking queue ahead of the keyframe event's fetch starves the
        # mapper, the queue>=2 backpressure skips local BA and vetoes
        # insertion; measured 31 skips / no loop closure) and stretch the
        # lag bound to 2x latency, capped at 0.3 s. Below the threshold the
        # tuned static bounds apply unchanged — an earlier always-on
        # variant shifted keyframe cadence in GOOD windows and lost
        # tracking at the fast-view-change turn.
        lat = self._fetcher.latency_ema
        max_lag = self.max_lag_s
        if lat > 0.12:
            if not mapper_busy:
                max_inflight = min(32, max_inflight + int(lat / 0.008))
            max_lag = min(0.3, max(self.max_lag_s, 2.0 * lat))
        # The lag bound applies to the frame that was oldest when this feed
        # entered: wait until THAT frame finalizes (bounding its decision
        # staleness), not until the whole backlog clears. Holding the caller
        # while each successively-promoted oldest frame is also stale (they
        # were dispatched within ~30 ms of each other) drained the ENTIRE
        # pipeline to pend=0 once per keyframe event — measured 200-240 ms
        # caller stalls plus an empty-pipeline restart, when the event hiccup
        # that triggered it only delayed one fetch batch ~100 ms.
        _wait_t0 = None
        _wait_why = None
        entry_oldest = self._pending[0] if self._pending else None
        while self.state == STATE_TRACKING and self._pending:
            too_deep = len(self._pending) > max_inflight
            too_stale = (
                self._pending[0] is entry_oldest
                and _time.monotonic() - entry_oldest.t_dispatch
                > max_lag
            )
            if not (too_deep or too_stale):
                break
            if _wait_t0 is None:
                _wait_t0 = _time.monotonic()
                _wait_why = "depth" if too_deep else "lag"
            # memory + staleness bound; fin thread drains. Timed wait + thread
            # re-check so a crashed finalize thread cannot strand the caller.
            # (Tried: flushing the partial fetch batch here instead of letting
            # the fin thread sit out the 10 ms batch linger — it floods the
            # tunnel with tiny padded fetches during keyframe events and two
            # chip runs lost their loop closure to the shifted cadence.)
            self._cond.wait(timeout=1.0)
            self._ensure_fin_thread()
        if _wait_t0 is not None:
            PERF.add(f"feed/wait.{_wait_why}",
                     _time.monotonic() - _wait_t0)
        if _wait_t0 is not None and _log.isEnabledFor(logging.DEBUG):
            dt = (_time.monotonic() - _wait_t0) * 1e3
            if dt > 30:
                _log.debug("feed wait frame %d: %.0f ms (%s, pend=%d, "
                           "mapper_busy=%s)", frm.id, dt, _wait_why,
                           len(self._pending), mapper_busy)
        return self.last_frm.pose_cw if self.last_frm is not None else None

    # ------------------------------------------------------------------
    def _ensure_fin_thread(self):
        if self._fin_thread is None or not self._fin_thread.is_alive():
            self._fin_thread = threading.Thread(
                target=self._fin_loop, daemon=True, name="track-finalize")
            self._fin_thread.start()

    def _fin_loop(self):
        """Finalize pending frames in dispatch order as their batch fetches
        land. Holds the tracker lock only for the bookkeeping itself, never
        while waiting on the tunnel."""
        while True:
            with self._cond:
                while not self._pending:
                    self._cond.wait()
                p = self._pending[0]
                if p.fetched is None:
                    # oldest frame's batch is still accumulating: flush it
                    # once full or stale, else wait for more dispatches
                    age = _time.monotonic() - p.t_dispatch
                    if len(self._batch) >= self.fetch_batch \
                            or age >= self.batch_linger:
                        self._flush_batch()
                    else:
                        self._cond.wait(timeout=self.batch_linger - age)
                        continue
                ev = p.fetched
            ev.wait()
            with self._cond:
                if self._pending and self._pending[0] is p:
                    try:
                        self._finalize_one()
                    except Exception:
                        # surface but never kill the loop: a dead finalize
                        # thread would leave feed_frame's bound-wait stuck
                        import traceback
                        traceback.print_exc()
                        if self._pending and self._pending[0] is p:
                            self._pending.pop(0)
                        self.finalized.append(
                            (p.frm.id, p.frm.timestamp, None,
                             p.frm.ref_keyfrm_id, None))
                    self._cond.notify_all()
            # keyframe insertion host work runs OUTSIDE the tracker lock so
            # concurrent feed_frame calls never wait on it (sequential with
            # the next finalize by construction: same thread)
            self._drain_insert()

    # ------------------------------------------------------------------
    def _dispatch(self, frm: Frame, snap=None):
        last = self.last_frm
        k = self.kernels
        if self._dev_pose is None and last is not None and last.pose_cw is not None:
            self._dev_pose = (
                jnp.asarray(last.pose_cw[:3, :3], dtype=jnp.float32),
                jnp.asarray(last.pose_cw[:3, 3], dtype=jnp.float32),
            )
        if self._dev_pose_prev is None:
            self._dev_pose_prev = self._dev_pose
        use_motion = (
            self.twist is not None or len(self._pending) > 0
        ) and self._last_assoc_pos is not None
        ref_kf = self.map_db.keyframes.get(self.ref_keyfrm_id)
        if ref_kf is None:
            # no reference keyframe: cannot track
            self.state = STATE_LOST
            return
        if snap is None:
            if self.map_db.device_table.snap is None:
                self.map_db.refresh_device_table()
            snap = self.map_db.device_table.snap
        # ONE coherent snapshot: every table tensor this dispatch uses — and
        # the chain-version stamp and rebase anchor below — comes from the
        # snap the caller rebased against (the mapper may publish a newer one
        # concurrently; the next feed picks it up)
        tbl = snap
        if (
            not self._pending
            and self._chain_tbl_version is not None
            and self._chain_tbl_version != tbl.version
            and last is not None and last.pose_cw is not None
        ):
            # the mapper updated the map since the chain was built (keyframe
            # event: BA moved landmarks/keyframes, culling/fusion replaced
            # some). Re-anchor the last frame to its possibly-moved reference
            # keyframe and rebuild the chained association positions from the
            # post-BA map (reference update_last_frame, tracking_module.cc:433)
            self._resync_chain_with_map(last)
        self._chain_tbl_version = tbl.version
        # anchor for the on-device rebase at the next table publish: the
        # reference keyframe's pose AS OF this snap's publish — the pose the
        # chained coordinates are consistent with. Reading the live keyframe
        # pose here would race the mapper (pose writeback and table publish
        # are separate lock acquisitions: a dispatch between them would pair
        # the post-BA pose with the pre-BA table, and the next rebase would
        # then move landmarks without re-anchoring the poses).
        anchor_pose = tbl.kf_poses.get(self.ref_keyfrm_id)
        if anchor_pose is None:
            # keyframe created after this publish: its CREATION pose is by
            # construction expressed in this snap's coordinates (the frame it
            # was built from tracked against this table), so it is the
            # correct rebase origin even when a BA writeback has already
            # moved the live pose — the common case, since the writeback
            # bumps the pose before publishing the new table and dispatches
            # land inside that window on almost every keyframe event
            # (measured: 49 drain bubbles of 60-170 ms per bench run when
            # this fell back to the drain path instead).
            anchor_pose = ref_kf._pose_at_creation
        self._chain_anchor = (self.ref_keyfrm_id, anchor_pose)
        if self._kf_for_assoc is not ref_kf:
            self._refresh_kf_assoc(ref_kf)
        margin = (
            k.margin_local_unstable
            if frm.id < self.last_reloc_frm_id + 2
            else k.margin_local
        )
        n = frm.num_slots
        la_pos = (
            self._last_assoc_pos if self._last_assoc_pos is not None
            else jnp.zeros((n, 3))
        )
        la_valid = (
            self._last_assoc_valid if self._last_assoc_valid is not None
            else jnp.zeros(n, bool)
        )
        la_id = (
            self._last_assoc_id if self._last_assoc_id is not None
            else jnp.full(n, -1, jnp.int32)
        )
        R_last, t_last = self._dev_pose
        R_prev, t_prev = self._dev_pose_prev
        out = k.track_frame(
            frm.undist_xy, frm.feats.level, frm.feats.desc, frm.feats.valid,
            frm.feats.angle, frm.x_right,
            last.feats.desc, last.feats.level, last.feats.angle,
            la_pos, la_valid, la_id,
            ref_kf.feats.desc, ref_kf.feats.angle,
            self._kf_assoc_pos, self._kf_assoc_valid, self._kf_assoc_id,
            # the packed table buffers (TWO uploads per publish, unpacked
            # inside the program); validity is covisibility-local rows only —
            # the reference's local map is the covisibility neighborhood,
            # NOT the whole map (local_map_updater.cc)
            tbl.tbl_f32, tbl.tbl_u32,
            R_last, t_last, R_prev, t_prev,
            use_motion=use_motion, margin_local=float(margin),
        )
        p = _Pending(frm, out, last, tbl.ids,
                     ref_kf_at_dispatch=self.ref_keyfrm_id,
                     ref_pose_at_dispatch=anchor_pose,
                     snap_kf_poses=tbl.kf_poses)
        self._pending.append(p)
        self._batch.append(p)
        if len(self._batch) >= self.fetch_batch:
            self._flush_batch()
        # chain device state immediately (used by the NEXT dispatch)
        self._last_assoc_pos = out.assoc_pos
        self._last_assoc_valid = out.assoc_valid
        self._last_assoc_id = out.assoc_id
        self._dev_pose_prev = self._dev_pose
        self._dev_pose = (out.R_cw, out.t_cw)
        self.last_frm = frm

    # ------------------------------------------------------------------
    def _flush_batch(self):
        if self._batch:
            self._fetcher.submit_batch(self._batch)
            self._batch = []

    def finalize_pending(self):
        """Barrier: all dispatched frames are finalized (and any deferred
        keyframe insertion has landed) on return."""
        with self._cond:
            self._flush_batch()
            if self._fin_thread is not None and self._fin_thread.is_alive():
                self._cond.notify_all()
                while (self._pending or self._insert_pending is not None
                       or self._insert_busy):
                    self._cond.wait(timeout=1.0)
                    if self._fin_thread is None \
                            or not self._fin_thread.is_alive():
                        break
            while self._pending:
                self._finalize_one()
            self._drain_insert()

    def _drain_insert(self):
        """Run a deferred keyframe insertion (decided in _finalize_one).
        Called by the finalize thread OUTSIDE the tracker lock, and inline
        by the synchronous drain paths — the slot is CLAIMED under the lock
        so a concurrent inline drain and the finalize thread can never both
        insert the same frame; _insert_busy keeps finalize_pending's
        barrier honest while the insert runs off-lock."""
        with self._cond:
            frm = self._insert_pending
            self._insert_pending = None
            if frm is not None:
                self._insert_busy = True
        if frm is None:
            return
        t0 = _time.monotonic()
        try:
            kf = self.keyfrm_inserter.insert_new_keyframe(self.map_db, frm)
            with self._cond:
                self.ref_keyfrm_id = kf.id
        finally:
            with self._cond:
                self._insert_busy = False
                self._cond.notify_all()
        PERF.add("fin/kf_insert", _time.monotonic() - t0)
        _log.debug("kf insert frame %d: insert %.1f ms (off-lock)",
                   frm.id, (_time.monotonic() - t0) * 1e3)

    def _finalize_one(self):
        if not self._pending:
            return
        p = self._pending.pop(0)
        if self._discard_pending:
            # a preceding frame was lost/reset after this one was dispatched
            self.finalized.append(
                (p.frm.id, p.frm.timestamp, None, p.frm.ref_keyfrm_id, None)
            )
            if not self._pending:
                self._discard_pending = False
            return
        frm, out = p.frm, p.out
        n = frm.num_slots
        if p.fetched is None:
            # not yet submitted for fetch (partial batch forced out early)
            self._flush_batch()
        _tw = _time.monotonic()
        p.fetched.wait()
        _th = _time.monotonic()
        PERF.add("fin/fetch_wait", _th - _tw)
        if isinstance(p.host_packed, Exception):
            raise p.host_packed
        packed = p.host_packed
        pose12 = packed[:12]
        counts = packed[12:16].astype(np.int64)
        base = 16
        lm_ids = packed[base:base + n].astype(np.int64)
        flags = packed[base + n:] > 0.5
        num_final = int(counts[3])
        used_fallback = bool(counts[1])

        min_needed = self.min_num_tracked_lms // (
            2 if frm.id < self.last_reloc_frm_id + 2 else 1
        )
        tracked_ok = num_final >= min_needed
        if used_fallback:
            # the fallback stage itself must have met the match threshold
            tracked_ok = tracked_ok and num_final >= self.num_matches_thr

        if not tracked_ok:
            _log.debug(
                "frame %d lost: stage1=%d fallback=%d candidates=%d "
                "inliers=%d (needed %d)", frm.id, int(counts[0]),
                int(counts[1]), int(counts[2]), num_final, min_needed)
            self._on_lost(frm)
            return

        T = np.eye(4)
        T[:3, :3] = pose12[:9].reshape(3, 3)
        T[:3, 3] = pose12[9:12]
        frm.set_pose_cw(T)
        _t_pose = _time.monotonic()

        # association bookkeeping: landmark ids come straight from the device
        # chain (already deduplicated and inlier-masked on device); forward
        # through fusion replacements that happened since dispatch
        tbl = self.map_db.device_table
        frm.lm_ids[:] = self.map_db.resolve_landmark_ids(lm_ids)
        # replacement-forwarding volume: when a large fraction of this
        # frame's associations were fused into OTHER landmarks since
        # dispatch (the loop-closure correct/fuse window is the only thing
        # that does this at scale), covisibility counts over the forwarded
        # ids attribute the frame to keyframes from the pre-correction
        # gauge while its pose is still in the tracking gauge — anchoring
        # the trajectory record there bends the reconstructed frame by the
        # full seam correction (diag_ate: 0.3-0.5 m excursions). Detect the
        # window and keep this frame's record on its dispatch-time anchor.
        _valid_disp = lm_ids >= 0
        n_forwarded = int(np.sum(_valid_disp & (frm.lm_ids != lm_ids)))
        gauge_hazard = n_forwarded > 0.2 * max(1, int(np.sum(_valid_disp)))
        # replacement-forwarding can fold two distinct dispatch-time ids into
        # ONE surviving landmark; a landmark may appear in at most one slot
        # (landmark.observations records a single idx per keyframe — a
        # duplicate slot would become an orphan association that corrupts
        # covisibility counting when the keyframe inherits it)
        ids = frm.lm_ids
        occupied = np.nonzero(ids >= 0)[0]
        if len(occupied) > 1:
            _, first = np.unique(ids[occupied], return_index=True)
            dup = np.setdiff1d(occupied, occupied[first], assume_unique=True)
            ids[dup] = -1
        inlier = flags[:n]

        PERF.add("fin/h.ids", _time.monotonic() - _t_pose)
        _t_ids = _time.monotonic()
        # observability counters (resolved via the dispatch-time id layout)
        obs_mask = flags[n:]
        tbl.bump_observable(obs_mask, p.tbl_ids)
        tbl.bump_observed(frm.lm_ids)
        PERF.add("fin/h.bump", _time.monotonic() - _t_ids)

        self.num_tracked_lms = num_final
        # twist from the (now finalized) previous frame's pose; unavailable
        # when the previous frame was lost
        prev_pose = p.last_frm.pose_cw if p.last_frm is not None else None
        if prev_pose is not None:
            self.twist = frm.pose_cw @ np.linalg.inv(prev_pose)
        else:
            self.twist = None

        # reference-keyframe re-selection: the keyframe sharing the most
        # landmarks with this frame becomes the reference (the reference's
        # local_map_updater does this every frame, local_map_updater.cc
        # nearest_covisibility -> tracking_module ref_keyfrm_). Without it
        # the ref goes stale on long no-insertion stretches (revisits), and
        # the trajectory reconstruction inherits a long rel lever arm that
        # amplifies any later refinement of the far keyframe (measured:
        # 93-164 mm on return-leg frames anchored 0.4-0.66 map-units away).
        _t_ref = _time.monotonic()
        valid_lms = frm.lm_ids[frm.lm_ids >= 0]
        if len(valid_lms) and not gauge_hazard:
            obs_kfs, obs_cnts = self.map_db.assoc_store.covis_counts(
                valid_lms, -1)
            if len(obs_kfs):
                b = int(np.argmax(obs_cnts))
                cur_cnt = obs_cnts[obs_kfs == self.ref_keyfrm_id]
                if int(obs_kfs[b]) != self.ref_keyfrm_id and (
                        len(cur_cnt) == 0 or obs_cnts[b] > int(cur_cnt[0])):
                    kf_new = self.map_db.keyframes.get(int(obs_kfs[b]))
                    if kf_new is not None and not kf_new.will_be_erased:
                        self.ref_keyfrm_id = int(obs_kfs[b])

        PERF.add("fin/h.refsel", _time.monotonic() - _t_ref)
        # keyframe insertion
        if self.mapping_is_enabled:
            t0 = _time.monotonic()
            ref_kf = self.map_db.keyframes.get(self.ref_keyfrm_id)
            # reliable = tracked landmarks with >= min_num_obs_thr
            # observations (tracking_module.cc:143-144)
            min_obs = 3 if self.map_db.num_keyframes() >= 3 else 2
            # one native bulk-count call instead of a Python dict lookup per
            # tracked landmark (this runs on EVERY finalize)
            counts = self.map_db.assoc_store.num_obs_bulk(frm.lm_ids)
            num_reliable = int((counts >= min_obs).sum())
            t1 = _time.monotonic()
            if self._insert_pending is None and not self._insert_busy and \
                    self.keyfrm_inserter.new_keyframe_is_needed(
                        self.map_db, frm, num_final, self.last_keyfrm_time,
                        ref_kf, num_reliable=num_reliable):
                # the insertion host work (~10 ms: native-store bulk insert,
                # keyframe construction, map registration) runs OFF the
                # tracker lock in _drain_insert — inline it blocked every
                # feed_frame for its duration. last_keyfrm_time advances NOW
                # so the next finalize's decision doesn't double-insert
                # while this one is in flight (the _insert_pending guard
                # covers the same window).
                self._insert_pending = frm
                self.last_keyfrm_time = frm.timestamp
                _log.debug("kf insert frame %d queued: reliable-count "
                           "%.1f ms", frm.id, (t1 - t0) * 1e3)
        if self.mapping_is_enabled:
            PERF.add("fin/h.kfneed", _time.monotonic() - t0)
        frm.ref_keyfrm_id = self.ref_keyfrm_id
        # frame statistics: relative pose to the reference keyframe so the
        # exported trajectory benefits from later keyframe-pose refinement
        # (reference data/frame_statistics + io/trajectory_io.cc:20-60).
        # The anchor pose comes from the DISPATCH gauge (snap kf_poses /
        # creation pose), NOT the live keyframe pose: the frame's pose is a
        # product of tracking against that snapshot, so rel computed in the
        # same gauge stays valid however the keyframe is later refined —
        # rel @ live_pose at export time propagates exactly the refinement
        # since dispatch. Reading the live pose here raced the global-opt
        # thread: a loop correction landing between dispatch and finalize
        # paired a pre-correction frame pose with a post-correction keyframe
        # pose and the reconstruction double-applied the seam correction.
        rel = None
        if gauge_hazard and p.ref_kf_at_dispatch is not None \
                and p.ref_pose_at_dispatch is not None \
                and p.ref_kf_at_dispatch in self.map_db.keyframes:
            frm.ref_keyfrm_id = p.ref_kf_at_dispatch
            rel = frm.pose_cw @ np.linalg.inv(p.ref_pose_at_dispatch)
        else:
            ref_pose = None
            if p.snap_kf_poses is not None:
                ref_pose = p.snap_kf_poses.get(self.ref_keyfrm_id)
            ref = self.map_db.keyframes.get(self.ref_keyfrm_id)
            if ref_pose is None and ref is not None:
                # not in the published table: either created after the
                # publish (creation pose is in the snap gauge by
                # construction — see _dispatch) or outside the local
                # neighborhood (live pose is the only estimate available)
                if p.snap_kf_poses is not None and \
                        ref.id > max(p.snap_kf_poses, default=-1):
                    ref_pose = ref._pose_at_creation
                else:
                    ref_pose = ref.pose_cw
            if ref_pose is not None:
                rel = frm.pose_cw @ np.linalg.inv(ref_pose)
        self.finalized.append(
            (frm.id, frm.timestamp, frm.pose_cw.copy(), frm.ref_keyfrm_id, rel)
        )
        # map-sync state for _resync_chain_with_map
        self._last_rel = rel
        self._prev_host_pose = prev_pose
        PERF.add("fin/host", _time.monotonic() - _th)

    def _on_lost(self, frm: Frame):
        self.finalized.append((frm.id, frm.timestamp, None, frm.ref_keyfrm_id, None))
        self._discard_pending = bool(self._pending)
        if frm.timestamp - self.init_time < 5.0 and self.mapping_is_enabled \
                and self.camera.setup == Setup.MONOCULAR:
            self.reset()
            return
        self.state = STATE_LOST
        self.twist = None
        self._last_assoc_pos = None
        self._last_assoc_valid = None
        self._last_assoc_id = None
        self._dev_pose = None
        self._dev_pose_prev = None
        self._last_rel = None
        self._prev_host_pose = None
        self._chain_anchor = None

    # ------------------------------------------------------------------
    def _try_rebase_chain(self, snap) -> bool:
        """On-device chain rebase at a table publish (see _rebase_chain).
        Returns False when there is no usable anchor (chain/pose state
        missing, or the anchor keyframe was culled) — the caller then falls
        back to the drain + host resync path.

        Pipelining staleness (accepted, by design): frames already in flight
        at the publish were dispatched against the OLD table and finalize
        with poses in pre-publish coordinates; their host poses feed the
        twist, _last_rel, and keyframe decisions one keyframe event stale —
        the same tracking-vs-mapping freshness race the reference's 3-thread
        design has (its tracker may read the map an instant before local BA
        writes it back). Only the DEVICE chain (which seeds future
        dispatches) is re-anchored here."""
        anchor = self._chain_anchor
        if (anchor is None or self._last_assoc_pos is None
                or self._dev_pose is None or self._dev_pose_prev is None):
            _log.debug(
                "rebase miss: anchor=%s assoc=%s pose=%s", anchor is not None,
                self._last_assoc_pos is not None, self._dev_pose is not None)
            return False
        kf_id, old_pose = anchor
        # the anchor keyframe's pose AS OF the new publish (coherent with the
        # landmark rows being gathered) — never the live pose, which may
        # already carry the NEXT writeback
        new_pose = snap.kf_poses.get(kf_id)
        if new_pose is None:  # culled from the map since
            _log.debug("rebase miss: anchor kf %d not in snap v%s", kf_id,
                       snap.version)
            return False
        A = np.linalg.inv(old_pose) @ new_pose
        new_pos, new_valid, new_id, R_l, t_l, R_p, t_p = _rebase_chain(
            self._last_assoc_pos, self._last_assoc_valid,
            self._last_assoc_id, snap.ids_dev, snap.pos,
            jnp.asarray(A[:3, :3], dtype=jnp.float32),
            jnp.asarray(A[:3, 3], dtype=jnp.float32),
            *self._dev_pose, *self._dev_pose_prev,
        )
        self._last_assoc_pos = new_pos
        self._last_assoc_valid = new_valid
        self._last_assoc_id = new_id
        self._dev_pose = (R_l, t_l)
        self._dev_pose_prev = (R_p, t_p)
        # ref-keyframe association positions moved too: force a host rebuild
        # at this dispatch (vectorized via the field store)
        self._kf_for_assoc = None
        return True

    # ------------------------------------------------------------------
    def _resync_chain_with_map(self, last: Frame):
        """Called before a dispatch when the mapper changed the map since the
        device chain was built (only possible with no in-flight frames).
        Re-anchors the last frame pose as rel_pose x ref-keyframe's CURRENT
        pose and re-uploads chained poses so the on-device motion prediction
        (twist o T_last) keeps the pre-update twist applied to the corrected
        base, exactly like the reference's update_last_frame."""
        ref = self.map_db.keyframes.get(last.ref_keyfrm_id)
        if ref is not None and self._last_rel is not None \
                and self._dev_pose is not None:
            T_l_old = last.pose_cw
            T_l_new = self._last_rel @ ref.pose_cw
            if not np.allclose(T_l_new, T_l_old, atol=1e-12):
                # preserve twist: T_prev' = T_p_old o T_l_old^-1 o T_l_new
                T_p_old = self._prev_host_pose
                T_p_new = (
                    T_p_old @ np.linalg.inv(T_l_old) @ T_l_new
                    if T_p_old is not None else T_l_new
                )
                last.set_pose_cw(T_l_new)
                self._prev_host_pose = T_p_new
                self._dev_pose = (
                    jnp.asarray(T_l_new[:3, :3], dtype=jnp.float32),
                    jnp.asarray(T_l_new[:3, 3], dtype=jnp.float32),
                )
                self._dev_pose_prev = (
                    jnp.asarray(T_p_new[:3, :3], dtype=jnp.float32),
                    jnp.asarray(T_p_new[:3, 3], dtype=jnp.float32),
                )
        # rebuild association positions from the post-update map and force a
        # reference-keyframe association refresh (positions moved)
        self._set_chain_from_frame(last)
        self._kf_for_assoc = None

    # ------------------------------------------------------------------
    def _set_chain_from_frame(self, frm: Frame):
        """Build device association state from a frame's host lm_ids (used
        after init / reloc / keyframe-seeded maps)."""
        n = frm.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        ids = np.full(n, -1, np.int32)
        # capture the version BEFORE reading landmark fields: if the mapper
        # publishes mid-build, the chain is stamped older than (some of) its
        # positions and the next dispatch runs a harmless extra rebase —
        # capturing after could stamp NEWER than the positions and skip it
        version = self.map_db.device_table.version
        # forward associations through fusion replacements (the reference's
        # replace_landmarks_in_last_frm, mapping_module.cc:408-415)
        frm.lm_ids[:] = self.map_db.resolve_landmark_ids(frm.lm_ids)
        for i in np.nonzero(frm.lm_ids >= 0)[0]:
            lm = self.map_db.landmarks.get(int(frm.lm_ids[i]))
            if lm is None or lm.will_be_erased:
                continue
            pos[i] = lm.pos_w
            has[i] = True
            ids[i] = lm.id
        self._last_assoc_pos = jnp.asarray(pos)
        self._last_assoc_valid = jnp.asarray(has)
        self._last_assoc_id = jnp.asarray(ids)
        self._chain_tbl_version = version

    def _refresh_kf_assoc(self, kf: Keyframe):
        # vectorized over the association array via the landmark field store
        # (liveness + positions with one fancy index each)
        n = kf.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        ids = np.full(n, -1, np.int32)
        fs = self.map_db.fields
        lm_ids = kf.lm_ids
        occ = lm_ids >= 0
        alive = np.zeros(n, bool)
        alive[occ] = fs.alive[lm_ids[occ]]
        pos[alive] = fs.pos[lm_ids[alive]]
        has[alive] = True
        ids[alive] = lm_ids[alive]
        self._kf_assoc_pos = jnp.asarray(pos)
        self._kf_assoc_valid = jnp.asarray(has)
        self._kf_assoc_id = jnp.asarray(ids)
        self._kf_for_assoc = kf

    # ------------------------------------------------------------------
    def reset(self, clear_map: bool = True):
        # safe from both the caller thread and the finalize thread (RLock);
        # notify wakes any bound-wait in feed_frame / finalize_pending.
        # clear_map=False keeps the existing map and re-enters
        # Initializing: the next initialization founds a NEW submap whose
        # origin becomes an additional spanning root (reference multi-root
        # map_database.h:346-362)
        with self._cond:
            self._reset_locked(clear_map)
            self._cond.notify_all()

    def _reset_locked(self, clear_map: bool = True):
        self._pending = []
        self._batch = []
        self._discard_pending = False
        self._insert_pending = None
        self._insert_busy = False
        self._dev_pose = None
        self._dev_pose_prev = None
        self._chain_tbl_version = None
        self._chain_anchor = None
        self._last_rel = None
        self._prev_host_pose = None
        if clear_map:
            self.map_db.clear()
        self.initializer.reset()
        self.state = STATE_INITIALIZING
        self.last_frm = None
        self.twist = None
        self.ref_keyfrm_id = None
        self._last_assoc_pos = None
        self._last_assoc_valid = None
        self._last_assoc_id = None
        self._kf_for_assoc = None
        if self.mapper is not None:
            self.mapper.cleaner.fresh_landmark_ids = []

    # ------------------------------------------------------------------
    def _initialize(self, frm: Frame) -> bool:
        if self.camera.setup == Setup.MONOCULAR:
            if not self.initializer.try_initialize_monocular(frm):
                return False
            return self._create_map_for_monocular(frm)
        return self._create_map_for_stereo(frm)

    def _create_map_for_monocular(self, cur_frm: Frame) -> bool:
        init = self.initializer
        ref_frm = init.init_frame
        map_db = self.map_db
        # initializing over a non-empty map founds a NEW component: its
        # origin is an additional spanning root, both graphs stay walkable
        # (reference multi-root map_database.h:346-362)
        fresh_map = map_db.num_keyframes() == 0

        ref_frm.set_pose_cw(np.eye(4))
        T = np.eye(4)
        T[:3, :3] = init.R_21
        T[:3, 3] = init.t_21
        cur_frm.set_pose_cw(T)

        ref_kf = Keyframe(ref_frm, map_db)
        map_db.add_keyframe(ref_kf)
        if not fresh_map:
            map_db.add_spanning_root(ref_kf.id)
        cur_kf = Keyframe(cur_frm, map_db)
        map_db.add_keyframe(cur_kf)

        matches = init.init_matches
        pts = init.triangulated_pts
        ok = init.triangulated_ok
        created = 0
        for ref_idx in np.nonzero(ok)[0]:
            cur_idx = matches[ref_idx]
            if cur_idx < 0:
                continue
            lm = Landmark(map_db.next_landmark_id(), pts[ref_idx], cur_kf.id)
            lm.first_keyfrm_id = ref_kf.id
            lm.add_observation(ref_kf.id, int(ref_idx))
            lm.add_observation(cur_kf.id, int(cur_idx))
            ref_kf.add_landmark(lm.id, int(ref_idx))
            cur_kf.add_landmark(lm.id, int(cur_idx))
            cur_frm.add_landmark(lm.id, int(cur_idx))
            map_db.add_landmark(lm)
            lm.compute_descriptor(map_db)
            lm.update_mean_normal_and_obs_scale_variance(map_db)
            created += 1
        if created < 20:
            if fresh_map:
                map_db.clear()
            else:
                # surgical undo: drop only this submap attempt's objects
                for lm_id in [lm_id for lm_id, lm in map_db.landmarks.items()
                              if lm.first_keyfrm_id == ref_kf.id]:
                    map_db.erase_landmark(lm_id)
                map_db.spanning_roots.remove(ref_kf.id)
                map_db.erase_keyframe(cur_kf.id)
                map_db.erase_keyframe(ref_kf.id)
            init.reset()
            return False
        ref_kf.graph_node.update_connections(map_db)
        cur_kf.graph_node.update_connections(map_db)

        self._init_map_ba(ref_kf, cur_kf)
        cur_frm.set_pose_cw(cur_kf.pose_cw)

        self.ref_keyfrm_id = cur_kf.id
        cur_frm.ref_keyfrm_id = cur_kf.id
        self.last_keyfrm_time = cur_frm.timestamp
        if fresh_map:
            map_db.refresh_device_table()
        else:
            # tracking-visible rows = the new submap only (the old
            # component's landmarks live in a different gauge)
            map_db.refresh_device_table(
                center_kf_id=cur_kf.id,
                max_local_keyframes=self.max_num_local_keyfrms)
        if self.mapper is not None:
            self.mapper.async_add_keyframe(ref_kf)
            self.mapper.async_add_keyframe(cur_kf)
        self.twist = None
        return True

    @staticmethod
    def _init_ba_capacity(num_slots: int) -> int:
        """Fixed landmark capacity of the two-keyframe init BA: ONE shape
        per feature budget, so the program is compiled once (and found in
        the persistent cache across runs). A data-dependent pow2 bucket
        recompiled per run — measured 10 s mid-init on a cache miss."""
        return max(64, 1 << int(np.ceil(np.log2(max(num_slots, 2)))))

    def _init_map_ba(self, kf1: Keyframe, kf2: Keyframe):
        map_db = self.map_db
        # only the two init keyframes' landmarks: the database may also
        # carry a previously-loaded map (multi-root submap initialization)
        lm_ids = sorted({int(i) for i in kf1.lm_ids if i >= 0}
                        | {int(i) for i in kf2.lm_ids if i >= 0})
        L = self._init_ba_capacity(kf1.num_slots)
        lm_ids = lm_ids[:L]  # cannot exceed L (<= one landmark per slot)
        D = 2
        inv_sigma = np.asarray(self.orb_params.inv_level_sigma_sq, np.float32)
        cam_R = np.stack([kf1.rot_cw, kf2.rot_cw]).astype(np.float32)
        cam_t = np.stack([kf1.trans_cw, kf2.trans_cw]).astype(np.float32)
        lm_pos = np.zeros((L, 3), np.float32)
        lm_valid = np.zeros(L, bool)
        obs_cam = np.zeros((L, D), np.int32)
        obs_uv = np.zeros((L, D, 2), np.float32)
        obs_w = np.ones((L, D), np.float32)
        obs_valid = np.zeros((L, D), bool)
        slots = {kf1.id: 0, kf2.id: 1}
        kfs = {kf1.id: kf1, kf2.id: kf2}
        for l, lm_id in enumerate(lm_ids):
            lm = map_db.landmarks[lm_id]
            lm_pos[l] = lm.pos_w
            lm_valid[l] = True
            for d, (kf_id, idx) in enumerate(lm.observations.items()):
                if d >= D:
                    break
                kf = kfs[kf_id]
                obs_cam[l, d] = slots[kf_id]
                obs_uv[l, d] = kf.h_undist_xy[idx]
                obs_w[l, d] = inv_sigma[int(kf.h_level[idx])]
                obs_valid[l, d] = True
        prob = ba_mod.BAProblem(
            cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
            cam_fixed=jnp.asarray([True, False]),
            cam_valid=jnp.asarray([True, True]),
            lm_pos=jnp.asarray(lm_pos), lm_valid=jnp.asarray(lm_valid),
            obs_cam=jnp.asarray(obs_cam), obs_uv=jnp.asarray(obs_uv),
            obs_x_right=jnp.full((L, D), -1.0),
            obs_inv_sigma_sq=jnp.asarray(obs_w),
            obs_valid=jnp.asarray(obs_valid),
        )
        res = ba_mod.bundle_adjust(
            prob, make_cam_scalars(self.camera),
            model=self.camera.model.name.lower(),
        )
        camR, camt, lm_new = fetch_all(res.cam_R, res.cam_t, res.lm_pos)
        T = np.eye(4)
        T[:3, :3] = camR[1]
        T[:3, 3] = camt[1]
        kf2.set_pose_cw(T)
        for l, lm_id in enumerate(lm_ids):
            lm = map_db.landmarks.get(lm_id)
            if lm is not None:
                lm.pos_w = lm_new[l].astype(np.float64)
                lm.update_mean_normal_and_obs_scale_variance(map_db)

    def _create_map_for_stereo(self, cur_frm: Frame) -> bool:
        depths = cur_frm.h_depths
        if (depths > 0).sum() < 50:
            return False
        cur_frm.set_pose_cw(np.eye(4))
        fresh_map = self.map_db.num_keyframes() == 0
        kf = Keyframe(cur_frm, self.map_db)
        self.map_db.add_keyframe(kf)
        if not fresh_map:
            # new component founded over a kept map (multi-root)
            self.map_db.add_spanning_root(kf.id)
        self.keyfrm_inserter._seed_depth_landmarks(self.map_db, kf)
        cur_frm.lm_ids[:] = kf.lm_ids
        kf.graph_node.update_connections(self.map_db)
        self.ref_keyfrm_id = kf.id
        cur_frm.ref_keyfrm_id = kf.id
        self.last_keyfrm_time = cur_frm.timestamp
        self.map_db.refresh_device_table()
        if self.mapper is not None:
            self.mapper.async_add_keyframe(kf)
        self.twist = None
        return True

    # ------------------------------------------------------------------
    def _rel_to_ref(self, frm: Frame):
        """Relative pose to the reference keyframe at finalize time, so the
        exported trajectory follows later keyframe refinements (reference
        frame_statistics)."""
        if frm.ref_keyfrm_id is None or frm.pose_cw is None:
            return None
        kf = self.map_db.keyframes.get(frm.ref_keyfrm_id)
        if kf is None or kf.will_be_erased:
            return None
        return frm.pose_cw @ np.linalg.inv(kf.pose_cw)

    def _relocalize(self, frm: Frame) -> bool:
        if self.relocalizer is None:
            return False
        hint, self._pose_hint = self._pose_hint, None
        if hint is not None:
            # pose-hint path (reference system.cc:604-624): seat the frame
            # AT the supplied pose and re-acquire the local map by
            # projection — no BoW. Tried against each nearby keyframe.
            pose_cw, kf_ids = hint
            for kid in kf_ids:
                kf = self.map_db.keyframes.get(kid)
                if kf is None or kf.will_be_erased:
                    continue
                if self.relocalizer.reloc_by_pose_hint(
                        self.map_db, frm, pose_cw, kf):
                    return True
        if hint is None and not self.enable_auto_relocalization:
            return False  # stay Lost until an external request arrives
        return self.relocalizer.relocalize(self.map_db, frm)
