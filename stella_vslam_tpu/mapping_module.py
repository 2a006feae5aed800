"""Mapping module: keyframe consumer building and refining the local map.

Reference: src/stella_vslam/mapping_module.{h,cc} — a dedicated thread that
dequeues keyframes (cc:121-137), stores them (BoW, covisibility, DB —
cc:248-273), culls landmarks, triangulates new ones against the top-N
covisibilities (cc:275-381), fuses duplicates (cc:417-537), runs local BA
(skipping when >= 2 keyframes are queued, cc:199-208), and removes redundant
keyframes.

TPU-native split: geometric work (epipolar matching, triangulation checks,
local BA) runs as device programs (module/mapping_kernels.py, ops/optim/ba.py);
graph bookkeeping stays host-side. After every cycle the device landmark-table
mirror is refreshed so the tracking thread always consumes a recent snapshot.
"""
from __future__ import annotations

import logging
import os
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark
from stella_vslam_tpu.data.map_database import fill_observation_tables
from stella_vslam_tpu.marker.marker import append_marker_rows
from stella_vslam_tpu.match import fuse as fuse_match
from stella_vslam_tpu.module.local_map_cleaner import LocalMapCleaner
from stella_vslam_tpu.module.mapping_kernels import MappingKernels
from stella_vslam_tpu.ops.optim import ba as ba_mod
from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars
from stella_vslam_tpu.util.fetch import fetch_all
from stella_vslam_tpu.util.perf import PERF

_log = logging.getLogger(__name__)


class MappingModule:
    def __init__(self, map_db, camera, orb_params, *,
                 num_covisibilities_for_triangulation: int = 10,
                 queue_threshold: int = 2,
                 ba_K: int = 64, ba_L: int = 8192, ba_D: int = 12,
                 enable_local_ba: bool = True,
                 max_num_local_keyfrms: int = 60,
                 num_covisibilities_for_landmark_fusion: int = 10,
                 baseline_dist_thr_ratio: float = 0.01,
                 baseline_dist_thr: Optional[float] = None,
                 num_temporal_keyframes: int = 15):
        self.map_db = map_db
        self.camera = camera
        self.orb_params = orb_params
        self.kernels = MappingKernels(camera, orb_params)
        self.cleaner = LocalMapCleaner()
        self.num_covis_tri = num_covisibilities_for_triangulation
        self.queue_threshold = queue_threshold
        self.max_num_local_keyfrms = max_num_local_keyfrms
        self.num_covis_fuse = num_covisibilities_for_landmark_fusion
        # mono parallax gate for triangulation neighbors: skip a neighbor
        # when baseline/median_depth < ratio, or baseline < the absolute
        # threshold when one is configured (reference mapping_module.cc:36-46,
        # 286-300; reference ratio default 0.02 — 0.01 here keeps more early
        # neighbors, which the batched triangulator handles at no extra cost)
        self.baseline_dist_thr_ratio = baseline_dist_thr_ratio
        self.baseline_dist_thr = baseline_dist_thr
        self.num_temporal_keyframes = num_temporal_keyframes
        self.ba_K, self.ba_L, self.ba_D = ba_K, ba_L, ba_D
        # local-BA landmark-capacity buckets: small local problems (the
        # common case early in a sequence) run in a small compiled variant —
        # measured on-chip: 254 ms at L=8192 vs ~95 ms at L=2048 for the
        # full 15-iteration schedule. Every bucket is compiled at warmup.
        self.BA_L_BUCKETS = tuple(sorted(
            {min(2048, ba_L), min(4096, ba_L), ba_L}))
        # camera-capacity buckets: early maps have far fewer than ba_K
        # keyframes, and the BA program's [L,D,K] one-hot and [L,K,6,3]
        # Schur tensors scale linearly (S quadratically) with K — a K=16
        # variant runs the same problem in a fraction of the device time,
        # which matters because local-BA device time serializes with the
        # tracker's per-frame programs on one chip (measured on-chip at
        # L=4096, 5+10 iters: K=64 153 ms, K=32 108 ms, K=16/L=2048 59 ms)
        self.BA_K_BUCKETS = tuple(sorted(
            {min(16, ba_K), min(32, ba_K), ba_K}))
        # (K, L) shape pairs compiled at warmup — assembly only picks
        # combinations from this set (anything else would hit a multi-second
        # cold compile mid-run)
        self._ba_shapes = set()
        self.enable_local_ba = enable_local_ba
        # local-BA LM schedule: the reference runs 5 robust + 10 plain
        # iterations (local_bundle_adjuster_g2o.cc:306-348) but terminates on
        # relative gain < 1e-3; on this hardware every extra iteration is
        # ~10 ms of device time the tracker's frames queue behind, and the
        # residual schedule amortizes across events (each event re-optimizes
        # the same neighborhood), so local BA runs a 3+6 schedule — the
        # full 5+10 stays for global/loop BA where there is no next event
        _it = os.environ.get("SVT_BA_ITERS")
        self.ba_iters = tuple(int(x) for x in _it.split(",")) if _it \
            else (3, 6)
        # TPU-first event thinning: one local BA per `ba_stride` keyframe
        # events once the map is mature. The reference's own precedent is
        # skipping local BA under queue backpressure (mapping_module.cc:
        # 199-208); here a skipped keyframe's neighborhood is re-optimized
        # one event later (it is in the next event's covisibility set), at
        # half the device-contention cost. Young maps (< 10 keyframes) and
        # post-correction events always run BA.
        self.ba_stride = int(os.environ.get("SVT_BA_STRIDE", "2"))
        # cap on optimized (non-fixed) local keyframes per local BA; 0 =
        # reference behavior (whole covisibility set up to K-8). Default 10
        # keeps mature-map problems in the K=16 compiled bucket — measured
        # on-chip 12-20 ms vs 34 ms at K=32 for the same 3+6 schedule, and
        # every BA millisecond is device time the tracker's frames and the
        # NEXT keyframe event queue behind; bench ATE is unchanged (27-39 mm
        # across runs either way). See _assemble_local_ba.
        self.ba_local_cap = int(os.environ.get("SVT_BA_LOCAL_CAP", "10"))
        self._events_since_ba = 0

        self._queue: "queue.Queue[Keyframe]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        # staged keyframe event in flight (threaded mode): the event's
        # device work (BoW + triangulation + fuse) is dispatched and its
        # grouped fetch handed to a worker; the run loop applies the results
        # when they land instead of blocking on them. The mapper thread
        # therefore never sits inside a device wait, so the tracker needs no
        # inflight throttle while an event runs (the old blocking event +
        # depth-4 throttle cost 60-350 ms of serialized wait per event).
        self._event = None
        self._event_fetch_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="event-fetch")
        # local BA in flight: dispatched during the keyframe event, fetched +
        # written back on the mapper thread's next idle tick (or at the next
        # keyframe event / pause / terminate, whichever comes first). The
        # ~100-200 ms result round trip overlaps tracking instead of
        # extending the keyframe event's critical path.
        self._pending_ba = None
        # the pending BA's result fetch runs on this worker right after
        # dispatch, so the device->host round trip overlaps the rest of the
        # keyframe event and the tracking pipeline; apply_pending_ba then
        # finds the arrays already landed (measured: 57 ms blocking fetch
        # at the next event's start without it)
        self._ba_fetch_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ba-fetch")
        # True = fetch + apply BA inside the keyframe event (deterministic
        # inline mode); System sets it from inline_mapping.
        self.synchronous_ba = False
        # local-BA accounting for the bench/BASELINE.md certification:
        # wall ms from dispatch to writeback-applied per BA, and the number
        # of backpressure skips (reference is_skipping_localBA)
        self.local_ba_ms = []
        # dispatch -> results-landed latency (device + fetch, before the
        # deliberately deferred writeback): the honest "BA cost" — the wall
        # number above includes the idle-tick deferral that overlaps
        # tracking by design
        self.local_ba_landed_ms = []
        self.num_local_ba_skips = 0
        self.num_local_ba_stride_skips = 0  # deliberate thinning (ba_stride)
        # (keyframe, fresh landmark ids) from the most recent event — fused
        # one keyframe late on the hot path, or at settle (see settle_fresh_fuse)
        self._fresh_fuse = None
        # landmarks whose stats (descriptor/normal/scale range) changed this
        # event: refreshed in ONE consolidated native call at event end, just
        # before the table publish, instead of 3-4 separate calls (insert /
        # triangulation / fuse) that re-touch overlapping sets — on the
        # one-core host every refresh millisecond is stolen from the feed
        # thread. id -> Landmark.
        self._dirty_stats = {}
        self._terminate = threading.Event()
        self._pause_requested = threading.Event()
        self._paused = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        self.global_optimizer = None  # wired by system
        self.bow_db = None  # wired by system
        self.tracker = None
        self.num_processed = 0

    # ------------------------------------------------------------------ API
    def warmup(self, num_slots: int):
        """Pre-trace + compile/load every device program this module can
        dispatch, with the exact shapes the run will use.

        On the tunneled backend a cold program costs seconds even with a
        persistent-cache hit (trace + lower + executable load), and the
        mapper pays it at its FIRST keyframe — exactly when the tracker is
        sprinting ahead and contending for the device. Measured: first
        mapped keyframe 11-13 s cold vs ~0.4 s warm; the cold mapper stays
        queue-full for the whole run, which vetoes keyframe insertion
        (is_skipping_localBA) and starves the map."""
        N, B = num_slots, 5
        f32 = lambda *s: jnp.zeros(s, jnp.float32)
        i32 = lambda *s: jnp.zeros(s, jnp.int32)
        u32 = lambda *s: jnp.zeros(s, jnp.uint32)
        bl = lambda *s: jnp.zeros(s, bool)
        kf_tri = (f32(N, 2), i32(N), u32(N, 8), f32(N, 3), f32(N), f32(N))
        res = self.kernels.triangulate_packed(
            kf_tri, tuple(kf_tri for _ in range(B)),
            np.zeros((B + 1, N, 2), np.float32),
            np.zeros((B + 1, 13), np.float32),
        )
        jax.block_until_ready(res.ok)
        KC, MC = self.FUSE_KF_CHUNK, self.FUSE_LM_CHUNK
        kf_fuse = (f32(N, 2), i32(N), u32(N, 8), bl(N), f32(N))
        out = self.kernels.fuse_packed(
            tuple(kf_fuse for _ in range(KC)),
            np.zeros((KC, 13), np.float32),
            np.zeros((MC, 9), np.float32), u32(MC, 8),
            margin=3.0,
        )
        jax.block_until_ready(out[0])
        D = self.ba_D
        for K in self.BA_K_BUCKETS:
            for L in self.BA_L_BUCKETS:
                if K < self.ba_K and L == self.ba_L and self.ba_L > 4096:
                    # a map small enough for the small-K bucket never needs
                    # the largest landmark bucket — skip that compile
                    continue
                res = ba_mod.bundle_adjust_packed(
                    f32(ba_mod.packed_size(K, L, D)),
                    make_cam_scalars(self.camera),
                    K=K, L=L, D=D, model=self.camera.model.name.lower(),
                    num_first=self.ba_iters[0], num_second=self.ba_iters[1],
                )
                jax.block_until_ready(res.cost)
                if os.environ.get("SVT_BA_CHUNKED", "0") == "1":
                    # one iteration per stage compiles all four stepped
                    # programs (init / robust step / plain step +
                    # reclassify/finalize) for this bucket
                    res = ba_mod.bundle_adjust_packed_stepped(
                        f32(ba_mod.packed_size(K, L, D)),
                        make_cam_scalars(self.camera),
                        K=K, L=L, D=D,
                        model=self.camera.model.name.lower(),
                        num_first=1, num_second=1, pace_s=0.0,
                    )
                    jax.block_until_ready(res.cost)
                self._ba_shapes.add((K, L))
        if self.bow_db is not None:
            # the BoW tree-descent program otherwise compiles at the FIRST
            # keyframe event (measured 520 ms mid-run)
            jax.block_until_ready(self.bow_db.vocab.transform(u32(N, 8)))

    def async_add_keyframe(self, kf: Keyframe):
        self._queue.put(kf)

    def keyframe_is_queued(self) -> bool:
        return not self._queue.empty()

    def is_idle(self) -> bool:
        return self._idle.is_set() and self._queue.empty()

    def is_skipping_localBA(self) -> bool:
        return self._queue.qsize() >= self.queue_threshold

    def is_paused(self) -> bool:
        return self._paused.is_set()

    def pause_is_requested(self) -> bool:
        return self._pause_requested.is_set()

    def request_pause(self):
        self._pause_requested.set()

    def resume(self):
        self._pause_requested.clear()
        self._paused.clear()

    def start(self):
        self._terminate.clear()
        self._thread = threading.Thread(target=self.run, daemon=True)
        self._thread.start()

    def request_terminate(self):
        self._terminate.set()

    def join(self):
        if self._thread is not None:
            self._thread.join(timeout=30)

    # ------------------------------------------------------------------ loop
    def run(self):
        from concurrent.futures import TimeoutError as _FutTimeout

        while not self._terminate.is_set():
            if self._pause_requested.is_set():
                # settle the in-flight event + BA before acknowledging the
                # pause: the loop-closing thread corrects the map right after
                # is_paused flips, and a post-correction apply/writeback
                # would undo it
                self._complete_event()
                self.apply_pending_ba()
                self.settle_fresh_fuse()
                self._paused.set()
                time.sleep(0.005)
                continue
            if self._event is not None:
                # poll the staged event's grouped fetch; the bounded wait
                # keeps pause/terminate responsive without busy-spinning
                fut = self._event["fut"]
                if fut is not None and not fut.done():
                    try:
                        fut.result(timeout=0.005)
                    except _FutTimeout:
                        continue
                    except Exception:
                        pass  # re-raised (and logged) in _finish_event
                self._finish_event()
                continue
            try:
                kf = self._queue.get(timeout=0.005)
            except queue.Empty:
                # idle tick: land the deferred BA writeback (its device
                # round trip overlapped the tracking frames since dispatch)
                self.apply_pending_ba()
                continue
            self._idle.clear()
            try:
                self._event = self._event_start(kf)
            except Exception:
                # contain per-keyframe failures: a dead mapper thread stops
                # ALL future mapping (and starves keyframe insertion)
                _log.exception("keyframe event start failed for kf %d", kf.id)
                self._event = None
            if self._event is None:
                self._event_aftermath(kf)
        # settle before the thread exits
        self._complete_event()
        self.apply_pending_ba()
        self.settle_fresh_fuse()

    def _finish_event(self):
        ev, self._event = self._event, None
        try:
            self._event_finish(ev)
        except Exception:
            _log.exception("keyframe event failed for kf %d", ev["kf"].id)
        finally:
            self._event_aftermath(ev["kf"])

    def _complete_event(self):
        """Drain the staged event synchronously (pause/terminate barrier)."""
        if self._event is not None:
            self._finish_event()

    def _event_aftermath(self, kf: Keyframe):
        if self.global_optimizer is not None:
            self.global_optimizer.queue_keyframe(kf)
        self._idle.set()
        self.num_processed += 1

    # ------------------------------------------------------------------
    def mapping_with_new_keyframe(self, cur: Keyframe):
        """One keyframe event run synchronously (inline/deterministic mode,
        System.feed_* with inline_mapping, and the pause/terminate drain).
        The threaded run loop instead stages _event_start/_event_finish so
        the grouped result fetch overlaps queue polling and the tracking
        pipeline."""
        self._event_finish(self._event_start(cur))

    def _event_start(self, cur: Keyframe):
        """Phase 1 of the keyframe event (reference mapping_module.cc:148-243,
        re-staged for the tunneled device): settle the previous BA, cull
        invalid landmarks, then dispatch ALL of the event's device work up
        front — BoW transform + triangulation + BOTH fuse directions — and
        hand the grouped result fetch to a worker thread. The fuse candidates
        are collected before the triangulation results land, so freshly
        triangulated landmarks are fused one keyframe late (they are in the
        next keyframe's covisibility targets; the reference fuses them
        immediately, mapping_module.cc:417-443)."""
        map_db = self.map_db
        self.apply_pending_ba()  # settle the previous keyframe's BA first
        # the previous event's fresh landmarks are covered by THIS event's
        # direction-2 fuse (prev keyframe is a top covisibility target)
        self._fresh_fuse = None
        t0 = time.monotonic()
        # store: BoW for place recognition (mapping_module.cc
        # store_new_keyframe). Only the DISPATCH happens here.
        bow_dev = None
        if self.bow_db is not None and cur.id not in self.bow_db.bow_vecs:
            bow_dev = self.bow_db.vocab.transform(jnp.asarray(cur.feats.desc))
        # the new keyframe's landmark observations changed at insert
        # (reference keyframe::update_landmarks refreshes their stats at
        # creation, keyframe.cc:430-447); here they join the event's ONE
        # consolidated refresh — this event's own fuse dispatch sees stats
        # one observation stale, every later consumer sees them fresh
        for i in cur.lm_ids[cur.lm_ids >= 0].tolist():
            lm = map_db.landmarks.get(i)
            if lm is not None:
                self._dirty_stats[i] = lm
        self.cleaner.remove_invalid_landmarks(map_db, cur.id)
        t1 = time.monotonic()
        tri = self._dispatch_triangulation(cur)
        fuse_chunks = self._collect_fuse_chunks(cur)
        t2 = time.monotonic()
        handles = []
        if tri is not None:
            res, _ = tri
            handles += [res.ok, res.pos_w, res.idx2]
        if bow_dev is not None:
            handles.append(bow_dev)
        handles += [c[4] for c in fuse_chunks]
        handles += [c[5] for c in fuse_chunks]
        fut = self._event_fetch_pool.submit(fetch_all, *handles) \
            if handles else None
        return {"kf": cur, "fut": fut, "tri": tri,
                "has_bow": bow_dev is not None, "fuse_chunks": fuse_chunks,
                "t": (t0, t1, t2)}

    def _event_finish(self, ev):
        """Phase 2 of the keyframe event: land the grouped fetch, apply
        triangulation/BoW/fuse results, refresh the covisibility graph,
        dispatch local BA (writeback deferred to apply_pending_ba), cull
        redundant keyframes, and publish the device landmark table ONCE
        (each publish costs the tracker a pipeline drain bubble, ~50-65 ms
        measured; when BA is in flight the publish rides its writeback)."""
        cur: Keyframe = ev["kf"]
        map_db = self.map_db
        tri, fuse_chunks = ev["tri"], ev["fuse_chunks"]
        _t = list(ev["t"])
        _mark = lambda: _t.append(time.monotonic())
        fetched = list(ev["fut"].result()) if ev["fut"] is not None else []
        _mark()
        _sub = [time.monotonic()]
        if tri is not None:
            ok_all, pos_all, idx2_all = fetched[0], fetched[1], fetched[2]
            fetched = fetched[3:]
            self._apply_triangulation(cur, tri[1], ok_all, pos_all, idx2_all)
        _sub.append(time.monotonic())
        if ev["has_bow"]:
            _, bow_vec = self.bow_db.vocab.words_to_bow(fetched[0], cur.h_valid)
            self.bow_db.add_keyframe(cur.id, bow_vec)
            fetched = fetched[1:]
        _sub.append(time.monotonic())
        if fuse_chunks:
            n = len(fuse_chunks)
            touched = []
            with map_db.lock:
                for ci, (lms, kf_chunk, m0, msz, _, _) in enumerate(fuse_chunks):
                    self._apply_fuse_chunk(
                        map_db, kf_chunk, lms, m0, msz, fetched[ci],
                        fetched[n + ci], touched,
                    )
                # stats ride the event's consolidated refresh below
                self._dirty_stats.update((lm.id, lm) for lm in touched)
        _sub.append(time.monotonic())
        _log.debug(
            "kf %d apply: tri=%.0f bow=%.0f fuse=%.0f", cur.id,
            *[(_sub[i + 1] - _sub[i]) * 1e3 for i in range(3)])
        _mark()
        cur.graph_node.update_connections(map_db)
        published = False
        if self.enable_local_ba and map_db.num_keyframes() > 2:
            self._events_since_ba += 1
            if self.is_skipping_localBA():
                # backpressure skip (reference mapping_module.cc:199-208);
                # counted so the bench can certify "no sustained local-BA
                # skip" (BASELINE.md local-BA latency requirement)
                self.num_local_ba_skips += 1
            elif (self._events_since_ba < self.ba_stride
                  and map_db.num_keyframes() >= 10
                  and not self.synchronous_ba):
                # stride thinning (see __init__): this keyframe's
                # neighborhood is re-optimized at the next event
                self.num_local_ba_stride_skips += 1
            else:
                self._events_since_ba = 0
                self._dispatch_local_ba(cur)
                if self.synchronous_ba:
                    # the inline writeback already publishes the table —
                    # don't publish a second time at the end of this event
                    published = self.apply_pending_ba()
        _mark()
        self.remove_temporal_keyframes(cur)
        self.cleaner.remove_redundant_keyframes(map_db, cur)
        self._flush_dirty_stats()
        _mark()
        if self._pending_ba is None and not published:
            # tracking-visible rows = covisibility-local map around the
            # newest keyframe (reference local_map_updater neighborhood);
            # when BA is in flight the publish rides with its writeback
            map_db.refresh_device_table(
                center_kf_id=cur.id,
                max_local_keyframes=self.max_num_local_keyfrms)
        _mark()
        segs = [(_t[i + 1] - _t[i]) for i in range(7)]
        for name, dt in zip(
                ("cull", "disp", "fetch", "apply", "ba", "redu", "tbl"), segs):
            PERF.add(f"map/event.{name}", dt)
        PERF.add("map/event.total", _t[-1] - _t[0])
        _log.debug(
            "kf %d mapped in %.0f ms: cull=%.0f disp=%.0f fetch=%.0f "
            "apply=%.0f ba=%.0f redu=%.0f tbl=%.0f", cur.id,
            (_t[-1] - _t[0]) * 1e3, *[s * 1e3 for s in segs])

    # ------------------------------------------------------------------
    def _flush_dirty_stats(self):
        """One consolidated landmark-stats refresh for everything this event
        touched (insert-time observation adds, fresh triangulations, fuse
        adds/replaces) — runs just before the event's table publish so every
        published row carries fresh normals/ranges/descriptors."""
        if not self._dirty_stats:
            return
        dirty, self._dirty_stats = self._dirty_stats, {}
        with self.map_db.lock:
            # identity check guards against a reset/clear between the
            # registration and this flush (stale ids would index a
            # re-initialized field store out of bounds)
            lms = [lm for lm in dirty.values()
                   if self.map_db.landmarks.get(lm.id) is lm]
            self.map_db.batch_refresh_landmark_stats(
                lms, self.orb_params.scale_factors)

    # ------------------------------------------------------------------
    def remove_temporal_keyframes(self, cur: Keyframe,
                                  max_ephemeral_keyframes: Optional[int] = None):
        """Temporal mapping: when a fixed-keyframe threshold is set (map was
        pre-loaded with enable_temporal_mapping), newly created keyframes are
        ephemeral — keep only the most recent ones
        (reference mapping_module.cc:210-237 queue-based eviction)."""
        map_db = self.map_db
        if max_ephemeral_keyframes is None:
            max_ephemeral_keyframes = self.num_temporal_keyframes
        thr = map_db.fixed_keyframe_id_threshold
        if thr < 0:
            return
        ephemeral = sorted(
            k for k in map_db.keyframes
            if k > thr and k != cur.id and not map_db.keyframes[k].will_be_erased
        )
        for k in ephemeral[:-max_ephemeral_keyframes] if len(ephemeral) > max_ephemeral_keyframes else []:
            kf = map_db.keyframes.get(k)
            if kf is not None and kf.can_be_erased():
                map_db.erase_keyframe(k)

    # ------------------------------------------------------------------
    def _dispatch_triangulation(self, cur: Keyframe):
        """Dispatch triangulation vs top-N covisibilities
        (mapping_module.cc:275-341); returns (device result, neighbors) or
        None. The caller fetches grouped with the other keyframe-event
        round trips and applies via _apply_triangulation."""
        map_db = self.map_db
        covis = cur.graph_node.get_top_n_covisibilities(self.num_covis_tri)
        if not covis:
            return None
        median_depth = cur.compute_median_depth(map_db, use_abs=True)
        # eligible neighbors after the baseline check (mapping_module.cc:286-300)
        neighbors = []
        for other_id in covis:
            other = map_db.keyframes.get(other_id)
            if other is None or other.will_be_erased:
                continue
            baseline = np.linalg.norm(cur.cam_center - other.cam_center)
            if self.camera.setup.name == "MONOCULAR":
                if self.baseline_dist_thr is not None:
                    if baseline < self.baseline_dist_thr:
                        continue
                elif (median_depth > 0
                      and baseline / median_depth < self.baseline_dist_thr_ratio):
                    continue
            else:
                if baseline < self.camera.true_baseline:
                    continue
            neighbors.append(other)
        if not neighbors:
            return None
        B = 5
        neighbors = neighbors[:B]
        padded = neighbors + [neighbors[0]] * (B - len(neighbors))
        # device-resident per-keyframe tensors ride as pytree leaves; ALL
        # host-side operands (unassoc/stereo masks, poses, pair validity)
        # cross in TWO packed buffers instead of ~24 small uploads — each
        # upload is a per-op tunnel round trip the event serializes on
        kf_dev = lambda o: (
            o.undist_xy, o.feats.level, o.feats.desc, o.bearings,
            o.feats.angle, o.x_right,
        )
        N = cur.num_slots
        masks = np.zeros((B + 1, N, 2), np.float32)
        pose_pack = np.zeros((B + 1, 13), np.float32)
        for i, kf in enumerate([cur] + padded):
            masks[i, :, 0] = (kf.lm_ids < 0) & kf.h_valid
            masks[i, :, 1] = kf.h_x_right > 0
            pose_pack[i, :9] = kf.rot_cw.reshape(9)
            pose_pack[i, 9:12] = kf.trans_cw
        pose_pack[1:1 + len(neighbors), 12] = 1.0
        res = self.kernels.triangulate_packed(
            kf_dev(cur), tuple(kf_dev(o) for o in padded), masks, pose_pack,
        )
        return res, neighbors

    def _apply_triangulation(self, cur: Keyframe, neighbors,
                             ok_all, pos_all, idx2_all):
        """Per-neighbor batch creation: slot-claim filtering and field-store
        registration are vectorized; only the observation bookkeeping is a
        (tight) per-landmark loop. Sequential over neighbors so later
        neighbors see earlier claims, matching the reference's ordering."""
        map_db = self.map_db
        new_lms = []
        with map_db.lock:
            for b, other in enumerate(neighbors):
                ok = ok_all[b]
                if not ok.any():
                    continue
                idx2 = idx2_all[b]
                sel = ok & (cur.lm_ids < 0)
                sel &= other.lm_ids[np.clip(idx2, 0, other.num_slots - 1)] < 0
                idxs = np.nonzero(sel)[0]
                if len(idxs) == 0:
                    continue
                # two cur slots can match the same neighbor slot: keep first
                _, first = np.unique(idx2[idxs], return_index=True)
                idxs = idxs[np.sort(first)]
                oidx = idx2[idxs]
                ids = map_db.alloc_landmark_ids(len(idxs))
                lms = map_db.bulk_add_landmarks(ids, pos_all[b][idxs], cur.id)
                cur.lm_ids[idxs] = ids
                other.lm_ids[oidx] = ids
                # native bulk insert (one ctypes call), then the Python-dict
                # mirrors as plain literals (the landmarks are brand new)
                map_db.assoc_store.add_bulk(
                    np.repeat(ids, 2),
                    np.tile(np.array([cur.id, other.id], np.int64), len(ids)),
                    np.stack([idxs, oidx], axis=1).ravel(),
                )
                cid, oid = cur.id, other.id
                for lm, fi, oi in zip(lms, idxs.tolist(), oidx.tolist()):
                    lm.observations = {cid: fi, oid: oi}
                self.cleaner.fresh_landmark_ids.extend(ids.tolist())
                new_lms.extend(lms)
            # stats ride the event's consolidated refresh (_flush_dirty_stats)
            self._dirty_stats.update((lm.id, lm) for lm in new_lms)
        if new_lms:
            self._fresh_fuse = (cur, [lm.id for lm in new_lms])

    def settle_fresh_fuse(self):
        """Fuse the most recent event's freshly triangulated landmarks into
        that keyframe's covisibility targets. On the hot path this fusion
        rides one keyframe late with the next event's direction-2 fuse; at a
        pause/terminate there is no next event, so without this the last
        event's landmarks would never be fused and duplicates could persist
        into loop correction or saved maps (reference fuses immediately,
        mapping_module.cc:417-443)."""
        pend, self._fresh_fuse = self._fresh_fuse, None
        if pend is None:
            return
        cur, lm_ids = pend
        map_db = self.map_db
        targets = cur.graph_node.get_top_n_covisibilities(10)
        tgt_kfs = [
            map_db.keyframes[t] for t in targets if t in map_db.keyframes
        ]
        live = map_db.fields.live(np.asarray(lm_ids, np.int64))
        if tgt_kfs and len(live):
            self._fuse_into(map_db, tgt_kfs, live)

    # ------------------------------------------------------------------
    def _collect_fuse_chunks(self, cur: Keyframe):
        """Dispatch BOTH fuse directions — current keyframe's landmarks into
        first/second-order covisibilities and vice versa
        (mapping_module.cc:417-537) — and return the chunk records for a
        caller-grouped fetch. Direction 2's candidate set is collected
        before direction 1 is applied — any landmark direction 1 replaces
        is skipped at apply time by its liveness check, so the result
        matches the reference's sequential order. All id collection is
        vectorized over the keyframe association arrays + field store."""
        map_db = self.map_db
        targets = cur.graph_node.get_top_n_covisibilities(self.num_covis_fuse)
        seconds = []
        for t in targets:
            kf = map_db.keyframes.get(t)
            if kf:
                seconds.extend(kf.graph_node.get_top_n_covisibilities(5))
        fuse_targets = [t for t in dict.fromkeys(targets + seconds) if t != cur.id]
        tgt_kfs = [
            map_db.keyframes[t] for t in fuse_targets if t in map_db.keyframes
        ]

        # direction 1: current landmarks -> each target keyframe
        cur_ids = map_db.fields.live(cur.lm_ids[cur.lm_ids >= 0])
        # direction 2: target landmarks -> current keyframe
        tgt_ids = np.zeros(0, np.int64)
        if tgt_kfs:
            cat = np.concatenate([kf.lm_ids for kf in tgt_kfs])
            tgt_ids = map_db.fields.live(np.unique(cat[cat >= 0]))

        chunks1 = self._dispatch_fuse(tgt_kfs, cur_ids) if len(cur_ids) else []
        chunks2 = self._dispatch_fuse([cur], tgt_ids) if len(tgt_ids) else []
        return chunks1 + chunks2

    # fixed fuse program shape: every dispatch is exactly (KF_CHUNK keyframes
    # x LM_CHUNK landmarks). Shape buckets looked cheaper per dispatch but
    # every new (Bpad, Mpad) combination triggered a multi-second cold
    # program load mid-run; chunks of one fixed shape compile exactly once.
    # 16x2048 measured 4.4 ms/dispatch on-chip vs 3.1 ms at 8x1024 — a
    # typical keyframe event needs 4 dispatches instead of 12.
    FUSE_KF_CHUNK = 16
    FUSE_LM_CHUNK = 2048

    def _dispatch_fuse(self, keyframes, lm_ids: np.ndarray,
                       margin: float = 3.0):
        """Dispatch the fuse programs for (keyframes x lm_ids); returns a
        list of chunk records (lm_ids, kf_chunk, m0, msz, best_dev,
        acc_dev) whose device arrays the caller fetches (grouped with other
        round trips) and applies via _apply_fuse_chunk. Landmark fields come
        from the field store with one fancy index per field."""
        lm_ids = np.asarray(lm_ids, np.int64)
        if len(lm_ids) == 0:
            return []
        keyframes = [
            kf for kf in keyframes if kf is not None and not kf.will_be_erased
        ]
        if not keyframes:
            return []
        KC, MC = self.FUSE_KF_CHUNK, self.FUSE_LM_CHUNK
        fs = self.map_db.fields
        # all host-side landmark fields packed into ONE f32 buffer + the u32
        # descriptors (2 uploads per chunk; the per-field form cost 6) —
        # each upload is a per-op tunnel round trip that the keyframe event
        # serializes on
        M = len(lm_ids)
        lm_pack_all = np.zeros((M, 9), np.float32)
        lm_pack_all[:, 0:3] = fs.pos[lm_ids]
        lm_pack_all[:, 3] = fs.dmin[lm_ids]
        lm_pack_all[:, 4] = fs.dmax[lm_ids]
        lm_pack_all[:, 5:8] = fs.normal[lm_ids]
        lm_pack_all[:, 8] = 1.0
        lm_desc = fs.desc[lm_ids]
        kf_dev = lambda kf: (
            kf.undist_xy, kf.feats.level, kf.feats.desc, kf.feats.valid,
            kf.x_right,
        )
        chunks = []
        for k0 in range(0, len(keyframes), KC):
            kf_chunk = keyframes[k0:k0 + KC]
            padded_kfs = kf_chunk + [kf_chunk[0]] * (KC - len(kf_chunk))
            kfs_dev = tuple(kf_dev(kf) for kf in padded_kfs)
            # host-side per-keyframe poses + batch mask: ONE upload
            kf_pack = np.zeros((KC, 13), np.float32)
            for i, kf in enumerate(padded_kfs):
                kf_pack[i, :9] = kf.rot_cw.reshape(9)
                kf_pack[i, 9:12] = kf.trans_cw
            kf_pack[: len(kf_chunk), 12] = 1.0
            for m0 in range(0, M, MC):
                msz = min(MC, M - m0)
                lm_pack = lm_pack_all[m0:m0 + MC]
                ld = lm_desc[m0:m0 + MC]
                if msz < MC:
                    lm_pack = np.concatenate(
                        [lm_pack, np.zeros((MC - msz, 9), np.float32)])
                    ld = np.concatenate(
                        [ld, np.zeros((MC - msz, 8), ld.dtype)])
                best, acc = self.kernels.fuse_packed(
                    kfs_dev, kf_pack, lm_pack, ld, margin=margin,
                )
                chunks.append((lm_ids, kf_chunk, m0, msz, best, acc))
        return chunks

    def _fuse_into(self, map_db, keyframes, lm_ids, margin: float = 3.0):
        """Dispatch + fetch + apply in one call (used by the loop-closing
        thread; the mapper's keyframe path groups fetches across both fuse
        directions instead)."""
        chunks = self._dispatch_fuse(keyframes, lm_ids, margin=margin)
        if not chunks:
            return
        fetched = fetch_all(*[c[4] for c in chunks], *[c[5] for c in chunks])
        touched = []
        with map_db.lock:
            for ci, (ids, kf_chunk, m0, msz, _, _) in enumerate(chunks):
                self._apply_fuse_chunk(
                    map_db, kf_chunk, ids, m0, msz, fetched[ci],
                    fetched[len(chunks) + ci], touched,
                )
            map_db.batch_refresh_landmark_stats(
                touched, self.orb_params.scale_factors)

    def _apply_fuse_chunk(self, map_db, keyframes, lm_ids, m0, msz,
                          best_all, acc_all, touched):
        """Accepted matches split vectorized into add-vs-replace groups
        (liveness, slot occupancy, per-keypoint dedup all via numpy); only
        the surviving few run landmark bookkeeping."""
        fs = map_db.fields
        for b, kf in enumerate(keyframes):
            acc = acc_all[b][:msz]
            if not acc.any():
                continue
            rows = np.nonzero(acc)[0]
            cand = np.asarray(lm_ids[m0 + rows], np.int64)
            alive = fs.alive[cand]
            rows, cand = rows[alive], cand[alive]
            if len(rows) == 0:
                continue
            kps = best_all[b][rows].astype(np.int64)
            # the kernel resolves in-dispatch keypoint collisions; dedup any
            # cross-row stragglers keep-first
            _, first = np.unique(kps, return_index=True)
            keep = np.sort(first)
            cand, kps = cand[keep], kps[keep]
            existing = kf.lm_ids[kps]
            addm = existing < 0
            repm = (existing >= 0) & (existing != cand)
            add_lm, add_kp = [], []
            for lm_id, kp in zip(cand[addm].tolist(), kps[addm].tolist()):
                lm = map_db.landmarks.get(lm_id)
                if lm is None or lm.will_be_erased or kf.id in lm.observations:
                    # observed in this keyframe at another slot — adding
                    # would orphan that slot (fuse.cc detect_duplication
                    # is_observed_in_keyframe guard)
                    continue
                lm.observations[kf.id] = kp
                kf.add_landmark(lm_id, kp)
                touched.append(lm)
                add_lm.append(lm_id)
                add_kp.append(kp)
            if add_lm:
                # native store fed with one bulk call per chunk
                map_db.assoc_store.add_bulk(
                    np.asarray(add_lm, np.int64),
                    np.full(len(add_lm), kf.id, np.int64),
                    np.asarray(add_kp, np.int32))
            for lm_id, kp, ex in zip(cand[repm].tolist(), kps[repm].tolist(),
                                     existing[repm].tolist()):
                lm = map_db.landmarks.get(lm_id)
                if lm is None or lm.will_be_erased:
                    continue
                other = map_db.landmarks.get(int(ex))
                if other is None or other.will_be_erased:
                    kf.lm_ids[kp] = -1
                elif other.num_observations() >= lm.num_observations():
                    map_db.replace_landmark(lm, other, refresh=False)
                    touched.append(other)
                else:
                    map_db.replace_landmark(other, lm, refresh=False)
                    touched.append(lm)

    # ------------------------------------------------------------------
    def _dispatch_local_ba(self, cur: Keyframe):
        """Assemble + dispatch local BA; the result is stashed in
        _pending_ba and written back by apply_pending_ba. The reference
        blocks its mapping thread on local BA but aborts it when a new
        keyframe arrives (mapping_module.cc:199-208, force_stop_flag) — here
        the BA device program always runs to completion (it is short:
        gain-terminated LM) and only the WRITEBACK is deferred."""
        t0 = time.monotonic()
        prob, lm_ids, kf_slots, marker_rows, host = self._assemble_local_ba(cur)
        if prob is None:
            return
        t1 = time.monotonic()
        cam = make_cam_scalars(self.camera)
        pack, K, L, D = prob
        buf_dev = jnp.asarray(pack)
        model = self.camera.model.name.lower()
        n1, n2 = self.ba_iters

        # Default: ONE fused full-schedule program — keeps the chip at peak
        # efficiency; the tracker's event-window inflight throttle bounds
        # what queues behind it. SVT_BA_CHUNKED=1 selects the per-iteration
        # stepped dispatch (ba_mod.bundle_adjust_packed_stepped) instead, so
        # tracking programs interleave between LM iterations — it lowers the
        # worst single-frame stall but the BA itself then queues behind the
        # tracker's in-flight programs (wall 300-600 ms vs ~110 fused in a
        # degraded-transfer window; the two strategies were not separable
        # within measurement noise in a healthy window).
        if os.environ.get("SVT_BA_CHUNKED", "0") == "1" \
                and not self.synchronous_ba:
            def _run_stepped():
                res = ba_mod.bundle_adjust_packed_stepped(
                    buf_dev, cam, K=K, L=L, D=D, model=model,
                    num_first=n1, num_second=n2,
                    pace_s=float(os.environ.get("SVT_BA_PACE_MS", "8")) * 1e-3)
                return fetch_all(res.cam_R, res.cam_t, res.lm_pos,
                                 res.obs_is_outlier)
            fut = self._ba_fetch_pool.submit(_run_stepped)
        else:
            res = ba_mod.bundle_adjust_packed(
                buf_dev, cam, K=K, L=L, D=D, model=model,
                num_first=n1, num_second=n2)

            def _fetch_timed():
                out = fetch_all(res.cam_R, res.cam_t, res.lm_pos,
                                res.obs_is_outlier)
                self.local_ba_landed_ms.append(
                    (time.monotonic() - t0) * 1e3)
                return out

            fut = self._ba_fetch_pool.submit(_fetch_timed)
        PERF.add("ba/assemble", t1 - t0)
        PERF.add("ba/dispatch", time.monotonic() - t1)
        _log.debug("kf %d ba: assemble=%.0f dispatch=%.0f ms (K=%d L=%d)",
                   cur.id, (t1 - t0) * 1e3, (time.monotonic() - t1) * 1e3,
                   K, L)
        self._pending_ba = {
            "fut": fut, "lm_ids": lm_ids, "kf_slots": kf_slots,
            "marker_rows": marker_rows, "host": host, "center": cur.id,
            "epoch": self.map_db.epoch, "t0": t0,
        }

    def apply_pending_ba(self) -> bool:
        """Fetch + write back the in-flight local BA, then publish the
        device landmark table. No-op when nothing is pending or the map was
        cleared/loop-corrected since dispatch (epoch mismatch). Returns True
        when the writeback + table publish actually happened."""
        p, self._pending_ba = self._pending_ba, None
        if p is None:
            return False
        map_db = self.map_db
        if p["epoch"] != map_db.epoch:  # cheap unlocked fast path
            return False
        _t0 = time.monotonic()
        lm_ids, kf_slots, host = p["lm_ids"], p["kf_slots"], p["host"]
        marker_rows = p["marker_rows"]
        # the worker thread started this fetch right after dispatch — by now
        # the round trip has usually landed under the tracking pipeline
        camR, camt, lm_new, outlier = p["fut"].result()
        _t1 = time.monotonic()
        obs_cam = host["obs_cam"]
        obs_valid = host["obs_valid"]
        cam_fixed_h = host["cam_fixed"]
        with map_db.lock:
            # re-check under the lock: a loop correction / reset can bump the
            # epoch between the unlocked check above and taking the lock —
            # writing back here would partially undo the correction
            if p["epoch"] != map_db.epoch:
                return False
            for slot, kf_id in enumerate(kf_slots):
                if kf_id < 0:
                    continue
                kf = map_db.keyframes.get(kf_id)
                if kf is None or bool(cam_fixed_h[slot]):
                    continue
                T = np.eye(4)
                T[:3, :3] = camR[slot]
                T[:3, 3] = camt[slot]
                kf.set_pose_cw(T)
            # vectorized position write-through: Landmark.pos_w reads the
            # field store, so one fancy-indexed store write replaces the
            # per-landmark Python loop (measured 19-104 ms per writeback on
            # the single-core host, where every mapper millisecond stalls
            # the feed thread)
            ids = np.asarray(lm_ids, np.int64)
            rows = np.nonzero(ids >= 0)[0]
            rows = rows[map_db.fields.alive[ids[rows]]]
            live_ids = ids[rows]
            map_db.fields.pos[live_ids] = lm_new[rows].astype(np.float64)
            # erase outlier observations (cc:377-399): loop ONLY the flagged
            # rows (typically a handful) instead of every [L,D] slot
            kf_slots_arr = np.asarray(kf_slots, np.int64)
            pruned = set()
            o_rows, o_d = np.nonzero(outlier & obs_valid)
            for l, d in zip(o_rows.tolist(), o_d.tolist()):
                lm_id = int(ids[l])
                lm = map_db.landmarks.get(lm_id)
                if lm is None or lm.will_be_erased:
                    continue
                kf_slot = int(obs_cam[l, d])
                kf_id = int(kf_slots_arr[kf_slot]) \
                    if kf_slot < len(kf_slots_arr) else -1
                kf = map_db.keyframes.get(kf_id)
                if kf is None:
                    continue
                idx = lm.observations.get(kf_id)
                if idx is not None:
                    lm.erase_observation(kf_id)
                    kf.erase_landmark_with_index(idx)
                if lm.num_observations() < 2:
                    map_db.erase_landmark(lm_id)
                    pruned.add(lm_id)
            moved = [
                map_db.landmarks[i] for i in live_ids.tolist()
                if i not in pruned and i in map_db.landmarks
            ]
            # normals/ranges only: the reference's post-BA refresh is
            # update_mean_normal_and_obs_scale_variance without
            # compute_descriptor (local_bundle_adjuster_g2o.cc:408), and
            # the descriptor medians dominate the refresh cost
            map_db.batch_refresh_landmark_stats(
                moved, self.orb_params.scale_factors, compute_desc=False)
            # marker corner write-back (reference cc:411-427)
            for mk, ci, row in marker_rows:
                if not mk.keep_fixed:
                    mk.corners_world[ci] = lm_new[row].astype(np.float64)
        # the deferred publish: tracking sees the keyframe event's whole
        # effect (new landmarks + fusion + BA) as ONE table version bump
        _t2 = time.monotonic()
        map_db.refresh_device_table(
            center_kf_id=p["center"],
            max_local_keyframes=self.max_num_local_keyfrms)
        self.local_ba_ms.append((time.monotonic() - p["t0"]) * 1e3)
        PERF.add("ba/wb.fetch", _t1 - _t0)
        PERF.add("ba/wb.write", _t2 - _t1)
        PERF.add("ba/wb.publish", time.monotonic() - _t2)
        _log.debug("kf %d ba writeback: fetch=%.0f write=%.0f publish=%.0f ms",
                   p["center"], (_t1 - _t0) * 1e3, (_t2 - _t1) * 1e3,
                   (time.monotonic() - _t2) * 1e3)
        return True

    def _assemble_local_ba(self, cur: Keyframe):
        """Build the padded BAProblem (host numpy, one upload)."""
        map_db = self.map_db
        K, L, D = self.ba_K, self.ba_L, self.ba_D
        local_ids = [cur.id] + cur.graph_node.get_covisibilities()
        # TPU-first problem thinning: optimizing the strongest-covisibility
        # neighbors only (instead of the reference's whole covisibility set,
        # local_bundle_adjuster_g2o.cc:68-92) keeps mature-map problems in
        # the small-K compiled bucket — the [L,K,6,3] Schur tensors scale
        # with K, and on one chip every ms of BA device time is a ms the
        # tracker's frames queue behind. 0 = reference behavior.
        cap = self.ba_local_cap if self.ba_local_cap > 0 else K - 8
        local_ids = [
            i for i in local_ids
            if i in map_db.keyframes and not map_db.keyframes[i].will_be_erased
        ][: min(cap, K - 8)]
        local_set = set(local_ids)
        # local landmarks: stable-unique over the stacked association arrays
        # (first-occurrence order keeps the center keyframe's landmarks first
        # under truncation), liveness via the field store
        from stella_vslam_tpu.data.map_database import stable_unique

        cat = np.concatenate(
            [map_db.keyframes[k].lm_ids for k in local_ids]
        ) if local_ids else np.zeros(0, np.int64)
        cat = cat[cat >= 0]
        lm_ids = map_db.fields.live(stable_unique(cat))
        if len(lm_ids) < 8 or len(local_ids) < 2:
            return None, None, None, None, None
        # marker corner rows that will be appended after the landmark rows
        n_marker_rows = 4 * sum(
            1 for mk in map_db.markers.values()
            if (mk.initialized or mk.keep_fixed) and mk.corners_world is not None
        )
        # smallest compiled bucket that fits; the largest bucket truncates
        L = next((b for b in self.BA_L_BUCKETS
                  if len(lm_ids) + n_marker_rows <= b), self.ba_L)
        lm_ids = [int(i) for i in
                  lm_ids[: L - n_marker_rows if n_marker_rows else L]]
        # fixed keyframes: other observers of the local landmarks, strongest
        # first — one native covis_counts call instead of a Python loop over
        # every landmark's observation dict
        obs_kf, cnt = map_db.assoc_store.covis_counts(
            np.asarray(lm_ids, np.int64), -1)
        fixed_ids = []
        budget = K - len(local_ids)
        if self.ba_local_cap > 0:
            # keep the whole problem inside the smallest bucket that fits
            # the cap: strongest few external observers anchor the gauge
            target = next((b for b in self.BA_K_BUCKETS
                           if self.ba_local_cap < b), self.ba_K)
            budget = min(budget, target - len(local_ids))
        for i in np.argsort(-cnt):
            k = int(obs_kf[i])
            if k not in local_set:
                fixed_ids.append(k)
                if len(fixed_ids) >= budget:
                    break
        kf_slots = local_ids + fixed_ids
        slot_of = {kf_id: s for s, kf_id in enumerate(kf_slots)}
        # smallest compiled camera bucket that fits this problem (early maps
        # run the K=16 variant in a fraction of the device time)
        K = next((b for b in self.BA_K_BUCKETS
                  if len(kf_slots) <= b and (b, L) in self._ba_shapes),
                 self.ba_K)

        cam_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        cam_t = np.zeros((K, 3), np.float32)
        cam_fixed = np.ones(K, bool)
        cam_valid = np.zeros(K, bool)
        for s, kf_id in enumerate(kf_slots):
            kf = map_db.keyframes[kf_id]
            cam_R[s] = kf.rot_cw
            cam_t[s] = kf.trans_cw
            cam_valid[s] = True
            is_fixed = (
                kf_id in fixed_ids
                or kf_id in map_db.spanning_roots
                or kf_id <= map_db.fixed_keyframe_id_threshold
            )
            cam_fixed[s] = is_fixed
        # gauge: if nothing fixed, fix the oldest local keyframe
        if not cam_fixed[: len(kf_slots)].any():
            cam_fixed[int(np.argmin(kf_slots))] = True

        lm_pos = np.zeros((L, 3), np.float32)
        lm_valid = np.zeros(L, bool)
        nl = len(lm_ids)
        lm_pos[:nl] = map_db.fields.pos[np.asarray(lm_ids, np.int64)]
        lm_valid[:nl] = True
        # observation table assembled by the native map core (mapcore.cpp)
        lm_ids_arr = np.asarray(lm_ids + [-1] * (L - len(lm_ids)), np.int64)
        obs_cam, obs_idx, obs_valid = map_db.assoc_store.assemble_ba(
            lm_ids_arr, np.asarray(kf_slots, np.int64),
            np.arange(len(kf_slots), dtype=np.int32), D,
        )
        inv_sigma = np.asarray(self.orb_params.inv_level_sigma_sq, np.float32)
        obs_uv, obs_xr, obs_w = fill_observation_tables(
            map_db, kf_slots, obs_cam, obs_idx, obs_valid, inv_sigma)

        # marker corner vertices: initialized (or fixed) markers observed by
        # keyframes in this problem contribute 4 extra point rows each with
        # unit-weight 2D edges (reference local_bundle_adjuster_g2o.cc:250-304)
        lm_fixed = np.zeros(L, bool)
        lm_keep = np.zeros(L, bool)
        marker_rows = append_marker_rows(
            map_db, slot_of, lm_pos, lm_valid, lm_fixed,
            obs_cam, obs_uv, obs_w, obs_valid, start_row=len(lm_ids),
            lm_keep_inlier=lm_keep,
        )

        # ONE flat f32 upload instead of 13 per-array transfers (each tunnel
        # op costs ms and contends with the tracker's in-flight fetches;
        # measured 10-35 ms of the keyframe event) — unpacked inside the jit
        # by ba_mod.bundle_adjust_packed
        pack = np.empty(ba_mod.packed_size(K, L, D), np.float32)
        arrays = {
            "cam_R": cam_R, "cam_t": cam_t, "cam_fixed": cam_fixed,
            "cam_valid": cam_valid, "lm_pos": lm_pos, "lm_valid": lm_valid,
            "obs_cam": obs_cam, "obs_uv": obs_uv, "obs_x_right": obs_xr,
            "obs_inv_sigma_sq": obs_w, "obs_valid": obs_valid,
            "lm_fixed": lm_fixed, "lm_keep_inlier": lm_keep,
        }
        off = 0
        for name, n, _ in ba_mod._packed_layout(K, L, D):
            pack[off:off + n] = arrays[name].reshape(-1)
            off += n
        lm_ids_padded = lm_ids + [-1] * (L - len(lm_ids))
        kf_slots_padded = kf_slots + [-1] * (K - len(kf_slots))
        host = {"obs_cam": obs_cam, "obs_valid": obs_valid,
                "cam_fixed": cam_fixed}
        return (pack, K, L, D), lm_ids_padded, kf_slots_padded, marker_rows, host
