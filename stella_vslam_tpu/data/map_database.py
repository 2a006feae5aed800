"""Host-side map database + device-resident landmark-table mirror.

Reference: src/stella_vslam/data/map_database.{h,cc} — id->keyframe/landmark
maps behind a global mutex, local landmark cache, pose-proximity queries,
JSON serialization, origin/spanning roots, fixed-keyframe threshold for
temporal mapping.

TPU-native addition: `DeviceLandmarkTable`, a padded SoA mirror of all live
landmarks (positions, descriptors, normals, distance ranges, scale hints) that
the tracking thread's jitted programs consume directly. The mapping thread
refreshes it after map mutations; the tracking thread never uploads map data
per frame (host->device transfers cost ~3-50 ms on the target stack).
"""
from __future__ import annotations

import threading
from typing import Dict, NamedTuple, Optional

import jax
import numpy as np

from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark


class TableSnap(NamedTuple):
    """One coherent published state of the device landmark table.

    The tracking thread dispatches against whatever snapshot is current at
    the time it reads `DeviceLandmarkTable.snap` — a SINGLE reference read,
    so it can never observe a half-refreshed table even though the mapping
    thread refreshes concurrently without the tracker holding the map lock
    (the reference instead serializes through map_database::mtx_database_,
    map_database.h:268-269; here the tracker is lock-free on the hot path)."""

    version: int
    count: int
    ids: np.ndarray  # [C] i64 host
    ids_dev: jax.Array  # [C] i32
    pos: jax.Array  # [C,3] f32
    desc: jax.Array  # [C,8] u32
    normal: jax.Array  # [C,3] f32
    min_dist: jax.Array  # [C]
    max_dist: jax.Array  # [C]
    valid: jax.Array  # [C] bool
    track_valid: jax.Array  # [C] bool


class DeviceLandmarkTable:
    """Fixed-capacity device mirror of the (covisibility-local) landmark set.

    The capacity is ONE compile-time constant for the whole run: every
    tracking-program variant is compiled against it once at warmup and no
    capacity growth can ever trigger a mid-run compile. On the tunneled
    backend a compile — even a background-thread compile of a bucket that
    is never used — blocks the device pipeline for seconds (measured: a
    proactive 8192-row warm compile stalled tracking 12.5 s), so growth
    buckets are a net loss; the local map is bounded by construction
    (~60 keyframes, reference local_map_updater) and rows beyond capacity
    are truncated in priority order instead."""

    def __init__(self, capacity: Optional[int] = None):
        if capacity is None:
            import os
            capacity = int(os.environ.get("SVT_TABLE_CAP", "4096"))
        self.capacity = capacity
        self.count = 0
        self.version = 0
        # the one published state; swapped atomically by refresh() (see
        # TableSnap). None until the first refresh.
        self.snap: Optional[TableSnap] = None
        # observability counters accumulated by the tracking thread and folded
        # into Landmark objects at refresh. Keyed by LANDMARK ID, not table
        # row: with pipelined tracking, a frame's result can be finalized
        # AFTER the table has been refreshed (rows reordered), so row indices
        # from the frame's dispatch-time layout must be resolved against the
        # dispatch-time ids snapshot the caller passes in.
        self._pend_observable: Dict[int, int] = {}
        self._pend_observed: Dict[int, int] = {}

    def bump_observable(self, mask: np.ndarray, ids: np.ndarray):
        """`mask` is per-row in the layout described by `ids` (the caller's
        snapshot of self.ids taken when the device program was dispatched)."""
        n = min(len(mask), len(ids))
        sel = ids[:n][mask[:n]]
        for k in sel[sel >= 0]:
            k = int(k)
            self._pend_observable[k] = self._pend_observable.get(k, 0) + 1

    def bump_observed(self, lm_ids: np.ndarray):
        for lm_id in lm_ids[lm_ids >= 0]:
            k = int(lm_id)
            self._pend_observed[k] = self._pend_observed.get(k, 0) + 1

    def _fold_counters(self, landmarks: Dict[int, Landmark]):
        for lm_id, cnt in self._pend_observable.items():
            lm = landmarks.get(lm_id)
            if lm is not None:
                lm.num_observable += cnt
        self._pend_observable = {}
        for lm_id, cnt in self._pend_observed.items():
            lm = landmarks.get(lm_id)
            if lm is not None:
                lm.num_observed += cnt
        self._pend_observed = {}

    def refresh(self, landmarks: Dict[int, Landmark], map_db,
                local_ids=None):
        """`local_ids`: landmark ids in the covisibility-local map (reference
        local_map_updater semantics), in PRIORITY order (center keyframe's
        landmarks first, then 1st-order covisibilities, then 2nd-order) —
        rows past the fixed capacity are dropped from the back. When given,
        the table holds ONLY those rows — the tracking sweep's cost is
        proportional to the table capacity, and the local map is bounded
        (<= ~60 keyframes), so keeping the table local-compact is both the
        reference semantics and the fast layout. None = all live landmarks
        (small maps / no center)."""
        self._fold_counters(landmarks)
        if local_ids is None:
            lms = [lm for lm in landmarks.values() if not lm.will_be_erased]
        else:
            lms = [
                landmarks[i] for i in local_ids
                if i in landmarks and not landmarks[i].will_be_erased
            ]
        C = self.capacity
        lms = lms[:C]
        n = len(lms)
        pos = np.zeros((C, 3), np.float32)
        desc = np.zeros((C, 8), np.uint32)
        normal = np.zeros((C, 3), np.float32)
        dmin = np.zeros(C, np.float32)
        dmax = np.zeros(C, np.float32)
        valid = np.zeros(C, bool)
        ids = np.full(C, -1, np.int64)
        for i, lm in enumerate(lms):
            pos[i] = lm.pos_w
            desc[i] = lm.descriptor
            normal[i] = lm.mean_normal
            dmin[i] = lm.min_valid_dist
            dmax[i] = lm.max_valid_dist
            valid[i] = True
            ids[i] = lm.id
        self.count = n
        self.version += 1
        valid_dev = jax.device_put(valid)
        # rows visible to the tracking thread's local-map sweep (the table IS
        # the local map now; kept as a separate field for API clarity).
        # Publication is the single `self.snap = ...` below — the tracking
        # thread reads the reference once per dispatch and never sees a torn
        # mix of old/new capacities.
        self.snap = TableSnap(
            version=self.version,
            count=n,
            ids=ids,
            ids_dev=jax.device_put(ids.astype(np.int32)),
            pos=jax.device_put(pos),
            desc=jax.device_put(desc),
            normal=jax.device_put(normal),
            min_dist=jax.device_put(dmin),
            max_dist=jax.device_put(dmax),
            valid=valid_dev,
            track_valid=valid_dev,
        )


class MapDatabase:
    def __init__(self, min_num_shared_lms: int = 15,
                 device_table_capacity: Optional[int] = None):
        self.lock = threading.RLock()
        self.keyframes: Dict[int, Keyframe] = {}
        self.landmarks: Dict[int, Landmark] = {}
        self._next_keyfrm_id = 0
        self._next_landmark_id = 0
        self.min_num_shared_lms = min_num_shared_lms
        self.origin_keyfrm_id: Optional[int] = None
        # temporal mapping: keyframes with id <= fixed threshold are frozen
        self.fixed_keyframe_id_threshold = -1
        # bumped on clear/loop-correction; deferred writebacks carry the
        # epoch they were dispatched under and skip apply on mismatch
        self.epoch = 0
        self.device_table = DeviceLandmarkTable(device_table_capacity)
        self.local_landmark_ids: list = []
        self.on_erase_keyframe: list = []  # callbacks(kf_id)
        self.markers: Dict[int, object] = {}  # fiducial markers (data/marker)
        # landmark replacement tombstones: old id -> surviving id (fusion)
        self.replaced_ids: Dict[int, int] = {}
        # native association store (C++ map core, native/mapcore.cpp)
        from stella_vslam_tpu.native.assoc_store import AssocStore

        self.assoc_store = AssocStore()

    # ---- id allocation ----
    def next_keyframe_id(self) -> int:
        i = self._next_keyfrm_id
        self._next_keyfrm_id += 1
        return i

    def next_landmark_id(self) -> int:
        i = self._next_landmark_id
        self._next_landmark_id += 1
        return i

    # ---- mutation ----
    def add_keyframe(self, kf: Keyframe):
        with self.lock:
            self.keyframes[kf.id] = kf
            try:
                self.assoc_store.register_keyframe(kf.id, kf.h_desc, kf.h_level)
            except Exception:
                pass  # keyframes without host mirrors fall back to Python stats
            if self.origin_keyfrm_id is None:
                self.origin_keyfrm_id = kf.id

    def add_landmark(self, lm: Landmark):
        with self.lock:
            self.landmarks[lm.id] = lm
            lm._store = self.assoc_store
            for kf_id, idx in lm.observations.items():
                self.assoc_store.add(lm.id, kf_id, idx)

    def erase_landmark(self, lm_id: int):
        with self.lock:
            lm = self.landmarks.pop(lm_id, None)
            if lm is None:
                return
            lm.will_be_erased = True
            for kf_id, idx in lm.observations.items():
                kf = self.keyframes.get(kf_id)
                if kf is not None and kf.lm_ids[idx] == lm_id:
                    kf.lm_ids[idx] = -1
            self.assoc_store.erase_landmark(lm_id)

    def erase_keyframe(self, kf_id: int):
        with self.lock:
            kf = self.keyframes.get(kf_id)
            if kf is None:
                return
            kf.will_be_erased = True
            for idx, lm_id in enumerate(kf.lm_ids):
                if lm_id < 0:
                    continue
                lm = self.landmarks.get(int(lm_id))
                if lm is not None:
                    lm.erase_observation(kf_id)
            kf.graph_node.erase_all_connections(self)
            kf.graph_node.recompute_spanning_parent_on_erase(self)
            del self.keyframes[kf_id]
            self.assoc_store.erase_keyframe_data(kf_id)
            for cb in self.on_erase_keyframe:
                cb(kf_id)

    def replace_landmark(self, old: Landmark, new: Landmark,
                         refresh: bool = True):
        """reference landmark::replace — move observations to `new`.
        refresh=False lets batch callers (fuse) defer the statistics update
        to one batch_refresh_landmark_stats call."""
        with self.lock:
            if old.id == new.id:
                return
            for kf_id, idx in list(old.observations.items()):
                kf = self.keyframes.get(kf_id)
                if kf is None:
                    continue
                if kf_id not in new.observations:
                    new.add_observation(kf_id, idx)
                    kf.lm_ids[idx] = new.id
                else:
                    kf.lm_ids[idx] = -1
            new.num_observable += old.num_observable
            new.num_observed += old.num_observed
            old.observations = {}
            old.will_be_erased = True
            old.replaced_id = new.id
            # tombstone so stale associations (tracking chain, pending
            # frames) can be forwarded to the surviving landmark — the
            # reference's landmark::get_replaced / replace_landmarks_in_
            # last_frm (mapping_module.cc:408-415)
            self.replaced_ids[old.id] = new.id
            self.landmarks.pop(old.id, None)
            self.assoc_store.erase_landmark(old.id)
            if refresh:
                new.compute_descriptor(self)
                new.update_mean_normal_and_obs_scale_variance(self)

    def batch_refresh_landmark_stats(self, lms, scale_factors):
        """Batched equivalent of per-landmark compute_descriptor +
        update_mean_normal_and_obs_scale_variance, computed in the native
        map core with the GIL released. The per-landmark Python versions
        cost ~0.15 ms each; a mapped keyframe touches thousands of
        landmarks, which made this the mapper's single biggest host cost."""
        with self.lock:
            lms = [
                lm for lm in lms
                if lm is not None and not lm.will_be_erased and lm.observations
            ]
            if not lms:
                return
            kfs = [
                kf for kf in self.keyframes.values() if not kf.will_be_erased
            ]
            if not kfs:
                return
            kf_ids = np.array([kf.id for kf in kfs], np.int64)
            centers = np.stack([kf.cam_center for kf in kfs])
            lm_ids = np.array([lm.id for lm in lms], np.int64)
            lm_pos = np.stack([lm.pos_w for lm in lms])
            ref_ids = np.array([lm.ref_keyfrm_id for lm in lms], np.int64)
            desc, normal, dmin, dmax, flags = \
                self.assoc_store.batch_landmark_refresh(
                    lm_ids, lm_pos, ref_ids, kf_ids, centers, scale_factors)
            for i, lm in enumerate(lms):
                f = flags[i]
                if f & 1:
                    lm.descriptor = desc[i]
                if f & 2:
                    lm.mean_normal = normal[i]
                if f & 4:
                    lm.min_valid_dist = float(dmin[i])
                    lm.max_valid_dist = float(dmax[i])

    def resolve_landmark_id(self, lm_id: int) -> int:
        """Follow the replacement chain to the surviving landmark id;
        returns -1 if the landmark (or its replacement) was erased."""
        seen = 0
        while lm_id in self.replaced_ids and seen < 64:
            lm_id = self.replaced_ids[lm_id]
            seen += 1
        return lm_id if lm_id in self.landmarks else -1

    def resolve_landmark_ids(self, lm_ids: "np.ndarray") -> "np.ndarray":
        """Vectorized-ish resolve for association arrays (-1 passthrough)."""
        if not self.replaced_ids:
            return lm_ids
        out = lm_ids.copy()
        for i in np.nonzero(lm_ids >= 0)[0]:
            k = int(lm_ids[i])
            if k not in self.landmarks:
                out[i] = self.resolve_landmark_id(k)
        return out

    def last_inserted_keyframe(self):
        with self.lock:
            if not self.keyframes:
                return None
            return self.keyframes[max(self.keyframes.keys())]

    # ---- queries ----
    def get_close_keyframes(self, pose_cw: np.ndarray, distance_thr: float, angle_thr: float):
        """Pose-proximity query (reference map_database.cc:132)."""
        out = []
        R, t = pose_cw[:3, :3], pose_cw[:3, 3]
        center = -R.T @ t
        for kf in self.keyframes.values():
            if kf.will_be_erased:
                continue
            if np.linalg.norm(kf.cam_center - center) > distance_thr:
                continue
            dR = R @ kf.rot_cw.T
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            if ang <= angle_thr:
                out.append(kf)
        return out

    def get_close_keyframes_2d(self, pose_cw: np.ndarray, normal: np.ndarray,
                               distance_thr: float, angle_thr: float):
        """2D variant ignoring elevation (reference map_database.cc:164)."""
        out = []
        R, t = pose_cw[:3, :3], pose_cw[:3, 3]
        center = -R.T @ t
        for kf in self.keyframes.values():
            if kf.will_be_erased:
                continue
            d = kf.cam_center - center
            d = d - np.dot(d, normal) * normal
            if np.linalg.norm(d) > distance_thr:
                continue
            dR = R @ kf.rot_cw.T
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            if ang <= angle_thr:
                out.append(kf)
        return out

    def num_keyframes(self) -> int:
        return len(self.keyframes)

    def num_landmarks(self) -> int:
        return len(self.landmarks)

    def max_keyframe_id(self) -> int:
        return max(self.keyframes) if self.keyframes else -1

    # ---- device mirror ----
    def refresh_device_table(self, center_kf_id: Optional[int] = None,
                             max_local_keyframes: int = 60):
        """Refresh the device landmark table. When `center_kf_id` is given,
        the tracking-visible rows are restricted to the covisibility-local
        map around that keyframe: 1st-order covisibilities (capped) plus
        their top-10 2nd-order neighbors — the reference local_map_updater
        neighborhood (local_map_updater.cc:26-248). Without a center, every
        live landmark is tracking-visible."""
        with self.lock:
            local_ids = None
            center = self.keyframes.get(center_kf_id) if center_kf_id is not None else None
            if center is not None:
                kf_ids = [center.id]
                kf_ids += center.graph_node.get_covisibilities()[: max_local_keyframes]
                second = []
                for k in kf_ids[1:]:
                    kf = self.keyframes.get(k)
                    if kf is not None:
                        second += kf.graph_node.get_top_n_covisibilities(10)
                # ordered + unique: the table truncates past its fixed
                # capacity, so closer keyframes' landmarks must come first
                seen = set()
                local_ids = []
                for k in dict.fromkeys(kf_ids + second):
                    kf = self.keyframes.get(k)
                    if kf is None or kf.will_be_erased:
                        continue
                    for lm_id in kf.lm_ids[kf.lm_ids >= 0]:
                        lm_id = int(lm_id)
                        if lm_id not in seen:
                            seen.add(lm_id)
                            local_ids.append(lm_id)
            self.device_table.refresh(self.landmarks, self, local_ids=local_ids)

    # ---- reset / serialization ----
    def bump_epoch(self):
        """Invalidate in-flight deferred writebacks (the mapper's pending
        local BA): called on clear and on loop correction."""
        with self.lock:
            self.epoch += 1

    def clear(self):
        with self.lock:
            self.epoch += 1
            self.keyframes.clear()
            self.landmarks.clear()
            self.origin_keyfrm_id = None
            self.local_landmark_ids = []
            self.replaced_ids.clear()
            self.assoc_store.clear()

    def to_json(self, cameras: dict, orb_params: dict) -> dict:
        with self.lock:
            return {
                "cameras": cameras,
                "orb_params": orb_params,
                "keyframes": {str(k): kf.to_json() for k, kf in self.keyframes.items()},
                "landmarks": {str(k): lm.to_json() for k, lm in self.landmarks.items()},
                "frame_next_id": 0,
                "keyframe_next_id": self._next_keyfrm_id,
                "landmark_next_id": self._next_landmark_id,
            }
