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

import queue
import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark
from stella_vslam_tpu.marker.marker import append_marker_rows
from stella_vslam_tpu.match import fuse as fuse_match
from stella_vslam_tpu.module.local_map_cleaner import LocalMapCleaner
from stella_vslam_tpu.module.mapping_kernels import MappingKernels
from stella_vslam_tpu.ops.optim import ba as ba_mod
from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars
from stella_vslam_tpu.util.fetch import fetch_all


class MappingModule:
    def __init__(self, map_db, camera, orb_params, *,
                 num_covisibilities_for_triangulation: int = 10,
                 queue_threshold: int = 2,
                 ba_K: int = 64, ba_L: int = 8192, ba_D: int = 12,
                 enable_local_ba: bool = True):
        self.map_db = map_db
        self.camera = camera
        self.orb_params = orb_params
        self.kernels = MappingKernels(camera, orb_params)
        self.cleaner = LocalMapCleaner()
        self.num_covis_tri = num_covisibilities_for_triangulation
        self.queue_threshold = queue_threshold
        self.ba_K, self.ba_L, self.ba_D = ba_K, ba_L, ba_D
        self.enable_local_ba = enable_local_ba

        self._queue: "queue.Queue[Keyframe]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
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
        while not self._terminate.is_set():
            if self._pause_requested.is_set():
                self._paused.set()
                time.sleep(0.005)
                continue
            try:
                kf = self._queue.get(timeout=0.005)
            except queue.Empty:
                continue
            self._idle.clear()
            try:
                self.mapping_with_new_keyframe(kf)
                if self.global_optimizer is not None:
                    self.global_optimizer.queue_keyframe(kf)
            finally:
                self._idle.set()
                self.num_processed += 1

    # ------------------------------------------------------------------
    def mapping_with_new_keyframe(self, cur: Keyframe):
        map_db = self.map_db
        # store: BoW for place recognition (mapping_module.cc store_new_keyframe)
        if self.bow_db is not None and cur.id not in self.bow_db.bow_vecs:
            _, bow_vec = self.bow_db.vocab.compute_bow(cur.h_desc, cur.h_valid)
            self.bow_db.add_keyframe(cur.id, bow_vec)
        self.cleaner.remove_invalid_landmarks(map_db, cur.id)
        self.create_new_landmarks(cur)
        self.fuse_landmark_duplication(cur)
        cur.graph_node.update_connections(map_db)
        if self.enable_local_ba and map_db.num_keyframes() > 2 and not self.is_skipping_localBA():
            self.local_bundle_adjustment(cur)
        self.remove_temporal_keyframes(cur)
        self.cleaner.remove_redundant_keyframes(map_db, cur)
        # tracking-visible rows = covisibility-local map around the newest
        # keyframe (reference local_map_updater neighborhood)
        map_db.refresh_device_table(center_kf_id=cur.id)

    # ------------------------------------------------------------------
    def remove_temporal_keyframes(self, cur: Keyframe,
                                  max_ephemeral_keyframes: int = 15):
        """Temporal mapping: when a fixed-keyframe threshold is set (map was
        pre-loaded with enable_temporal_mapping), newly created keyframes are
        ephemeral — keep only the most recent ones
        (reference mapping_module.cc:210-237 queue-based eviction)."""
        map_db = self.map_db
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
    def create_new_landmarks(self, cur: Keyframe):
        map_db = self.map_db
        covis = cur.graph_node.get_top_n_covisibilities(self.num_covis_tri)
        if not covis:
            return
        median_depth = cur.compute_median_depth(map_db, use_abs=True)
        # eligible neighbors after the baseline check (mapping_module.cc:286-300)
        neighbors = []
        for other_id in covis:
            other = map_db.keyframes.get(other_id)
            if other is None or other.will_be_erased:
                continue
            baseline = np.linalg.norm(cur.cam_center - other.cam_center)
            if self.camera.setup.name == "MONOCULAR":
                if median_depth > 0 and baseline / median_depth < 0.01:
                    continue
            else:
                if baseline < self.camera.true_baseline:
                    continue
            neighbors.append(other)
        if not neighbors:
            return
        B = 5
        neighbors = neighbors[:B]
        pair_valid = np.zeros(B, bool)
        pair_valid[: len(neighbors)] = True
        padded = neighbors + [neighbors[0]] * (B - len(neighbors))
        cur_unassoc = jnp.asarray((cur.lm_ids < 0)) & cur.feats.valid
        cur_is_stereo = cur.x_right > 0
        stack = lambda f: jnp.stack([f(o) for o in padded])
        res = self.kernels.triangulate_multi(
            cur.undist_xy, cur.feats.level, cur.feats.desc, cur.bearings,
            cur.feats.angle, cur_unassoc, cur_is_stereo, cur.x_right,
            stack(lambda o: o.undist_xy), stack(lambda o: o.feats.level),
            stack(lambda o: o.feats.desc), stack(lambda o: o.bearings),
            stack(lambda o: o.feats.angle),
            stack(lambda o: jnp.asarray(o.lm_ids < 0) & o.feats.valid),
            stack(lambda o: o.x_right > 0), stack(lambda o: o.x_right),
            jnp.asarray(cur.rot_cw, dtype=jnp.float32),
            jnp.asarray(cur.trans_cw, dtype=jnp.float32),
            stack(lambda o: jnp.asarray(o.rot_cw, dtype=jnp.float32)),
            stack(lambda o: jnp.asarray(o.trans_cw, dtype=jnp.float32)),
            jnp.asarray(pair_valid),
        )
        ok_all, pos_all, idx2_all = fetch_all(res.ok, res.pos_w, res.idx2)
        with map_db.lock:
            for b, other in enumerate(neighbors):
                ok = ok_all[b]
                if not ok.any():
                    continue
                for i in np.nonzero(ok)[0]:
                    # a slot may have been claimed by an earlier neighbor
                    if cur.lm_ids[i] >= 0 or other.lm_ids[idx2_all[b, i]] >= 0:
                        continue
                    lm = Landmark(map_db.next_landmark_id(), pos_all[b, i], cur.id)
                    lm.first_keyfrm_id = cur.id
                    map_db.add_landmark(lm)
                    lm.add_observation(cur.id, int(i))
                    lm.add_observation(other.id, int(idx2_all[b, i]))
                    cur.add_landmark(lm.id, int(i))
                    other.add_landmark(lm.id, int(idx2_all[b, i]))
                    lm.compute_descriptor(map_db)
                    lm.update_mean_normal_and_obs_scale_variance(map_db)
                    self.cleaner.add_fresh_landmark(lm.id)

    # ------------------------------------------------------------------
    def fuse_landmark_duplication(self, cur: Keyframe):
        """Fuse current keyframe's landmarks into first/second-order
        covisibilities and vice versa (mapping_module.cc:417-537)."""
        map_db = self.map_db
        targets = cur.graph_node.get_top_n_covisibilities(10)
        seconds = []
        for t in targets:
            kf = map_db.keyframes.get(t)
            if kf:
                seconds.extend(kf.graph_node.get_top_n_covisibilities(5))
        fuse_targets = [t for t in dict.fromkeys(targets + seconds) if t != cur.id]

        # direction 1: current landmarks -> each target keyframe
        cur_lms = [
            (int(lm_id), map_db.landmarks.get(int(lm_id)))
            for lm_id in cur.lm_ids if lm_id >= 0
        ]
        cur_lms = [(i, lm) for i, lm in cur_lms if lm is not None and not lm.will_be_erased]
        if cur_lms:
            self._fuse_into(map_db, [map_db.keyframes[t] for t in fuse_targets
                                     if t in map_db.keyframes], cur_lms)
        # direction 2: target landmarks -> current keyframe
        tgt_lm_ids = []
        seen = set()
        for t in fuse_targets:
            kf = map_db.keyframes.get(t)
            if kf is None:
                continue
            for lm_id in kf.lm_ids:
                if lm_id >= 0 and lm_id not in seen:
                    seen.add(int(lm_id))
                    lm = map_db.landmarks.get(int(lm_id))
                    if lm is not None and not lm.will_be_erased:
                        tgt_lm_ids.append((int(lm_id), lm))
        if tgt_lm_ids:
            self._fuse_into(map_db, [cur], tgt_lm_ids)

    def _fuse_into(self, map_db, keyframes, lm_list, margin: float = 3.0):
        if not lm_list:
            return
        keyframes = [
            kf for kf in keyframes if kf is not None and not kf.will_be_erased
        ]
        if not keyframes:
            return
        # pad the keyframe batch to fixed sizes (4/8/16) to bound recompiles
        Bpad = 4
        while Bpad < len(keyframes):
            Bpad *= 2
        kf_batch_valid = np.zeros(Bpad, bool)
        kf_batch_valid[: len(keyframes)] = True
        padded_kfs = keyframes + [keyframes[0]] * (Bpad - len(keyframes))
        lm_pos = np.array([lm.pos_w for _, lm in lm_list], np.float32)
        lm_desc = np.stack([lm.descriptor for _, lm in lm_list])
        lm_dmin = np.array([lm.min_valid_dist for _, lm in lm_list], np.float32)
        lm_dmax = np.array([lm.max_valid_dist for _, lm in lm_list], np.float32)
        lm_norm = np.array([lm.mean_normal for _, lm in lm_list], np.float32)
        # pad the landmark axis to power-of-two buckets to bound recompiles
        M = len(lm_list)
        Mpad = max(256, 1 << int(np.ceil(np.log2(M))))
        pad = lambda a: np.concatenate(
            [a, np.zeros((Mpad - M,) + a.shape[1:], a.dtype)]
        )
        lm_valid = np.zeros(Mpad, bool)
        lm_valid[:M] = True
        stack = lambda f: jnp.stack([f(kf) for kf in padded_kfs])
        best_all, acc_all = self.kernels.fuse_multi(
            stack(lambda kf: kf.undist_xy), stack(lambda kf: kf.feats.level),
            stack(lambda kf: kf.feats.desc), stack(lambda kf: kf.feats.valid),
            stack(lambda kf: kf.x_right),
            stack(lambda kf: jnp.asarray(kf.rot_cw, dtype=jnp.float32)),
            stack(lambda kf: jnp.asarray(kf.trans_cw, dtype=jnp.float32)),
            jnp.asarray(kf_batch_valid),
            jnp.asarray(pad(lm_pos)), jnp.asarray(pad(lm_desc)),
            jnp.asarray(pad(lm_dmin)), jnp.asarray(pad(lm_dmax)),
            jnp.asarray(pad(lm_norm)), jnp.asarray(lm_valid),
            margin=margin,
        )
        best_all, acc_all = fetch_all(best_all, acc_all)
        with map_db.lock:
            for b, kf in enumerate(keyframes):
                acc = acc_all[b]
                if not acc[:M].any():
                    continue
                bidx = best_all[b]
                for i in np.nonzero(acc[:M])[0]:
                    lm_id, lm = lm_list[i]
                    if lm.will_be_erased:
                        continue
                    kp = int(bidx[i])
                    existing_id = kf.lm_ids[kp]
                    if existing_id >= 0 and existing_id != lm_id:
                        other = map_db.landmarks.get(int(existing_id))
                        if other is None or other.will_be_erased:
                            kf.lm_ids[kp] = -1
                        elif other.num_observations() >= lm.num_observations():
                            map_db.replace_landmark(lm, other)
                        else:
                            map_db.replace_landmark(other, lm)
                    elif existing_id < 0:
                        lm.add_observation(kf.id, kp)
                        kf.add_landmark(lm_id, kp)
                        lm.compute_descriptor(map_db)
                        lm.update_mean_normal_and_obs_scale_variance(map_db)

    # ------------------------------------------------------------------
    def local_bundle_adjustment(self, cur: Keyframe):
        map_db = self.map_db
        prob, lm_ids, kf_slots, marker_rows, host = self._assemble_local_ba(cur)
        if prob is None:
            return
        cam = make_cam_scalars(self.camera)
        res = ba_mod.bundle_adjust(prob, cam, model=self.camera.model.name.lower())
        # grouped fetch: one overlapped round trip instead of four; the
        # problem inputs stay host-side in `host` (never fetch back uploads)
        camR, camt, lm_new, outlier = fetch_all(
            res.cam_R, res.cam_t, res.lm_pos, res.obs_is_outlier)
        obs_cam = host["obs_cam"]
        obs_valid = host["obs_valid"]
        cam_fixed_h = host["cam_fixed"]
        with map_db.lock:
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
            slot_of = {kf_id: s for s, kf_id in enumerate(kf_slots) if kf_id >= 0}
            for l, lm_id in enumerate(lm_ids):
                if lm_id < 0:
                    continue
                lm = map_db.landmarks.get(lm_id)
                if lm is None or lm.will_be_erased:
                    continue
                lm.pos_w = lm_new[l].astype(np.float64)
                # erase outlier observations (cc:377-399)
                for d in range(outlier.shape[1]):
                    if not (obs_valid[l, d] and outlier[l, d]):
                        continue
                    kf_slot = int(obs_cam[l, d])
                    kf_id = kf_slots[kf_slot] if kf_slot < len(kf_slots) else -1
                    kf = map_db.keyframes.get(kf_id)
                    if kf is None:
                        continue
                    idx = lm.observations.get(kf_id)
                    if idx is not None:
                        lm.erase_observation(kf_id)
                        kf.erase_landmark_with_index(idx)
                if lm.num_observations() < 2:
                    map_db.erase_landmark(lm_id)
                else:
                    lm.update_mean_normal_and_obs_scale_variance(map_db)
            # marker corner write-back (reference cc:411-427)
            for mk, ci, row in marker_rows:
                if not mk.keep_fixed:
                    mk.corners_world[ci] = lm_new[row].astype(np.float64)

    def _assemble_local_ba(self, cur: Keyframe):
        """Build the padded BAProblem (host numpy, one upload)."""
        map_db = self.map_db
        K, L, D = self.ba_K, self.ba_L, self.ba_D
        local_ids = [cur.id] + cur.graph_node.get_covisibilities()
        local_ids = [
            i for i in local_ids
            if i in map_db.keyframes and not map_db.keyframes[i].will_be_erased
        ][: K - 8]  # leave room for fixed keyframes
        local_set = set(local_ids)
        # local landmarks
        lm_ids = []
        lm_seen = set()
        for kf_id in local_ids:
            kf = map_db.keyframes[kf_id]
            for lm_id in kf.lm_ids:
                if lm_id >= 0 and lm_id not in lm_seen:
                    lm = map_db.landmarks.get(int(lm_id))
                    if lm is not None and not lm.will_be_erased:
                        lm_seen.add(int(lm_id))
                        lm_ids.append(int(lm_id))
        if len(lm_ids) < 8 or len(local_ids) < 2:
            return None, None, None, None, None
        lm_ids = lm_ids[:L]
        # fixed keyframes: other observers
        fixed_ids = []
        for lm_id in lm_ids:
            lm = map_db.landmarks[lm_id]
            for kf_id in lm.observations:
                if kf_id not in local_set and kf_id not in fixed_ids:
                    fixed_ids.append(kf_id)
        fixed_ids = fixed_ids[: K - len(local_ids)]
        kf_slots = local_ids + fixed_ids
        slot_of = {kf_id: s for s, kf_id in enumerate(kf_slots)}

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
                or kf_id == map_db.origin_keyfrm_id
                or kf_id <= map_db.fixed_keyframe_id_threshold
            )
            cam_fixed[s] = is_fixed
        # gauge: if nothing fixed, fix the oldest local keyframe
        if not cam_fixed[: len(kf_slots)].any():
            cam_fixed[int(np.argmin(kf_slots))] = True

        lm_pos = np.zeros((L, 3), np.float32)
        lm_valid = np.zeros(L, bool)
        for l, lm_id in enumerate(lm_ids):
            lm_pos[l] = map_db.landmarks[lm_id].pos_w
            lm_valid[l] = True
        # observation table assembled by the native map core (mapcore.cpp)
        lm_ids_arr = np.asarray(lm_ids + [-1] * (L - len(lm_ids)), np.int64)
        obs_cam, obs_idx, obs_valid = map_db.assoc_store.assemble_ba(
            lm_ids_arr, np.asarray(kf_slots, np.int64),
            np.arange(len(kf_slots), dtype=np.int32), D,
        )
        obs_uv = np.zeros((L, D, 2), np.float32)
        obs_xr = np.full((L, D), -1.0, np.float32)
        obs_w = np.ones((L, D), np.float32)
        inv_sigma = np.asarray(self.orb_params.inv_level_sigma_sq, np.float32)
        for s, kf_id in enumerate(kf_slots):
            kf = map_db.keyframes.get(kf_id)
            if kf is None:
                obs_valid[obs_cam == s] = False
                continue
            rows, ds = np.nonzero((obs_cam == s) & obs_valid)
            if len(rows) == 0:
                continue
            idxs = obs_idx[rows, ds]
            obs_uv[rows, ds] = kf.h_undist_xy[idxs]
            obs_xr[rows, ds] = kf.h_x_right[idxs]
            obs_w[rows, ds] = inv_sigma[kf.h_level[idxs]]

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

        prob = ba_mod.BAProblem(
            cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
            cam_fixed=jnp.asarray(cam_fixed), cam_valid=jnp.asarray(cam_valid),
            lm_pos=jnp.asarray(lm_pos), lm_valid=jnp.asarray(lm_valid),
            obs_cam=jnp.asarray(obs_cam), obs_uv=jnp.asarray(obs_uv),
            obs_x_right=jnp.asarray(obs_xr), obs_inv_sigma_sq=jnp.asarray(obs_w),
            obs_valid=jnp.asarray(obs_valid), lm_fixed=jnp.asarray(lm_fixed),
            lm_keep_inlier=jnp.asarray(lm_keep),
        )
        lm_ids_padded = lm_ids + [-1] * (L - len(lm_ids))
        kf_slots_padded = kf_slots + [-1] * (K - len(kf_slots))
        host = {"obs_cam": obs_cam, "obs_valid": obs_valid,
                "cam_fixed": cam_fixed}
        return prob, lm_ids_padded, kf_slots_padded, marker_rows, host
