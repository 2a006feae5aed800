"""Tracking module: per-frame pose estimation state machine.

Reference: src/stella_vslam/tracking_module.{h,cc} — {Initializing, Tracking,
Lost} states (cc:153-167), monocular initialization, 3-tier tracking cascade
(motion-model -> keyframe match -> robust match, frame_tracker.cc), local-map
tracking, keyframe-need decision, motion-model update (cc:401-413), auto
relocalization-on-lost and auto-reset when loss occurs within 5 s of
initialization (cc:26-28, 162-166).

TPU-native data flow per frame: the device programs in
module/tracking_kernels.py consume the frame's slot tensors and the
device-resident landmark table; the host reads back the pose, per-slot
association indices and the table observability mask, and updates the map
bookkeeping.
"""
from __future__ import annotations

import time
from typing import Optional

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

STATE_INITIALIZING = "Initializing"
STATE_TRACKING = "Tracking"
STATE_LOST = "Lost"


class TrackingModule:
    def __init__(self, map_db, camera, orb_params, *,
                 enable_auto_relocalization: bool = True,
                 use_fixed_seed: bool = False,
                 num_matches_thr: int = 10,
                 min_num_tracked_lms: int = 20):
        self.map_db = map_db
        self.camera = camera
        self.orb_params = orb_params
        self.kernels = TrackingKernels(camera, orb_params)
        self.initializer = Initializer(camera, orb_params, use_fixed_seed=use_fixed_seed)
        self.keyfrm_inserter = KeyframeInserter(camera)
        self.relocalizer = None  # wired by system once BoW exists
        self.mapper = None
        self.num_matches_thr = num_matches_thr
        self.min_num_tracked_lms = min_num_tracked_lms

        self.state = STATE_INITIALIZING
        self.last_frm: Optional[Frame] = None
        self.ref_keyfrm_id: Optional[int] = None
        self.twist: Optional[np.ndarray] = None  # velocity (4x4)
        self.last_keyfrm_time = 0.0
        self.init_time = 0.0
        self.last_reloc_frm_id = -10
        self.num_tracked_lms = 0
        self.mapping_is_enabled = True

    # ------------------------------------------------------------------
    def feed_frame(self, frm: Frame) -> Optional[np.ndarray]:
        if self.state == STATE_INITIALIZING:
            if not self._initialize(frm):
                self.last_frm = frm
                return None
            self.state = STATE_TRACKING
            self.init_time = frm.timestamp
            self.last_frm = frm
            return frm.pose_cw
        ok = self._track(frm)
        if not ok:
            if self.state == STATE_TRACKING:
                if frm.timestamp - self.init_time < 5.0 and self.mapping_is_enabled:
                    # lost right after initialization -> reset (cc:162-166)
                    self.reset()
                    return None
                self.state = STATE_LOST
            # try relocalization
            if self.relocalizer is not None:
                if self._relocalize(frm):
                    self.state = STATE_TRACKING
                    self.last_reloc_frm_id = frm.id
                    ok = True
        else:
            self.state = STATE_TRACKING
        self.last_frm = frm
        return frm.pose_cw if ok else None

    # ------------------------------------------------------------------
    def reset(self):
        self.map_db.clear()
        self.initializer.reset()
        self.state = STATE_INITIALIZING
        self.last_frm = None
        self.twist = None
        self.ref_keyfrm_id = None
        if self.mapper is not None:
            self.mapper.cleaner.fresh_landmark_ids = []

    # ------------------------------------------------------------------
    def _initialize(self, frm: Frame) -> bool:
        if self.camera.setup == Setup.MONOCULAR:
            if not self.initializer.try_initialize_monocular(frm):
                return False
            return self._create_map_for_monocular(frm)
        else:
            return self._create_map_for_stereo(frm)

    def _create_map_for_monocular(self, cur_frm: Frame) -> bool:
        init = self.initializer
        ref_frm = init.init_frame
        map_db = self.map_db

        ref_frm.set_pose_cw(np.eye(4))
        T = np.eye(4)
        T[:3, :3] = init.R_21
        T[:3, 3] = init.t_21
        cur_frm.set_pose_cw(T)

        ref_kf = Keyframe(ref_frm, map_db)
        map_db.add_keyframe(ref_kf)
        cur_kf = Keyframe(cur_frm, map_db)
        map_db.add_keyframe(cur_kf)

        matches = init.init_matches  # per-ref-slot cur idx
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
            map_db.clear()
            init.reset()
            return False
        ref_kf.graph_node.update_connections(map_db)
        cur_kf.graph_node.update_connections(map_db)

        # global BA on the init map (initializer.cc create_map path)
        self._init_map_ba(ref_kf, cur_kf)
        cur_frm.set_pose_cw(cur_kf.pose_cw)

        self.ref_keyfrm_id = cur_kf.id
        cur_frm.ref_keyfrm_id = cur_kf.id
        self.last_keyfrm_time = cur_frm.timestamp
        map_db.refresh_device_table()
        if self.mapper is not None:
            self.mapper.async_add_keyframe(ref_kf)
            self.mapper.async_add_keyframe(cur_kf)
        self.twist = None
        return True

    def _init_map_ba(self, kf1: Keyframe, kf2: Keyframe):
        """Small full-map BA over the 2-keyframe init map."""
        map_db = self.map_db
        lm_ids = sorted(map_db.landmarks.keys())
        L = max(64, 1 << int(np.ceil(np.log2(max(len(lm_ids), 2)))))
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
        camR = np.asarray(res.cam_R)
        camt = np.asarray(res.cam_t)
        T = np.eye(4)
        T[:3, :3] = camR[1]
        T[:3, 3] = camt[1]
        kf2.set_pose_cw(T)
        lm_new = np.asarray(res.lm_pos)
        for l, lm_id in enumerate(lm_ids):
            lm = map_db.landmarks.get(lm_id)
            if lm is not None:
                lm.pos_w = lm_new[l].astype(np.float64)
                lm.update_mean_normal_and_obs_scale_variance(map_db)

    def _create_map_for_stereo(self, cur_frm: Frame) -> bool:
        """Instant map from depth (initializer.h:124-128)."""
        depths = cur_frm.h_depths
        if (depths > 0).sum() < 50:
            return False
        cur_frm.set_pose_cw(np.eye(4))
        kf = Keyframe(cur_frm, self.map_db)
        self.map_db.add_keyframe(kf)
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
    def _track(self, frm: Frame) -> bool:
        last = self.last_frm
        if last is None or last.pose_cw is None:
            return False
        k = self.kernels

        # ---- stage 1: initial pose ----
        res = None
        src_frame = last
        if self.state == STATE_TRACKING and self.twist is not None:
            pred = self.twist @ last.pose_cw
            last_pos, last_has = self._assoc_positions(last)
            for margin in (k.margin_last, 2 * k.margin_last):
                res = k.motion_track(
                    frm.undist_xy, frm.feats.level, frm.feats.desc,
                    frm.feats.valid, frm.feats.angle, frm.x_right,
                    last.feats.desc, last.feats.level, last.feats.angle,
                    jnp.asarray(last_has), jnp.asarray(last_pos),
                    jnp.asarray(pred[:3, :3], dtype=jnp.float32),
                    jnp.asarray(pred[:3, 3], dtype=jnp.float32),
                    jnp.float32(margin),
                )
                if int(res.num_inliers) >= self.num_matches_thr:
                    break
                res = None
        if res is None:
            # stage 2: match against the reference keyframe
            ref_kf = self.map_db.keyframes.get(self.ref_keyfrm_id)
            if ref_kf is None:
                return False
            kf_pos, kf_has = self._assoc_positions(ref_kf)
            res = k.keyframe_track(
                frm.undist_xy, frm.feats.level, frm.feats.desc,
                frm.feats.valid, frm.feats.angle, frm.x_right,
                ref_kf.feats.desc, ref_kf.feats.angle, jnp.asarray(kf_has),
                jnp.asarray(kf_pos),
                jnp.asarray(last.pose_cw[:3, :3], dtype=jnp.float32),
                jnp.asarray(last.pose_cw[:3, 3], dtype=jnp.float32),
            )
            src_frame = ref_kf
            if int(res.num_inliers) < self.num_matches_thr:
                return False

        # host bookkeeping of stage-1 associations
        assoc_ref = np.asarray(res.assoc_ref)
        frm.lm_ids[:] = -1
        src_lm_ids = src_frame.lm_ids
        sel = assoc_ref >= 0
        frm.lm_ids[sel] = src_lm_ids[assoc_ref[sel]]

        # ---- stage 2: local-map tracking over the device landmark table ----
        tbl = self.map_db.device_table
        if tbl.pos is None:
            self.map_db.refresh_device_table()
            tbl = self.map_db.device_table
        margin = (
            k.margin_local_unstable
            if frm.id < self.last_reloc_frm_id + 2
            else k.margin_local
        )
        assoc_valid = jnp.asarray(frm.lm_ids >= 0)
        res2, observable = k.local_map_track(
            frm.undist_xy, frm.feats.level, frm.feats.desc, frm.feats.valid,
            frm.feats.angle, frm.x_right,
            res.assoc_pos, assoc_valid,
            tbl.pos, tbl.desc, tbl.normal, tbl.min_dist, tbl.max_dist, tbl.valid,
            res.R_cw, res.t_cw, jnp.float32(margin),
        )
        num_tracked = int(res2.num_inliers)
        if num_tracked < self.min_num_tracked_lms // (
            2 if frm.id < self.last_reloc_frm_id + 2 else 1
        ):
            return False

        # pose + association readback
        T = np.eye(4)
        T[:3, :3] = np.asarray(res2.R_cw)
        T[:3, 3] = np.asarray(res2.t_cw)
        frm.set_pose_cw(T)
        new_src = np.asarray(res2.assoc_ref)
        inlier = np.asarray(res2.inlier)
        sel_new = new_src >= 0
        frm.lm_ids[sel_new] = tbl.ids[new_src[sel_new]]
        frm.lm_ids[~inlier & ~sel_new & (frm.lm_ids >= 0)] = -1

        # observability counters (tracking_module.cc search_local_landmarks)
        obs_mask = np.asarray(observable)
        with self.map_db.lock:
            for row in np.nonzero(obs_mask[: tbl.count])[0]:
                lm = self.map_db.landmarks.get(int(tbl.ids[row]))
                if lm is not None:
                    lm.increase_num_observable()
            for lm_id in frm.lm_ids[frm.lm_ids >= 0]:
                lm = self.map_db.landmarks.get(int(lm_id))
                if lm is not None:
                    lm.increase_num_observed()
        self.num_tracked_lms = num_tracked

        # ---- motion model (cc:401-413) ----
        last_pose_wc = np.linalg.inv(last.pose_cw)
        self.twist = frm.pose_cw @ last_pose_wc

        # ---- keyframe insertion ----
        if self.mapping_is_enabled:
            ref_kf = self.map_db.keyframes.get(self.ref_keyfrm_id)
            if self.keyfrm_inserter.new_keyframe_is_needed(
                self.map_db, frm, num_tracked, self.last_keyfrm_time, ref_kf
            ):
                kf = self.keyfrm_inserter.insert_new_keyframe(self.map_db, frm)
                self.ref_keyfrm_id = kf.id
                self.last_keyfrm_time = frm.timestamp
        frm.ref_keyfrm_id = self.ref_keyfrm_id
        return True

    # ------------------------------------------------------------------
    def _assoc_positions(self, frame_like):
        """Per-slot landmark world positions + mask (host numpy)."""
        n = frame_like.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        for i in np.nonzero(frame_like.lm_ids >= 0)[0]:
            lm = self.map_db.landmarks.get(int(frame_like.lm_ids[i]))
            if lm is None or lm.will_be_erased:
                frame_like.lm_ids[i] = -1
                continue
            pos[i] = lm.pos_w
            has[i] = True
        return pos, has

    # ------------------------------------------------------------------
    def _relocalize(self, frm: Frame) -> bool:
        if self.relocalizer is None:
            return False
        return self.relocalizer.relocalize(self.map_db, frm)
