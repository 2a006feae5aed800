"""Tracking module: per-frame pose estimation state machine (pipelined).

Reference: src/stella_vslam/tracking_module.{h,cc} — {Initializing, Tracking,
Lost} states (cc:153-167), monocular initialization, 3-tier tracking cascade
(motion-model -> keyframe match -> robust match, frame_tracker.cc), local-map
tracking, keyframe-need decision, motion-model update (cc:401-413), auto
relocalization-on-lost and auto-reset when loss occurs within 5 s of
initialization (cc:26-28, 162-166).

TPU-native pipelining: the whole cascade is ONE device program
(module/tracking_kernels.track_frame). feed_frame() FINALIZES the previous
frame's result (its readbacks have been in flight while the caller prepared
this frame's image) and then DISPATCHES the current frame without any
synchronization — so device compute of frame t overlaps host work and the
upload of frame t+1. Association state chains on-device between frames
(assoc_pos/assoc_valid), eliminating per-frame host map uploads.
"""
from __future__ import annotations

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


class _Pending:
    __slots__ = ("frm", "out", "last_frm", "ref_kf", "last_pose_cw", "used_motion")

    def __init__(self, frm, out, last_frm, ref_kf, last_pose_cw, used_motion):
        self.frm = frm
        self.out = out
        self.last_frm = last_frm
        self.ref_kf = ref_kf
        self.last_pose_cw = last_pose_cw
        self.used_motion = used_motion


class TrackingModule:
    def __init__(self, map_db, camera, orb_params, *,
                 enable_auto_relocalization: bool = True,
                 use_fixed_seed: bool = False,
                 num_matches_thr: int = 10,
                 min_num_tracked_lms: int = 20):
        self.map_db = map_db
        self.camera = camera
        self.orb_params = orb_params
        self.kernels = TrackingKernels(camera, orb_params,
                                       num_matches_thr=num_matches_thr)
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
        self.num_tracked_lms = 0
        self.mapping_is_enabled = True

        self._pending: Optional[_Pending] = None
        # device-chained association state of the last tracked frame
        self._last_assoc_pos = None  # [N,3] device
        self._last_assoc_valid = None  # [N] device
        # reference-keyframe device association arrays
        self._kf_assoc_pos = None
        self._kf_assoc_valid = None
        self._kf_for_assoc = None
        # finalized per-frame results: (frame_id, ts, pose_cw|None, ref_kf_id)
        self.finalized = []

    # ------------------------------------------------------------------
    def feed_frame(self, frm: Frame) -> Optional[np.ndarray]:
        """Dispatch tracking for `frm`; returns the pose of the PREVIOUSLY
        finalized frame when pipelining (None during init/loss). Finalized
        per-frame poses accumulate in self.finalized."""
        self.finalize_pending()

        if self.state == STATE_INITIALIZING:
            ok = self._initialize(frm)
            if ok:
                self.state = STATE_TRACKING
                self.init_time = frm.timestamp
                self._set_chain_from_frame(frm)
            self.last_frm = frm
            self.finalized.append(
                (frm.id, frm.timestamp,
                 frm.pose_cw.copy() if ok else None, frm.ref_keyfrm_id, None)
            )
            return frm.pose_cw if ok else None

        if self.state == STATE_LOST:
            ok = self._relocalize(frm)
            self.last_frm = frm
            self.finalized.append(
                (frm.id, frm.timestamp,
                 frm.pose_cw.copy() if ok else None, frm.ref_keyfrm_id, None)
            )
            if ok:
                self.state = STATE_TRACKING
                self.last_reloc_frm_id = frm.id
                self._set_chain_from_frame(frm)
                self.twist = None
            return frm.pose_cw if ok else None

        # STATE_TRACKING: dispatch without synchronization
        self._dispatch(frm)
        return self.last_frm.pose_cw if self.last_frm is not None else None

    # ------------------------------------------------------------------
    def _dispatch(self, frm: Frame):
        last = self.last_frm
        k = self.kernels
        use_motion = self.twist is not None and self._last_assoc_pos is not None
        pred = (self.twist @ last.pose_cw) if use_motion else last.pose_cw
        ref_kf = self.map_db.keyframes.get(self.ref_keyfrm_id)
        if ref_kf is None:
            # no reference keyframe: cannot track
            self.state = STATE_LOST
            return
        if self._kf_for_assoc is not ref_kf:
            self._refresh_kf_assoc(ref_kf)
        tbl = self.map_db.device_table
        if tbl.pos is None:
            self.map_db.refresh_device_table()
            tbl = self.map_db.device_table
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
        out = k.track_frame(
            frm.undist_xy, frm.feats.level, frm.feats.desc, frm.feats.valid,
            frm.feats.angle, frm.x_right,
            last.feats.desc, last.feats.level, last.feats.angle,
            la_pos, la_valid,
            ref_kf.feats.desc, ref_kf.feats.angle,
            self._kf_assoc_pos, self._kf_assoc_valid,
            tbl.pos, tbl.desc, tbl.normal, tbl.min_dist, tbl.max_dist, tbl.valid,
            jnp.asarray(pred[:3, :3], dtype=jnp.float32),
            jnp.asarray(pred[:3, 3], dtype=jnp.float32),
            jnp.asarray(last.pose_cw[:3, :3], dtype=jnp.float32),
            jnp.asarray(last.pose_cw[:3, 3], dtype=jnp.float32),
            jnp.float32(margin),
            use_motion=use_motion,
        )
        # start async copies of the small outputs (overlap with next frame)
        for arr in (out.R_cw, out.t_cw, out.src_idx, out.counts, out.inlier,
                    out.observable):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
        self._pending = _Pending(frm, out, last, ref_kf, last.pose_cw, use_motion)
        # chain device state immediately (used by the NEXT dispatch)
        self._last_assoc_pos = out.assoc_pos
        self._last_assoc_valid = out.assoc_valid
        self.last_frm = frm

    # ------------------------------------------------------------------
    def finalize_pending(self):
        p = self._pending
        if p is None:
            return
        self._pending = None
        frm, out = p.frm, p.out
        counts = np.asarray(out.counts)
        num_final = int(counts[3])
        used_fallback = bool(counts[1])
        stage1_fail = used_fallback and p.used_motion

        min_needed = self.min_num_tracked_lms // (
            2 if frm.id < self.last_reloc_frm_id + 2 else 1
        )
        tracked_ok = num_final >= min_needed
        if used_fallback:
            # the fallback stage itself must have met the match threshold
            tracked_ok = tracked_ok and num_final >= self.num_matches_thr

        if not tracked_ok:
            self._on_lost(frm)
            return

        T = np.eye(4)
        T[:3, :3] = np.asarray(out.R_cw)
        T[:3, 3] = np.asarray(out.t_cw)
        frm.set_pose_cw(T)

        # association bookkeeping
        src = np.asarray(out.src_idx)
        tbl = self.map_db.device_table
        frm.lm_ids[:] = -1
        s_last, s_kf, s_tbl = src[0], src[1], src[2]
        sel = s_last >= 0
        if sel.any() and p.last_frm is not None:
            frm.lm_ids[sel] = p.last_frm.lm_ids[s_last[sel]]
        sel = s_kf >= 0
        if sel.any():
            frm.lm_ids[sel] = p.ref_kf.lm_ids[s_kf[sel]]
        sel = s_tbl >= 0
        if sel.any():
            frm.lm_ids[sel] = tbl.ids[s_tbl[sel]]
        # drop associations that didn't survive (mapped but outlier)
        inlier = np.asarray(out.inlier)
        frm.lm_ids[~inlier] = -1

        # observability counters (vectorized into the table registry)
        obs_mask = np.asarray(out.observable)
        tbl.bump_observable(obs_mask)
        tbl.bump_observed(frm.lm_ids)

        self.num_tracked_lms = num_final
        self.twist = frm.pose_cw @ np.linalg.inv(p.last_pose_cw)
        del stage1_fail

        # keyframe insertion
        if self.mapping_is_enabled:
            ref_kf = self.map_db.keyframes.get(self.ref_keyfrm_id)
            if self.keyfrm_inserter.new_keyframe_is_needed(
                self.map_db, frm, num_final, self.last_keyfrm_time, ref_kf
            ):
                kf = self.keyfrm_inserter.insert_new_keyframe(self.map_db, frm)
                self.ref_keyfrm_id = kf.id
                self.last_keyfrm_time = frm.timestamp
        frm.ref_keyfrm_id = self.ref_keyfrm_id
        # frame statistics: relative pose to the reference keyframe so the
        # exported trajectory benefits from later keyframe-pose refinement
        # (reference data/frame_statistics + io/trajectory_io.cc:20-60)
        rel = None
        ref = self.map_db.keyframes.get(self.ref_keyfrm_id)
        if ref is not None:
            rel = frm.pose_cw @ np.linalg.inv(ref.pose_cw)
        self.finalized.append(
            (frm.id, frm.timestamp, frm.pose_cw.copy(), frm.ref_keyfrm_id, rel)
        )

    def _on_lost(self, frm: Frame):
        self.finalized.append((frm.id, frm.timestamp, None, frm.ref_keyfrm_id, None))
        if frm.timestamp - self.init_time < 5.0 and self.mapping_is_enabled \
                and self.camera.setup == Setup.MONOCULAR:
            self.reset()
            return
        self.state = STATE_LOST
        self.twist = None
        self._last_assoc_pos = None
        self._last_assoc_valid = None

    # ------------------------------------------------------------------
    def _set_chain_from_frame(self, frm: Frame):
        """Build device association state from a frame's host lm_ids (used
        after init / reloc / keyframe-seeded maps)."""
        n = frm.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        for i in np.nonzero(frm.lm_ids >= 0)[0]:
            lm = self.map_db.landmarks.get(int(frm.lm_ids[i]))
            if lm is None or lm.will_be_erased:
                continue
            pos[i] = lm.pos_w
            has[i] = True
        self._last_assoc_pos = jnp.asarray(pos)
        self._last_assoc_valid = jnp.asarray(has)

    def _refresh_kf_assoc(self, kf: Keyframe):
        n = kf.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        for i in np.nonzero(kf.lm_ids >= 0)[0]:
            lm = self.map_db.landmarks.get(int(kf.lm_ids[i]))
            if lm is None or lm.will_be_erased:
                continue
            pos[i] = lm.pos_w
            has[i] = True
        self._kf_assoc_pos = jnp.asarray(pos)
        self._kf_assoc_valid = jnp.asarray(has)
        self._kf_for_assoc = kf

    # ------------------------------------------------------------------
    def reset(self):
        self._pending = None
        self.map_db.clear()
        self.initializer.reset()
        self.state = STATE_INITIALIZING
        self.last_frm = None
        self.twist = None
        self.ref_keyfrm_id = None
        self._last_assoc_pos = None
        self._last_assoc_valid = None
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

        ref_frm.set_pose_cw(np.eye(4))
        T = np.eye(4)
        T[:3, :3] = init.R_21
        T[:3, 3] = init.t_21
        cur_frm.set_pose_cw(T)

        ref_kf = Keyframe(ref_frm, map_db)
        map_db.add_keyframe(ref_kf)
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
            map_db.clear()
            init.reset()
            return False
        ref_kf.graph_node.update_connections(map_db)
        cur_kf.graph_node.update_connections(map_db)

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
    def _relocalize(self, frm: Frame) -> bool:
        if self.relocalizer is None:
            return False
        return self.relocalizer.relocalize(self.map_db, frm)
