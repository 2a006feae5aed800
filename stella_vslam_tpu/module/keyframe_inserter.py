"""Keyframe insertion policy + creation.

Reference: src/stella_vslam/module/keyframe_inserter.{h,cc} — interval bounds,
landmark-coverage ratio vs the reference keyframe, mapping-queue backpressure
veto (cc:51-128, decision expr cc:123-127); creation seeds depth landmarks for
stereo/RGBD (cc:160-212) and enqueues to the mapper (cc:218-231).
"""
from __future__ import annotations

import logging
import time as _time

import numpy as np

from stella_vslam_tpu.camera.base import Setup
from stella_vslam_tpu.data.frame import Frame
from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark

_log = logging.getLogger(__name__)


class KeyframeInserter:
    def __init__(self, camera, *, max_interval: float = 1.0, min_interval: float = 0.1,
                 max_distance: float = -1.0, min_distance: float = -1.0,
                 lms_ratio_thr_almost_all_lms_are_tracked: float = 0.9,
                 lms_ratio_thr_view_changed: float = 0.5, enough_lms_thr: int = 100):
        self.camera = camera
        self.max_interval = max_interval
        self.min_interval = min_interval
        self.max_distance = max_distance
        self.min_distance = min_distance
        self.ratio_almost_all = lms_ratio_thr_almost_all_lms_are_tracked
        self.ratio_view_changed = lms_ratio_thr_view_changed
        self.enough_lms_thr = enough_lms_thr
        self.mapper = None  # set by system
        self.marker_hook = None  # set by system when markers are configured

    @staticmethod
    def from_yaml(camera, node: dict) -> "KeyframeInserter":
        """Reference keyframe_inserter.cc:34-42 YAML surface.
        (`wait_for_local_bundle_adjustment` deliberately collapses: local BA
        here is a deferred device program overlapped with tracking, so
        insertion never blocks on it — see config._COLLAPSED_KEYS.)"""
        return KeyframeInserter(
            camera,
            max_interval=float(node.get("max_interval", 1.0)),
            min_interval=float(node.get("min_interval", 0.1)),
            max_distance=float(node.get("max_distance", -1.0)),
            min_distance=float(node.get("min_distance", -1.0)),
            lms_ratio_thr_almost_all_lms_are_tracked=float(
                node.get("lms_ratio_thr_almost_all_lms_are_tracked", 0.9)),
            lms_ratio_thr_view_changed=float(
                node.get("lms_ratio_thr_view_changed", 0.5)),
            enough_lms_thr=int(node.get("enough_lms_thr", 100)),
        )

    def new_keyframe_is_needed(self, map_db, cur_frm: Frame, num_tracked: int,
                               last_inserted_time: float, ref_keyfrm,
                               num_reliable: int = None) -> bool:
        """Reference decision expression (keyframe_inserter.cc:51-128):
        (max_interval | max_distance | view_changed | not_enough_lms)
        & (!enough_keyfrms | (min_interval & min_distance))
        & !tracking_is_unstable & !almost_all_lms_are_tracked
        & !mapper_is_skipping_localBA.
        `num_reliable` counts tracked landmarks with >= min_num_obs_thr
        observations (tracking_module.cc:143-148)."""
        if self.mapper is None:
            return False
        # backpressure veto (keyframe_inserter.cc:59-62)
        if self.mapper.is_paused() or self.mapper.pause_is_requested():
            return False
        num_keyfrms = map_db.num_keyframes()
        min_obs_thr = 3 if num_keyfrms >= 3 else 2
        num_reliable_in_ref = (
            ref_keyfrm.num_tracked_landmarks(map_db, min_obs_thr) if ref_keyfrm else 0
        )
        if num_reliable is None:
            num_reliable = num_tracked
        enough_keyfrms = num_keyfrms > 5
        dt = cur_frm.timestamp - last_inserted_time
        max_interval_elapsed = self.max_interval > 0 and dt >= self.max_interval
        min_interval_elapsed = self.min_interval <= 0 or dt >= self.min_interval
        max_distance_traveled = False
        min_distance_traveled = True
        if (self.max_distance > 0 or self.min_distance > 0) and ref_keyfrm is not None:
            last_kf = map_db.last_inserted_keyframe()
            if last_kf is not None:
                d = float(np.linalg.norm(last_kf.cam_center - cur_frm.cam_center))
                if self.max_distance > 0:
                    max_distance_traveled = d > self.max_distance
                if self.min_distance > 0:
                    min_distance_traveled = d > self.min_distance
        view_changed = num_reliable < num_reliable_in_ref * self.ratio_view_changed
        not_enough_lms = num_reliable < self.enough_lms_thr
        tracking_is_unstable = num_tracked < 15
        almost_all_lms_are_tracked = (
            num_reliable > num_reliable_in_ref * self.ratio_almost_all
        )
        return (
            (max_interval_elapsed or max_distance_traveled or view_changed
             or not_enough_lms)
            and (not enough_keyfrms
                 or (min_interval_elapsed and min_distance_traveled))
            and not tracking_is_unstable
            and not almost_all_lms_are_tracked
            and not self.mapper.is_skipping_localBA()
        )

    # ------------------------------------------------------------------
    def insert_new_keyframe(self, map_db, cur_frm: Frame) -> Keyframe:
        timing = _log.isEnabledFor(logging.DEBUG)
        _t = [_time.monotonic()] if timing else None
        kf = Keyframe(cur_frm, map_db)
        # register existing associations (one slot per landmark: a duplicate
        # slot would leave an orphan kf.lm_ids entry with no matching
        # landmark observation, corrupting covisibility counting).
        # Liveness/dedup vectorized; native store fed with ONE bulk call.
        lm_ids = kf.lm_ids
        occ = np.nonzero(lm_ids >= 0)[0]
        alive = map_db.fields.alive[lm_ids[occ]]
        _, first = np.unique(lm_ids[occ], return_index=True)
        keep_mask = np.zeros(len(occ), bool)
        keep_mask[first] = True
        keep_mask &= alive
        lm_ids[occ[~keep_mask]] = -1
        kept = occ[keep_mask]
        kept_ids = lm_ids[kept]
        map_db.assoc_store.add_bulk(
            kept_ids, np.full(len(kept), kf.id, np.int64), kept)
        kfid = kf.id
        dead = []
        for lm_id, idx in zip(kept_ids.tolist(), kept.tolist()):
            lm = map_db.landmarks.get(lm_id)
            if lm is not None and not lm.will_be_erased:
                lm.observations[kfid] = idx
            else:
                # erased by the mapper between the alive-snapshot read and
                # the bulk insert: undo the native-store entry, or the store
                # would carry a resurrected observation with no dict mirror
                dead.append((lm_id, idx))
        for lm_id, idx in dead:
            map_db.assoc_store.erase(lm_id, kfid)
            lm_ids[idx] = -1
        if timing:
            _t.append(_time.monotonic())
        map_db.add_keyframe(kf)
        if timing:
            _t.append(_time.monotonic())
        # landmark stats after the new observations (reference
        # keyframe::update_landmarks, keyframe.cc:430-447) ride the mapper
        # event's ONE consolidated refresh (MappingModule._event_start ->
        # _flush_dirty_stats) instead of a separate call here on the
        # tracker's finalize thread — same landmarks, refreshed once
        if timing:
            _t.append(_time.monotonic())

        # stereo/RGBD: seed landmarks from depth, nearest >= 100
        # (keyframe_inserter.cc:160-212)
        if self.camera.setup != Setup.MONOCULAR:
            self._seed_depth_landmarks(map_db, kf)

        # marker registration (reference keyframe_inserter.cc:138-153)
        if self.marker_hook is not None:
            self.marker_hook(map_db, kf, cur_frm)
        kf.graph_node.update_connections(map_db)
        if self.mapper is not None:
            self.mapper.async_add_keyframe(kf)
        if timing:
            _t.append(_time.monotonic())
            _log.debug(
                "kf %d insert: obs=%.1f add=%.1f stats=%.1f conn=%.1f ms",
                kf.id, *[(_t[i + 1] - _t[i]) * 1e3 for i in range(4)])
        return kf

    def _seed_depth_landmarks(self, map_db, kf: Keyframe):
        depths = kf.h_depths
        valid = kf.h_valid
        order = np.argsort(np.where(depths > 0, depths, np.inf))
        depth_thr = float(self.camera.params.depth_thr)
        created = 0
        seeded = []
        R_wc = kf.rot_cw.T
        t_wc = -R_wc @ kf.trans_cw
        p = self.camera.params
        fx, fy, cx, cy = map(float, (p.fx, p.fy, p.cx, p.cy))
        und = kf.h_undist_xy
        for idx in order:
            z = depths[idx]
            if z <= 0 or not np.isfinite(z):
                break  # sorted: no more positive depths
            if not valid[idx]:
                continue
            if kf.lm_ids[idx] >= 0:
                continue
            if z > depth_thr and created >= 100:
                break
            x = (und[idx, 0] - cx) * z / fx
            y = (und[idx, 1] - cy) * z / fy
            pos_w = R_wc @ np.array([x, y, z]) + t_wc
            lm = Landmark(map_db.next_landmark_id(), pos_w, kf.id)
            lm.add_observation(kf.id, int(idx))
            kf.add_landmark(lm.id, int(idx))
            map_db.add_landmark(lm)
            seeded.append(lm)
            created += 1
        map_db.batch_refresh_landmark_stats(seeded, kf.orb_params.scale_factors)
