"""Landmark and keyframe culling policies.

Reference: src/stella_vslam/module/local_map_cleaner.{h,cc}:
* landmarks: observed-ratio < 0.3, or still <= 2 observations two keyframes
  after creation (cc:12-13, 39-44)
* keyframes: >= 90% of valid observations are redundant — seen >= 3 more
  times at the same or finer scale by other keyframes (cc:68-123)
"""
from __future__ import annotations

from typing import List


class LocalMapCleaner:
    def __init__(self, observed_ratio_thr: float = 0.3,
                 num_reliable_keyfrms: int = 2,
                 num_obs_thr: int = 2,
                 redundant_obs_ratio_thr: float = 0.9):
        self.observed_ratio_thr = observed_ratio_thr
        self.num_reliable_keyfrms = num_reliable_keyfrms
        self.num_obs_thr = num_obs_thr
        self.redundant_obs_ratio_thr = redundant_obs_ratio_thr
        self.fresh_landmark_ids: List[int] = []

    def add_fresh_landmark(self, lm_id: int):
        self.fresh_landmark_ids.append(lm_id)

    # ------------------------------------------------------------------
    def remove_invalid_landmarks(self, map_db, cur_keyfrm_id: int) -> int:
        """Reference local_map_cleaner.cc:20-67: a fresh landmark is culled
        only when its observed ratio drops below the threshold; it GRADUATES
        (leaves the fresh buffer, kept forever) once `num_reliable_keyfrms`
        keyframes passed since its creation; otherwise the decision is held.
        (No observation-count rule — stella removed ORB-SLAM's.)"""
        removed = 0
        keep = []
        for lm_id in self.fresh_landmark_ids:
            lm = map_db.landmarks.get(lm_id)
            if lm is None or lm.will_be_erased:
                continue
            if lm.get_observed_ratio() < self.observed_ratio_thr:
                map_db.erase_landmark(lm_id)
                removed += 1
            elif self.num_reliable_keyfrms + lm.first_keyfrm_id < cur_keyfrm_id:
                pass  # graduated
            else:
                keep.append(lm_id)
        self.fresh_landmark_ids = keep
        return removed

    # ------------------------------------------------------------------
    def remove_redundant_keyframes(self, map_db, cur_keyfrm) -> int:
        removed = 0
        for kf_id in cur_keyfrm.graph_node.get_covisibilities():
            kf = map_db.keyframes.get(kf_id)
            if kf is None or kf.will_be_erased or not kf.can_be_erased():
                continue
            if kf.id in map_db.spanning_roots:
                continue
            if kf.id <= map_db.fixed_keyframe_id_threshold:
                continue
            num_valid, num_redundant = self._count_redundant(map_db, kf)
            if num_valid > 0 and num_redundant > self.redundant_obs_ratio_thr * num_valid:
                map_db.erase_keyframe(kf.id)
                removed += 1
        return removed

    def _count_redundant(self, map_db, kf):
        # native map core: one call over the slot arrays instead of a Python
        # double loop (slots x observations) — reference semantics preserved
        # (local_map_cleaner.cc:68-123; stereo-far exclusion N/A, mono slice)
        return map_db.assoc_store.count_redundant(kf.id, kf.lm_ids, kf.h_level)
