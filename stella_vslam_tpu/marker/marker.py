"""World-space marker + initialization policy.

Reference: src/stella_vslam/data/marker.{h,cc} (4 world corners + keyframe
observations) and module/marker_initializer.{h,cc} (initialize the marker's
world pose once observed in >= N keyframes, default 3, averaging the per-view
estimates).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


class Marker:
    def __init__(self, marker_id: int, model):
        self.id = marker_id
        self.model = model
        self.corners_world = None  # [4,3] once initialized
        self.observations: Dict[int, "object"] = {}  # keyframe id -> Marker2D
        self.initialized = False

    def add_observation(self, keyfrm_id: int, m2d):
        self.observations[keyfrm_id] = m2d


class MarkerInitializer:
    def __init__(self, min_num_views: int = 3):
        self.min_num_views = min_num_views

    def check_marker_initialization(self, marker: Marker, map_db) -> bool:
        """Average the per-view world poses once enough keyframes saw the
        marker (reference marker_initializer.cc)."""
        if marker.initialized or len(marker.observations) < self.min_num_views:
            return marker.initialized
        corner_sets = []
        for kf_id, m2d in marker.observations.items():
            kf = map_db.keyframes.get(kf_id)
            if kf is None or kf.will_be_erased:
                continue
            R_wc = kf.rot_cw.T
            t_wc = -R_wc @ kf.trans_cw
            # marker corners in camera frame -> world
            cam_corners = marker.model.corners_pos @ m2d.rot_cm.T + m2d.trans_cm
            corner_sets.append(cam_corners @ R_wc.T + t_wc)
        if len(corner_sets) < self.min_num_views:
            return False
        marker.corners_world = np.mean(corner_sets, axis=0)
        marker.initialized = True
        return True
