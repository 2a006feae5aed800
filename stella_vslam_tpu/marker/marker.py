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
        # frozen marker (e.g. loaded from a prebuilt map): its corners act as
        # fixed anchors in BA (reference data/marker.h keep_fixed_)
        self.keep_fixed = False

    def add_observation(self, keyfrm_id: int, m2d):
        self.observations[keyfrm_id] = m2d


def append_marker_rows(map_db, slot_of, lm_pos, lm_valid, lm_fixed,
                       obs_cam, obs_uv, obs_w, obs_valid, *, start_row: int,
                       lm_keep_inlier=None):
    """Append marker corner rows to a padded BA problem (host arrays mutated
    in place). Each initialized-or-fixed marker observed by a keyframe in
    `slot_of` contributes 4 point rows with unit-weight 2D reprojection edges
    to every observing keyframe present in the problem (reference
    local_bundle_adjuster_g2o.cc:250-304, global_bundle_adjuster marker
    vertices). Returns [(marker, corner_idx, row)] for corner write-back."""
    L, D = obs_valid.shape
    rows = []
    row = start_row
    for mk in map_db.markers.values():
        if row + 4 > L:
            break
        if (not mk.initialized and not mk.keep_fixed) or mk.corners_world is None:
            continue
        obs = [
            (slot_of[k], m2d) for k, m2d in mk.observations.items()
            if k in slot_of
        ]
        if not obs:
            continue
        for ci in range(4):
            lm_pos[row] = mk.corners_world[ci]
            lm_valid[row] = True
            lm_fixed[row] = mk.keep_fixed
            if lm_keep_inlier is not None:
                lm_keep_inlier[row] = True
            for d, (s, m2d) in enumerate(obs[:D]):
                obs_cam[row, d] = s
                obs_uv[row, d] = m2d.undist_corners_2d[ci]
                obs_w[row, d] = 1.0
                obs_valid[row, d] = True
            rows.append((mk, ci, row))
            row += 1
    return rows


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
