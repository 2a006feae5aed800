"""Keyframe: immutable observation + mutable pose + graph node.

Reference: src/stella_vslam/data/keyframe.{h,cc} — landmark slots (one per
keypoint), covisibility graph_node, erase protocol, median depth, json/sqlite
serialization schema (keyframe.h:88-102).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from stella_vslam_tpu.data.frame import Frame
from stella_vslam_tpu.data.graph_node import GraphNode


class Keyframe:
    def __init__(self, frame: Frame, map_db, keyfrm_id: Optional[int] = None):
        self.id = map_db.next_keyframe_id() if keyfrm_id is None else keyfrm_id
        self.src_frm_id = frame.id
        self.timestamp = frame.timestamp
        self.camera = frame.camera
        self.orb_params = frame.orb_params
        self.num_slots = frame.num_slots

        # device tensors shared with the source frame (immutable observation)
        self.feats = frame.feats
        self.undist_xy = frame.undist_xy
        self.bearings = frame.bearings
        self.x_right = frame.x_right
        self.depths = frame.depths

        # host mirrors (share the frame's cache)
        self._frame_ref = frame
        self.lm_ids = frame.lm_ids.copy()
        self.pose_cw = frame.pose_cw.copy()
        self.graph_node = GraphNode(self, map_db.min_num_shared_lms)
        self.will_be_erased = False
        self._not_to_be_erased = False

    # host mirrors delegate to the frame cache
    @property
    def h_xy(self):
        return self._frame_ref.h_xy

    @property
    def h_undist_xy(self):
        return self._frame_ref.h_undist_xy

    @property
    def h_bearings(self):
        return self._frame_ref.h_bearings

    @property
    def h_level(self):
        return self._frame_ref.h_level

    @property
    def h_angle(self):
        return self._frame_ref.h_angle

    @property
    def h_valid(self):
        return self._frame_ref.h_valid

    @property
    def h_desc(self):
        return self._frame_ref.h_desc

    @property
    def h_x_right(self):
        return self._frame_ref.h_x_right

    @property
    def h_depths(self):
        return self._frame_ref.h_depths

    # ---- pose ----
    def set_pose_cw(self, pose_cw: np.ndarray):
        self.pose_cw = np.asarray(pose_cw, dtype=np.float64).copy()

    @property
    def rot_cw(self):
        return self.pose_cw[:3, :3]

    @property
    def trans_cw(self):
        return self.pose_cw[:3, 3]

    @property
    def pose_wc(self):
        T = np.eye(4)
        T[:3, :3] = self.rot_cw.T
        T[:3, 3] = -self.rot_cw.T @ self.trans_cw
        return T

    @property
    def cam_center(self):
        return -self.rot_cw.T @ self.trans_cw

    # ---- landmark slots ----
    def add_landmark(self, lm_id: int, idx: int):
        self.lm_ids[idx] = lm_id

    def erase_landmark_with_index(self, idx: int):
        self.lm_ids[idx] = -1

    def get_valid_landmark_ids(self):
        return self.lm_ids[self.lm_ids >= 0]

    def num_tracked_landmarks(self, map_db, min_num_obs: int = 1) -> int:
        cnt = 0
        for lm_id in self.lm_ids:
            if lm_id < 0:
                continue
            lm = map_db.landmarks.get(int(lm_id))
            if lm and not lm.will_be_erased and lm.num_observations() >= min_num_obs:
                cnt += 1
        return cnt

    def compute_median_depth(self, map_db, use_abs: bool = False) -> float:
        """Median z (camera frame) of associated landmarks
        (reference keyframe.h:206-211)."""
        R, t = self.rot_cw, self.trans_cw
        zs = []
        for lm_id in self.lm_ids:
            if lm_id < 0:
                continue
            lm = map_db.landmarks.get(int(lm_id))
            if lm is None or lm.will_be_erased:
                continue
            z = float(R[2] @ lm.pos_w + t[2])
            zs.append(abs(z) if use_abs else z)
        return float(np.median(zs)) if zs else 0.0

    # ---- erase protocol (reference keyframe.h:232-250) ----
    def set_not_to_be_erased(self, flag: bool = True):
        self._not_to_be_erased = flag

    def can_be_erased(self) -> bool:
        return not self._not_to_be_erased

    # ---- serialization (msgpack-style json, reference map json schema) ----
    def to_json(self) -> dict:
        n = self.num_slots
        valid = self.h_valid
        return {
            "ts": self.timestamp,
            "cam": self.camera.name,
            "orb_params": self.orb_params.name,
            "pose_cw": self.pose_cw.reshape(-1).tolist(),
            "n_keypts": int(n),
            "keypts": self.h_xy.tolist(),
            "undist_keypts": self.h_undist_xy.tolist(),
            "angles": self.h_angle.tolist(),
            "levels": self.h_level.tolist(),
            "valid": self.h_valid.astype(int).tolist(),
            "x_rights": self.h_x_right.tolist(),
            "depths": self.h_depths.tolist(),
            "descs": self.h_desc.astype(int).tolist(),
            "lm_ids": self.lm_ids.tolist(),
            "span_parent": (
                -1 if self.graph_node.spanning_parent is None
                else self.graph_node.spanning_parent
            ),
            "span_children": sorted(self.graph_node.spanning_children),
            "loop_edges": sorted(self.graph_node.loop_edges),
            "src_frm_id": self.src_frm_id,
        }
