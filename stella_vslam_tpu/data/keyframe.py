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


class _FrameStub:
    """Host storage for keyframes loaded from disk (no source Frame).

    Device tensors are materialized LAZILY on first access: a loaded map's
    keyframes only need device feats when relocalization / loop detection
    actually matches against them, and uploading every keyframe eagerly made
    map loading scale with map size x tunnel latency (measured: a 512-
    keyframe map cost ~100 s to construct eagerly; lazily it is instant).
    Materialization is idempotent, so a first-access race between threads
    only costs a duplicate upload."""

    _DEVICE = ("feats", "undist_xy", "bearings", "x_right", "depths")

    def __init__(self, host: dict, camera):
        self._host_cache = host
        self._camera = camera
        self.num_slots = len(host["valid"])
        self.lm_ids = np.full(self.num_slots, -1, dtype=np.int64)

    def _host(self, name, arr):
        return self._host_cache[name]

    def _materialize(self):
        import jax

        from stella_vslam_tpu.feature.orb_extractor import FrameFeatures

        host = self._host_cache
        und_d = jax.device_put(host["undist_xy"])
        bearings = self._camera.bearings(und_d)
        host.setdefault("bearings", np.asarray(bearings))
        self.feats = FrameFeatures(
            xy=jax.device_put(host["xy"]),
            response=jax.device_put(host["response"]),
            angle=jax.device_put(host["angle"]),
            level=jax.device_put(host["level"]),
            valid=jax.device_put(host["valid"]),
            desc=jax.device_put(host["desc"]),
        )
        self.undist_xy = und_d
        self.bearings = bearings
        self.x_right = jax.device_put(host["x_right"])
        self.depths = jax.device_put(host["depths"])

    def __getattr__(self, name):
        # h_xxx accessors resolve to the host cache (mirrors Frame's API)
        if name.startswith("h_"):
            key = name[2:]
            host = self.__dict__["_host_cache"]
            if key == "bearings" and "bearings" not in host:
                self._materialize()
            if key in host:
                return host[key]
        if name in _FrameStub._DEVICE:
            self._materialize()
            return self.__dict__[name]
        raise AttributeError(name)


class Keyframe:
    @staticmethod
    def from_payload(map_db, keyfrm_id: int, payload: dict, camera, orb_params):
        """Rebuild a keyframe from serialized arrays (io/map_database_io):
        host mirrors now, device tensors lazily on first access."""
        xy = np.asarray(payload["keypts"], np.float32)
        n = len(xy)
        host = {
            "xy": xy,
            "undist_xy": np.asarray(payload["undist_keypts"], np.float32),
            "angle": np.asarray(payload["angles"], np.float32),
            "level": np.asarray(payload["levels"], np.int32),
            "valid": np.asarray(payload["valid"], bool),
            "desc": np.asarray(payload["descs"], np.uint32),
            "x_right": np.asarray(payload["x_rights"], np.float32),
            "depths": np.asarray(payload["depths"], np.float32),
            "response": np.zeros(n, np.float32),
        }
        # device tensors (feats/bearings/...) materialize lazily on first
        # access — see _FrameStub
        stub = _FrameStub(host, camera)
        stub.pose_cw = np.asarray(payload["pose_cw"], np.float64).reshape(4, 4)
        stub.timestamp = payload["ts"]
        stub.camera = camera
        stub.orb_params = orb_params
        stub.id = payload.get("src_frm_id", -1)
        kf = Keyframe(stub, map_db, keyfrm_id=keyfrm_id)
        kf.lm_ids = np.asarray(payload["lm_ids"], np.int64)
        return kf

    def __init__(self, frame: Frame, map_db, keyfrm_id: Optional[int] = None):
        self.id = map_db.next_keyframe_id() if keyfrm_id is None else keyfrm_id
        self.src_frm_id = frame.id
        self.timestamp = frame.timestamp
        self.camera = frame.camera
        self.orb_params = frame.orb_params
        self.num_slots = frame.num_slots

        # device tensors shared with the source frame (immutable
        # observation) — delegated via properties below so a loaded-map
        # stub can materialize its uploads lazily on first access
        self._frame_ref = frame
        self.lm_ids = frame.lm_ids.copy()
        self.pose_cw = frame.pose_cw.copy()
        self.graph_node = GraphNode(self, map_db.min_num_shared_lms)
        self.will_be_erased = False
        self._not_to_be_erased = False
        # monotone pose-mutation counter: lets a lock-free reader detect
        # whether this keyframe's pose has been touched since creation (the
        # tracking thread's chain-anchor capture, tracking_module._dispatch)
        self.pose_version = 0
        self._pose_version_at_creation = 0
        # creation-pose snapshot: a new keyframe's pose is expressed in the
        # coordinates of the device table it was created against, so when a
        # table publish arrives before this keyframe ever appeared in a snap,
        # THIS is the rebase origin — even if a BA writeback already moved
        # the live pose (set_pose_cw rebinds rather than mutates, so holding
        # the initial array is snapshot-safe). Read by the tracking thread's
        # chain-anchor capture (tracking_module._dispatch).
        self._pose_at_creation = self.pose_cw

    # device tensors delegate to the source frame / lazy stub
    @property
    def feats(self):
        return self._frame_ref.feats

    @property
    def undist_xy(self):
        return self._frame_ref.undist_xy

    @property
    def bearings(self):
        return self._frame_ref.bearings

    @property
    def x_right(self):
        return self._frame_ref.x_right

    @property
    def depths(self):
        return self._frame_ref.depths

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
        # rebinds (never mutates in place): anyone holding the previous
        # array — e.g. a TableSnap's kf_poses — keeps a true snapshot
        self.pose_cw = np.asarray(pose_cw, dtype=np.float64).copy()
        self.pose_version += 1

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
        # one native bulk-count call (erased landmarks count 0 in the store);
        # this runs in the keyframe-need decision on EVERY finalized frame
        counts = map_db.assoc_store.num_obs_bulk(self.lm_ids)
        return int((counts >= max(min_num_obs, 1)).sum())

    def compute_median_depth(self, map_db, use_abs: bool = False) -> float:
        """Median z (camera frame) of associated landmarks
        (reference keyframe.h:206-211). Vectorized over the field store."""
        ids = map_db.fields.live(self.lm_ids[self.lm_ids >= 0])
        if len(ids) == 0:
            return 0.0
        R, t = self.rot_cw, self.trans_cw
        z = map_db.fields.pos[ids] @ R[2] + t[2]
        return float(np.median(np.abs(z) if use_abs else z))

    # ---- erase protocol (reference keyframe.h:232-250) ----
    def set_not_to_be_erased(self, flag: bool = True):
        self._not_to_be_erased = flag

    def can_be_erased(self) -> bool:
        # keyframes anchoring a loop edge are never culled (reference erase
        # protocol: prepare_for_erasing refuses while loop edges exist)
        return not self._not_to_be_erased and not self.graph_node.loop_edges

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
