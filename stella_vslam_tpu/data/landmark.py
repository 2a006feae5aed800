"""Landmark: 3D point with observation bookkeeping.

Reference: src/stella_vslam/data/landmark.{h,cc} — observations ordered by
keyframe id, representative descriptor (min-median-Hamming), mean viewing
normal + ORB-scale valid-distance range, observability counters for culling,
replace() fusion, predict_scale_level.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1)


class Landmark:
    """Geometric/appearance fields (pos_w, descriptor, mean_normal,
    min/max_valid_dist) are write-through PROPERTIES: once the landmark is
    registered in a MapDatabase, they live in its contiguous
    LandmarkFieldStore row (indexed by landmark id) so the mapper's bulk
    consumers — fuse dispatch, BA assembly, device-table publish — read
    whole field arrays with one fancy index instead of a Python loop over
    landmark objects. Before registration they fall back to instance
    attributes (unit tests, deserialization)."""

    def __init__(self, lm_id: int, pos_w: np.ndarray, ref_keyfrm_id: int):
        self._fs = None  # LandmarkFieldStore once registered
        self.id = int(lm_id)
        self.pos_w = np.asarray(pos_w, dtype=np.float64).copy()
        self.ref_keyfrm_id = int(ref_keyfrm_id)
        # keyframe id -> keypoint index (ordered by insertion; python dicts
        # preserve order and keyframe ids are monotone)
        self.observations: Dict[int, int] = {}
        self.descriptor = np.zeros(8, dtype=np.uint32)
        self.mean_normal = np.zeros(3)
        self.min_valid_dist = 0.0
        self.max_valid_dist = 0.0
        self.num_observable = 1
        self.num_observed = 1
        self.will_be_erased = False
        self.replaced_id: Optional[int] = None
        self.first_keyfrm_id = int(ref_keyfrm_id)
        self.num_observations_when_created = 0

    # ---- store-backed field properties ----
    @property
    def pos_w(self):
        fs = self._fs
        return self._pos_w if fs is None else fs.pos[self.id]

    @pos_w.setter
    def pos_w(self, v):
        fs = self._fs
        if fs is None:
            self._pos_w = np.asarray(v, np.float64).copy()
        else:
            fs.pos[self.id] = v

    @property
    def descriptor(self):
        fs = self._fs
        return self._descriptor if fs is None else fs.desc[self.id]

    @descriptor.setter
    def descriptor(self, v):
        fs = self._fs
        if fs is None:
            self._descriptor = np.asarray(v, np.uint32)
        else:
            fs.desc[self.id] = v

    @property
    def mean_normal(self):
        fs = self._fs
        return self._mean_normal if fs is None else fs.normal[self.id]

    @mean_normal.setter
    def mean_normal(self, v):
        fs = self._fs
        if fs is None:
            self._mean_normal = np.asarray(v, np.float64)
        else:
            fs.normal[self.id] = v

    @property
    def min_valid_dist(self):
        fs = self._fs
        return self._min_valid_dist if fs is None else float(fs.dmin[self.id])

    @min_valid_dist.setter
    def min_valid_dist(self, v):
        fs = self._fs
        if fs is None:
            self._min_valid_dist = float(v)
        else:
            fs.dmin[self.id] = v

    @property
    def max_valid_dist(self):
        fs = self._fs
        return self._max_valid_dist if fs is None else float(fs.dmax[self.id])

    @max_valid_dist.setter
    def max_valid_dist(self, v):
        fs = self._fs
        if fs is None:
            self._max_valid_dist = float(v)
        else:
            fs.dmax[self.id] = v

    @staticmethod
    def create_registered(lm_id: int, ref_keyfrm_id: int, fs) -> "Landmark":
        """Fast-path constructor for bulk creation: the field-store row was
        already written by the caller (MapDatabase.bulk_add_landmarks), so
        skip the per-field property writes of __init__."""
        lm = Landmark.__new__(Landmark)
        lm._fs = fs
        lm.id = int(lm_id)
        lm.ref_keyfrm_id = int(ref_keyfrm_id)
        lm.observations = {}
        lm.num_observable = 1
        lm.num_observed = 1
        lm.will_be_erased = False
        lm.replaced_id = None
        lm.first_keyfrm_id = int(ref_keyfrm_id)
        lm.num_observations_when_created = 0
        return lm

    # ---- observations (mirrored into the native association store) ----
    def add_observation(self, keyfrm_id: int, idx: int):
        self.observations[keyfrm_id] = idx
        store = getattr(self, "_store", None)
        if store is not None:
            store.add(self.id, keyfrm_id, idx)

    def erase_observation(self, keyfrm_id: int):
        self.observations.pop(keyfrm_id, None)
        store = getattr(self, "_store", None)
        if store is not None:
            store.erase(self.id, keyfrm_id)
        if self.ref_keyfrm_id == keyfrm_id and self.observations:
            self.ref_keyfrm_id = next(iter(self.observations))

    def num_observations(self) -> int:
        return len(self.observations)

    def has_observation(self) -> bool:
        return len(self.observations) > 0

    # ---- statistics (reference landmark.cc) ----
    def compute_descriptor(self, map_db):
        """Representative descriptor = the one minimizing the median Hamming
        distance to all other observations (landmark.cc compute_descriptor)."""
        descs = []
        for kf_id, idx in self.observations.items():
            kf = map_db.keyframes.get(kf_id)
            if kf is None or kf.will_be_erased:
                continue
            descs.append(kf.h_desc[idx])
        if not descs:
            return
        D = np.stack(descs)
        if len(D) > 2:
            from stella_vslam_tpu.native.assoc_store import median_hamming_descriptor

            self.descriptor = D[median_hamming_descriptor(D)].copy()
        else:
            dist = _hamming_np(D[:, None, :], D[None, :, :])
            medians = np.median(dist, axis=1)
            self.descriptor = D[int(np.argmin(medians))].copy()

    def update_mean_normal_and_obs_scale_variance(self, map_db):
        """reference landmark.cc update_mean_normal_and_obs_scale_variance."""
        if not self.observations:
            return
        normals = []
        for kf_id, idx in self.observations.items():
            kf = map_db.keyframes.get(kf_id)
            if kf is None:
                continue
            v = self.pos_w - kf.cam_center
            n = np.linalg.norm(v)
            if n > 1e-9:
                normals.append(v / n)
        if normals:
            m = np.mean(normals, axis=0)
            nm = np.linalg.norm(m)
            self.mean_normal = m / nm if nm > 1e-9 else m
        ref = map_db.keyframes.get(self.ref_keyfrm_id)
        if ref is None:
            return
        idx = self.observations.get(self.ref_keyfrm_id)
        if idx is None:
            return
        dist = float(np.linalg.norm(self.pos_w - ref.cam_center))
        level = int(ref.h_level[idx])
        p = ref.orb_params
        scale = p.scale_factors[level]
        num_levels = p.num_levels
        self.max_valid_dist = dist * scale
        self.min_valid_dist = self.max_valid_dist / p.scale_factors[num_levels - 1]

    def predict_scale_level(self, cam_to_lm_dist: float, num_levels: int, log_scale_factor: float) -> int:
        """reference landmark.h:114 predict_scale_level."""
        if cam_to_lm_dist <= 1e-9 or self.max_valid_dist <= 1e-9:
            return 0
        ratio = self.max_valid_dist / cam_to_lm_dist
        level = int(math.ceil(math.log(max(ratio, 1e-9)) / log_scale_factor))
        return min(max(level, 0), num_levels - 1)

    # ---- culling counters (reference landmark.h:127-131) ----
    def increase_num_observable(self, n: int = 1):
        self.num_observable += n

    def increase_num_observed(self, n: int = 1):
        self.num_observed += n

    def get_observed_ratio(self) -> float:
        return self.num_observed / max(self.num_observable, 1)

    # ---- serialization ----
    def to_json(self) -> dict:
        return {
            "1st_keyfrm": self.first_keyfrm_id,
            "pos_x": float(self.pos_w[0]),
            "pos_y": float(self.pos_w[1]),
            "pos_z": float(self.pos_w[2]),
            "ref_keyfrm": self.ref_keyfrm_id,
            "n_vis": self.num_observable,
            "n_fnd": self.num_observed,
        }

    @staticmethod
    def from_json(lm_id: int, d: dict) -> "Landmark":
        lm = Landmark(
            lm_id, np.array([d["pos_x"], d["pos_y"], d["pos_z"]]), d["ref_keyfrm"]
        )
        lm.first_keyfrm_id = d.get("1st_keyfrm", lm.ref_keyfrm_id)
        lm.num_observable = d.get("n_vis", 1)
        lm.num_observed = d.get("n_fnd", 1)
        return lm
