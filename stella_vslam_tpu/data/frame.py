"""Per-frame record: device tensors for the hot path + host mirrors for policy.

Reference: src/stella_vslam/data/frame.h:36-206 + frame_observation.h:12-38.
The frame_observation's per-keypoint vectors become fixed-slot SoA arrays that
live on DEVICE (descriptors, undistorted keypoints, bearings, stereo depths)
because every matcher/optimizer consumes them there; landmark associations and
the pose are small and live on host (numpy), since the mapping policies mutate
them object-at-a-time.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

import jax

from stella_vslam_tpu.camera.base import Camera
from stella_vslam_tpu.feature.orb_extractor import FrameFeatures
from stella_vslam_tpu.feature.orb_params import OrbParams


_NEG_ONES_CACHE: dict = {}


def pack_host_cols(xy, undist, bearings, level, angle, valid, response,
                   x_right, depths, desc):
    """Pack all host-mirror tensors into one [N,21] f32 buffer: xy(2)
    undist(2) bearings(3) level angle valid response x_right depths (1 each)
    + desc(8, u32 bitcast to f32) — one async copy instead of ten. Pure;
    callable inside larger jitted programs (see System's fused preprocess)."""
    cols = [xy, undist, bearings,
            level.astype(jnp.float32)[:, None],
            angle[:, None], valid.astype(jnp.float32)[:, None],
            response[:, None], x_right[:, None], depths[:, None],
            jax.lax.bitcast_convert_type(desc, jnp.float32)]
    return jnp.concatenate(cols, axis=1)


_pack_host_fn = jax.jit(pack_host_cols)


class Frame:
    _next_id = 0

    def __init__(
        self,
        timestamp: float,
        camera: Camera,
        orb_params: OrbParams,
        feats: FrameFeatures,
        undist_xy: jnp.ndarray,  # [N,2] device
        bearings: jnp.ndarray,  # [N,3] device
        x_right: Optional[jnp.ndarray] = None,  # [N] device (<0 none)
        depths: Optional[jnp.ndarray] = None,  # [N] device (<0 none)
    ):
        self.id = Frame._next_id
        Frame._next_id += 1
        self.timestamp = timestamp
        self.camera = camera
        self.orb_params = orb_params
        self.feats = feats
        self.undist_xy = undist_xy
        self.bearings = bearings
        n = feats.num_slots
        # constant "absent" defaults, cached per slot count: eager jnp.full
        # costs ~2.7 ms of client dispatch overhead per call on the tunneled
        # runtime, and these never change
        if x_right is None or depths is None:
            neg1 = _NEG_ONES_CACHE.get(n)
            if neg1 is None:
                neg1 = _NEG_ONES_CACHE[n] = jnp.full((n,), -1.0, dtype=jnp.float32)
        self.x_right = x_right if x_right is not None else neg1
        self.depths = depths if depths is not None else neg1

        # host-side state
        self.num_slots = n
        self.lm_ids = np.full(n, -1, dtype=np.int64)  # landmark id per keypoint
        self.outlier_flags = np.zeros(n, dtype=bool)
        self.pose_cw: Optional[np.ndarray] = None  # 4x4
        self.markers_2d = {}  # marker id -> Marker2D (reference frame.h markers_2d_)
        self.ref_keyfrm_id: Optional[int] = None

        # lazy host mirrors of device tensors
        self._host_cache: dict = {}

    # ---- host mirrors (fetched once, cached) ----
    def prefetch_host(self):
        """Pack every tensor a host consumer may read (keyframe creation,
        serialization, publishers) into ONE device buffer and start a single
        async device->host copy. On the tunneled runtime a BLOCKING fetch
        costs a ~30 ms round trip regardless of size and even per-array async
        copies cost ~0.4 ms of client chatter each — one packed copy issued at
        dispatch time lands for free, and later `h_*` accesses are ~0 ms."""
        self.attach_packed_host(_pack_host_fn(
            self.feats.xy, self.undist_xy, self.bearings, self.feats.level,
            self.feats.angle, self.feats.valid, self.feats.response,
            self.x_right, self.depths, self.feats.desc))

    def attach_packed_host(self, packed):
        """Adopt an externally computed [N,21] host-mirror pack (e.g. from the
        System's fused preprocess program) and start its async host copy."""
        self._packed_host = packed
        try:
            packed.copy_to_host_async()
        except Exception:
            pass

    def _unpack_host(self):
        buf = np.asarray(self._packed_host)
        c = self._host_cache
        c["xy"] = buf[:, 0:2]
        c["undist_xy"] = buf[:, 2:4]
        c["bearings"] = buf[:, 4:7]
        c["level"] = buf[:, 7].astype(np.int32)
        c["angle"] = buf[:, 8]
        c["valid"] = buf[:, 9] > 0.5
        c["response"] = buf[:, 10]
        c["x_right"] = buf[:, 11]
        c["depths"] = buf[:, 12]
        c["desc"] = np.ascontiguousarray(buf[:, 13:21]).view(np.uint32)
        self._packed_host = None

    def _host(self, name, arr):
        if name not in self._host_cache:
            if getattr(self, "_packed_host", None) is not None:
                self._unpack_host()
            if name not in self._host_cache:
                self._host_cache[name] = np.asarray(arr)
        return self._host_cache[name]

    @property
    def h_xy(self):
        return self._host("xy", self.feats.xy)

    @property
    def h_undist_xy(self):
        return self._host("undist_xy", self.undist_xy)

    @property
    def h_bearings(self):
        return self._host("bearings", self.bearings)

    @property
    def h_level(self):
        return self._host("level", self.feats.level)

    @property
    def h_angle(self):
        return self._host("angle", self.feats.angle)

    @property
    def h_valid(self):
        return self._host("valid", self.feats.valid)

    @property
    def h_desc(self):
        return self._host("desc", self.feats.desc)

    @property
    def h_x_right(self):
        return self._host("x_right", self.x_right)

    @property
    def h_depths(self):
        return self._host("depths", self.depths)

    @property
    def h_response(self):
        return self._host("response", self.feats.response)

    # ---- pose helpers (reference frame.h get_rot_cw etc.) ----
    def set_pose_cw(self, pose_cw: np.ndarray):
        self.pose_cw = np.asarray(pose_cw, dtype=np.float64)

    @property
    def rot_cw(self) -> np.ndarray:
        return self.pose_cw[:3, :3]

    @property
    def trans_cw(self) -> np.ndarray:
        return self.pose_cw[:3, 3]

    @property
    def pose_wc(self) -> np.ndarray:
        T = np.eye(4)
        T[:3, :3] = self.rot_cw.T
        T[:3, 3] = -self.rot_cw.T @ self.trans_cw
        return T

    @property
    def cam_center(self) -> np.ndarray:
        return -self.rot_cw.T @ self.trans_cw

    # ---- association bookkeeping ----
    def add_landmark(self, lm_id: int, idx: int):
        self.lm_ids[idx] = lm_id

    def erase_landmark_with_index(self, idx: int):
        self.lm_ids[idx] = -1

    def num_tracked_landmarks(self, min_num_obs: int, map_db) -> int:
        cnt = 0
        for i in np.nonzero(self.lm_ids >= 0)[0]:
            lm = map_db.landmarks.get(int(self.lm_ids[i]))
            if lm is not None and not lm.will_be_erased and lm.num_observations() >= min_num_obs:
                cnt += 1
        return cnt
