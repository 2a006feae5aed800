"""ArUco marker detection + per-frame pose.

Reference: src/stella_vslam/marker_detector/{base,aruco}.{h,cc} — OpenCV
ArUco corner detection -> marker2d with a per-frame pose from PnP on the 4
corners. Host-side (cv2), as in the reference.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from stella_vslam_tpu.marker.marker_model import MarkerModel


class Marker2D:
    """reference data/marker2d.h — one detection in one frame."""

    def __init__(self, marker_id: int, corners_2d: np.ndarray,
                 rot_cm: np.ndarray, trans_cm: np.ndarray,
                 undist_corners_2d: np.ndarray = None):
        self.id = marker_id
        self.corners_2d = corners_2d  # [4,2]
        self.rot_cm = rot_cm  # camera <- marker
        self.trans_cm = trans_cm
        # undistorted corners, used by the BA marker edges
        # (reference marker2d.h undist_corners_)
        self.undist_corners_2d = (
            undist_corners_2d if undist_corners_2d is not None else corners_2d
        )


class MarkerDetector:
    def __init__(self, camera, model: MarkerModel):
        import cv2

        self.camera = camera
        self.model = model
        dic = getattr(cv2.aruco, model.marker_dict, cv2.aruco.DICT_6X6_250)
        self._detector = cv2.aruco.ArucoDetector(
            cv2.aruco.getPredefinedDictionary(dic)
        )
        p = camera.params
        self._K = np.array(
            [[float(p.fx), 0, float(p.cx)], [0, float(p.fy), float(p.cy)], [0, 0, 1]]
        )
        self._D = np.array(
            [float(p.k1), float(p.k2), float(p.p1), float(p.p2), float(p.k3)]
        )

    def detect(self, gray_img: np.ndarray) -> Dict[int, Marker2D]:
        import cv2

        img = np.asarray(gray_img)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        corners, ids, _ = self._detector.detectMarkers(img)
        out: Dict[int, Marker2D] = {}
        if ids is None:
            return out
        obj = self.model.corners_pos.astype(np.float64)
        for c, mid in zip(corners, ids.reshape(-1)):
            c2 = c.reshape(4, 2).astype(np.float64)
            ok, rvec, tvec = cv2.solvePnP(
                obj, c2, self._K, self._D, flags=cv2.SOLVEPNP_IPPE_SQUARE
            )
            if not ok:
                continue
            R, _ = cv2.Rodrigues(rvec)
            und = cv2.undistortPoints(
                c2.reshape(-1, 1, 2), self._K, self._D, P=self._K
            ).reshape(4, 2)
            out[int(mid)] = Marker2D(int(mid), c2, R, tvec.reshape(3), und)
        return out
