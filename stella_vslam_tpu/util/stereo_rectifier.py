"""Stereo rectification with precomputed remap tables.

Reference: src/stella_vslam/util/stereo_rectifier.{h,cc} — builds
cv::initUndistortRectifyMap tables from per-eye K/D/R (supports fisheye
input models) and remaps both images per frame. Host-side (cv2), as the
reference is: rectification happens before upload.
"""
from __future__ import annotations

import numpy as np


class StereoRectifier:
    def __init__(self, camera, rectifier_params: dict):
        """rectifier_params: StereoRectifier YAML section with K_left/D_left/
        R_left (+ _right) 1D lists (reference stereo_rectifier.cc:14-60)."""
        import cv2

        p = camera.params
        self.size = (camera.width, camera.height)
        K_new = np.array(
            [[float(p.fx), 0, float(p.cx)], [0, float(p.fy), float(p.cy)], [0, 0, 1]]
        )
        model = str(rectifier_params.get("model", "perspective")).lower()
        self._maps = {}
        for side in ("left", "right"):
            K = np.array(rectifier_params[f"K_{side}"], dtype=np.float64).reshape(3, 3)
            D = np.array(rectifier_params[f"D_{side}"], dtype=np.float64)
            R = np.array(rectifier_params[f"R_{side}"], dtype=np.float64).reshape(3, 3)
            if model == "fisheye":
                m1, m2 = cv2.fisheye.initUndistortRectifyMap(
                    K, D[:4], R, K_new, self.size, cv2.CV_32FC1
                )
            else:
                m1, m2 = cv2.initUndistortRectifyMap(
                    K, D, R, K_new, self.size, cv2.CV_32FC1
                )
            self._maps[side] = (m1, m2)

    def rectify(self, img_left: np.ndarray, img_right: np.ndarray):
        import cv2

        l1, l2 = self._maps["left"]
        r1, r2 = self._maps["right"]
        return (
            cv2.remap(img_left, l1, l2, cv2.INTER_LINEAR),
            cv2.remap(img_right, r1, r2, cv2.INTER_LINEAR),
        )
