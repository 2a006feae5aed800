"""Marker geometry models.

Reference: src/stella_vslam/marker_model/{base,aruco,aruconano}.h — marker
width -> the 4 corner coordinates in the marker-local frame.
"""
from __future__ import annotations

import numpy as np


class MarkerModel:
    """Square fiducial of side `width` (meters); corners in marker frame,
    order matching cv2.aruco detection (TL, TR, BR, BL), z = 0."""

    def __init__(self, width: float = 0.2, marker_dict: str = "DICT_6X6_250"):
        self.width = float(width)
        self.marker_dict = marker_dict
        h = self.width / 2.0
        self.corners_pos = np.array(
            [[-h, h, 0.0], [h, h, 0.0], [h, -h, 0.0], [-h, -h, 0.0]]
        )

    @staticmethod
    def from_yaml(node: dict) -> "MarkerModel":
        return MarkerModel(
            width=float(node.get("width", 0.2)),
            marker_dict=str(node.get("dictionary", "DICT_6X6_250")),
        )
