"""Per-frame state publisher for viewers.

Reference: src/stella_vslam/publish/frame_publisher.{h,cc} — ring state with
the latest image, keypoints, tracking state and per-frame timings; draw_frame
renders tracked keypoints (tinycolormap-colored in the reference; plain
green/blue circles here via cv2).
"""
from __future__ import annotations

import threading
from typing import Optional

import numpy as np


class FramePublisher:
    def __init__(self):
        self._lock = threading.Lock()
        self.image: Optional[np.ndarray] = None
        self.keypoints: Optional[np.ndarray] = None
        self.tracked_mask: Optional[np.ndarray] = None
        self.tracking_state: str = "Initializing"
        self.extraction_time_ms: float = 0.0
        self.tracking_time_ms: float = 0.0

    def update(self, image, keypoints, tracked_mask, state: str,
               extraction_time_ms: float = 0.0, tracking_time_ms: float = 0.0):
        with self._lock:
            self.image = None if image is None else np.asarray(image).copy()
            self.keypoints = None if keypoints is None else np.asarray(keypoints)
            self.tracked_mask = (
                None if tracked_mask is None else np.asarray(tracked_mask)
            )
            self.tracking_state = state
            self.extraction_time_ms = extraction_time_ms
            self.tracking_time_ms = tracking_time_ms

    def get_state(self) -> str:
        with self._lock:
            return self.tracking_state

    def draw_frame(self) -> Optional[np.ndarray]:
        import cv2

        with self._lock:
            if self.image is None:
                return None
            img = self.image
            if img.ndim == 2:
                img = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR)
            else:
                img = img.copy()
            if self.keypoints is not None:
                for i, (x, y) in enumerate(self.keypoints):
                    tracked = (
                        self.tracked_mask is not None
                        and i < len(self.tracked_mask)
                        and self.tracked_mask[i]
                    )
                    color = (0, 220, 0) if tracked else (180, 120, 0)
                    cv2.circle(img, (int(x), int(y)), 2, color, -1)
            cv2.putText(img, self.tracking_state, (8, 18),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
            return img
