"""Per-frame state publisher for viewers.

Reference: src/stella_vslam/publish/frame_publisher.{h,cc} — ring state with
the latest image, keypoints, tracking state and per-frame timings; draw_frame
renders tracked keypoints (tinycolormap-colored in the reference; plain
green/blue circles here via cv2).

TPU-form: `update` must be free on the tracking hot path, so it stores
REFERENCES (the frame's device tensors were already prefetched to host
asynchronously by the System); the actual numpy materialization happens only
when a viewer calls `draw_frame`/`get_keypoints` — viewers poll at their own
rate, off the tracking thread.
"""
from __future__ import annotations

import threading
from typing import Optional

import numpy as np


class FramePublisher:
    def __init__(self):
        self._lock = threading.Lock()
        self._frame = None  # data.frame.Frame of the latest update
        self.image: Optional[np.ndarray] = None
        self.tracking_state: str = "Initializing"
        self.extraction_time_ms: float = 0.0
        self.tracking_time_ms: float = 0.0

    def update(self, image, frame, state: str,
               extraction_time_ms: float = 0.0, tracking_time_ms: float = 0.0):
        with self._lock:
            self.image = image  # host uint8 (the caller's input buffer)
            self._frame = frame
            self.tracking_state = state
            self.extraction_time_ms = extraction_time_ms
            self.tracking_time_ms = tracking_time_ms

    def get_state(self) -> str:
        with self._lock:
            return self.tracking_state

    def get_keypoints(self):
        """(keypoints [K,2], tracked_mask [K]) of the latest frame, or None."""
        with self._lock:
            frm = self._frame
        if frm is None:
            return None
        valid = frm.h_valid
        return frm.h_xy[valid], (frm.lm_ids >= 0)[valid]

    def draw_frame(self) -> Optional[np.ndarray]:
        import cv2

        with self._lock:
            img = self.image
            state = self.tracking_state
        if img is None:
            return None
        img = np.asarray(img)
        if img.ndim == 2:
            img = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR)
        else:
            img = img.copy()
        kp = self.get_keypoints()
        if kp is not None:
            keypoints, tracked_mask = kp
            for i, (x, y) in enumerate(keypoints):
                tracked = i < len(tracked_mask) and tracked_mask[i]
                color = (0, 220, 0) if tracked else (180, 120, 0)
                cv2.circle(img, (int(x), int(y)), 2, color, -1)
        cv2.putText(img, state, (8, 18),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
        return img
