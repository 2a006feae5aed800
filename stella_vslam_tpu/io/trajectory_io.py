"""Trajectory export in TUM / KITTI formats.

Reference: src/stella_vslam/io/trajectory_io.{h,cc} — frame & keyframe
trajectory export; TUM rows are `ts tx ty tz qx qy qz qw` (cc:149-166), KITTI
rows are the 3x4 world-from-camera matrix (cc:83-100). Frame poses are stored
camera-from-world internally and inverted on export, as in the reference.
"""
from __future__ import annotations

import numpy as np


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


def _write_rows(path: str, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(r + "\n")


def _pose_row(ts: float, pose_wc: np.ndarray, fmt: str) -> str:
    if fmt.upper() == "TUM":
        t = pose_wc[:3, 3]
        q = _rot_to_quat(pose_wc[:3, :3])
        return (
            f"{ts:.9f} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
            f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
        )
    # KITTI
    m = pose_wc[:3].reshape(-1)
    return " ".join(f"{v:.9e}" for v in m)


def save_frame_trajectory(path: str, frame_poses, fmt: str = "TUM"):
    rows = []
    for entry in frame_poses:
        ts, pose_cw = entry[0], entry[1]
        if pose_cw is None:
            continue
        pose_wc = np.linalg.inv(pose_cw)
        rows.append(_pose_row(ts, pose_wc, fmt))
    _write_rows(path, rows)


def save_keyframe_trajectory(path: str, map_db, fmt: str = "TUM"):
    rows = []
    for kf_id in sorted(map_db.keyframes):
        kf = map_db.keyframes[kf_id]
        rows.append(_pose_row(kf.timestamp, kf.pose_wc, fmt))
    _write_rows(path, rows)
