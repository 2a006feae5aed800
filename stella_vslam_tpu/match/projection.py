"""Projection-guided 2D-3D matching as dense masked device programs.

Reference: src/stella_vslam/match/projection.cc [HOT]. The reference reprojects
each landmark, collects keypoints from grid cells inside a margin window, and
runs a scalar Hamming loop per landmark. On TPU the whole matcher is one
fixed-shape program: an [M_landmarks, N_keypoints] Hamming matrix from the MXU
(match/hamming.py) combined with window / scale / stereo / availability masks,
then a masked top-2 reduction per landmark. No grid buckets, no dynamic lists.

All functions return (best_idx [M] i32, accepted [M] bool); collisions between
landmarks choosing the same keypoint are resolved by scatter-min
(hamming.resolve_duplicate_targets).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.match import hamming as H


@partial(jax.jit, static_argnames=("num_levels",))
def match_frame_and_landmarks(
    # frame keypoints
    kp_uv: jnp.ndarray,  # [N,2] undistorted keypoint coords
    kp_level: jnp.ndarray,  # [N] i32
    kp_desc: jnp.ndarray,  # [N,8] u32
    kp_valid: jnp.ndarray,  # [N] bool
    kp_has_lm: jnp.ndarray,  # [N] bool — keypoint already associated
    kp_x_right: jnp.ndarray,  # [N] f32, <0 if none (mono)
    # landmarks
    lm_desc: jnp.ndarray,  # [M,8] u32
    lm_reproj: jnp.ndarray,  # [M,2] predicted image coords
    lm_x_right: jnp.ndarray,  # [M] predicted right-image x (stereo), <0 if n/a
    lm_pred_scale: jnp.ndarray,  # [M] i32 predicted octave
    lm_valid: jnp.ndarray,  # [M] bool (visible & in image)
    *,
    scale_factors: jnp.ndarray,  # [L] f32
    num_levels: int,
    margin: float = 5.0,
    lowe_ratio: float = 0.6,
):
    """reference projection::match_frame_and_landmarks (projection.cc:13-96):
    search radius = margin * scale_factor[pred_scale]; candidate levels
    [pred-1, pred+1]; ratio test applied only when best and second-best share a
    scale level; accept at HAMMING_DIST_THR_HIGH."""
    M = lm_desc.shape[0]
    N = kp_desc.shape[0]
    dist = H.pairwise_hamming(lm_desc, kp_desc)  # [M,N]

    radius = margin * H.take_small_table(scale_factors, lm_pred_scale)  # [M]
    dx = jnp.abs(kp_uv[None, :, 0] - lm_reproj[:, None, 0])
    dy = jnp.abs(kp_uv[None, :, 1] - lm_reproj[:, None, 1])
    in_window = (dx <= radius[:, None]) & (dy <= radius[:, None])

    min_level = jnp.maximum(lm_pred_scale - 1, 0)
    max_level = jnp.minimum(lm_pred_scale + 1, num_levels - 1)
    level_ok = (kp_level[None, :] >= min_level[:, None]) & (
        kp_level[None, :] <= max_level[:, None]
    )

    # stereo consistency (projection.cc:56-62)
    stereo_ok = jnp.where(
        (kp_x_right[None, :] > 0) & (lm_x_right[:, None] > 0),
        jnp.abs(lm_x_right[:, None] - kp_x_right[None, :]) <= radius[:, None],
        True,
    )

    cand = (
        in_window
        & level_ok
        & stereo_ok
        & kp_valid[None, :]
        & (~kp_has_lm[None, :])
        & lm_valid[:, None]
    )
    dist = jnp.where(cand, dist, H.MAX_HAMMING_DIST + 1)

    best, best_idx, second = H.best_and_second(dist, axis=1)
    best_level = H.take_rows(kp_level, best_idx, N)
    # second-best level: argmin over the row with the best masked out (one-hot
    # where, not scatter — TPU serializes row-scatters)
    it = jnp.arange(N, dtype=jnp.int32)[None, :]
    masked = jnp.where(best_idx[:, None] == it, H.MAX_HAMMING_DIST + 1, dist)
    second_idx = jnp.argmin(masked, axis=1)
    second_level = H.take_rows(kp_level, second_idx, N)

    ratio_reject = (best_level == second_level) & (
        best.astype(jnp.float32) > lowe_ratio * second.astype(jnp.float32)
    )
    accepted = (best <= H.HAMMING_DIST_THR_HIGH) & (~ratio_reject) & lm_valid
    accepted = H.resolve_duplicate_targets(best_idx, best, accepted, N)
    return best_idx, accepted, best


@partial(jax.jit, static_argnames=("num_levels", "assume_forward", "assume_backward", "check_orientation"))
def match_current_and_last_frames(
    kp_uv: jnp.ndarray,  # [N,2] current undistorted keypoints
    kp_level: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_angle: jnp.ndarray,  # [N]
    kp_x_right: jnp.ndarray,  # [N]
    # last-frame landmark observations (slots aligned with last keypoints)
    last_desc: jnp.ndarray,  # [M,8] last keypoint descriptors
    last_level: jnp.ndarray,  # [M]
    last_angle: jnp.ndarray,  # [M]
    lm_reproj: jnp.ndarray,  # [M,2] landmark reprojection into current frame
    lm_x_right: jnp.ndarray,  # [M]
    lm_valid: jnp.ndarray,  # [M] has-landmark & visible
    *,
    scale_factors: jnp.ndarray,
    num_levels: int,
    margin: float,
    assume_forward: bool = False,
    assume_backward: bool = False,
    check_orientation: bool = True,
):
    """reference projection::match_current_and_last_frames (projection.cc:98-200):
    motion-model tracking matcher. Scale-level window depends on known
    forward/backward motion (stereo/RGBD only)."""
    N = kp_desc.shape[0]
    dist = H.pairwise_hamming(last_desc, kp_desc)  # [M,N]

    radius = margin * H.take_small_table(scale_factors, last_level)
    dx = jnp.abs(kp_uv[None, :, 0] - lm_reproj[:, None, 0])
    dy = jnp.abs(kp_uv[None, :, 1] - lm_reproj[:, None, 1])
    in_window = (dx <= radius[:, None]) & (dy <= radius[:, None])

    lvl = kp_level[None, :]
    last_lvl = last_level[:, None]
    if assume_forward:
        level_ok = lvl >= last_lvl
    elif assume_backward:
        level_ok = lvl <= last_lvl
    else:
        level_ok = (lvl >= last_lvl - 1) & (lvl <= last_lvl + 1)

    stereo_ok = jnp.where(
        (kp_x_right[None, :] > 0) & (lm_x_right[:, None] > 0),
        jnp.abs(lm_x_right[:, None] - kp_x_right[None, :]) <= radius[:, None],
        True,
    )

    cand = in_window & level_ok & stereo_ok & kp_valid[None, :] & lm_valid[:, None]
    dist = jnp.where(cand, dist, H.MAX_HAMMING_DIST + 1)
    best = jnp.min(dist, axis=1)
    best_idx = jnp.argmin(dist, axis=1)

    accepted = (best <= H.HAMMING_DIST_THR_HIGH) & lm_valid
    if check_orientation:
        accepted = accepted & H.angle_diff_ok(last_angle, H.take_rows(kp_angle, best_idx, N))
    accepted = H.resolve_duplicate_targets(best_idx, best, accepted, N)
    return best_idx, accepted, best


@partial(jax.jit, static_argnames=("num_levels", "hamm_dist_thr", "check_orientation"))
def match_frame_and_keyframe(
    kp_uv: jnp.ndarray,  # [N,2] current frame undistorted keypoints
    kp_level: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_angle: jnp.ndarray,
    kp_has_lm: jnp.ndarray,
    # keyframe landmarks
    lm_desc: jnp.ndarray,  # [M,8]
    lm_reproj: jnp.ndarray,  # [M,2]
    lm_pred_scale: jnp.ndarray,  # [M]
    lm_angle: jnp.ndarray,  # [M] angle of the keyframe observation
    lm_valid: jnp.ndarray,  # [M]
    *,
    scale_factors: jnp.ndarray,
    num_levels: int,
    margin: float,
    hamm_dist_thr: int = H.HAMMING_DIST_THR_LOW,
    check_orientation: bool = True,
):
    """reference projection::match_frame_and_keyframe (projection.cc:202-300):
    used by relocalization refinement — excludes already-matched keypoints."""
    N = kp_desc.shape[0]
    dist = H.pairwise_hamming(lm_desc, kp_desc)

    radius = margin * H.take_small_table(scale_factors, lm_pred_scale)
    dx = jnp.abs(kp_uv[None, :, 0] - lm_reproj[:, None, 0])
    dy = jnp.abs(kp_uv[None, :, 1] - lm_reproj[:, None, 1])
    in_window = (dx <= radius[:, None]) & (dy <= radius[:, None])
    level_ok = (kp_level[None, :] >= lm_pred_scale[:, None] - 1) & (
        kp_level[None, :] <= lm_pred_scale[:, None] + 1
    )

    cand = (
        in_window & level_ok & kp_valid[None, :] & (~kp_has_lm[None, :]) & lm_valid[:, None]
    )
    dist = jnp.where(cand, dist, H.MAX_HAMMING_DIST + 1)
    best = jnp.min(dist, axis=1)
    best_idx = jnp.argmin(dist, axis=1)

    accepted = (best <= hamm_dist_thr) & lm_valid
    if check_orientation:
        accepted = accepted & H.angle_diff_ok(lm_angle, H.take_rows(kp_angle, best_idx, N))
    accepted = H.resolve_duplicate_targets(best_idx, best, accepted, N)
    return best_idx, accepted, best
