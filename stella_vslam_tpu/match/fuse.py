"""Landmark-duplication detection (fuse), dense masked form.

Reference: src/stella_vslam/match/fuse.cc detect_duplication — reproject
candidate landmarks into a keyframe; keypoints within a scale-aware margin
window, level in [pred-1, pred+1], chi-square reprojection gate (5.99 mono /
7.81 stereo on sigma^2 per octave), Hamming <= THR_LOW. The host decides
replace-vs-add from the returned (landmark -> keypoint) pairs.

Distance/viewing-direction/scale-prediction pre-gates (fuse.cc:50-71) are
computed by the caller (module/local map code) which owns the landmark stats.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.match import hamming as H

CHI_SQ_2D = 5.99146
CHI_SQ_3D = 7.81473


@partial(jax.jit, static_argnames=("num_levels",))
def detect_duplication(
    # keyframe keypoints
    kp_uv: jnp.ndarray,  # [N,2] undistorted
    kp_level: jnp.ndarray,  # [N]
    kp_desc: jnp.ndarray,  # [N,8]
    kp_valid: jnp.ndarray,  # [N]
    kp_x_right: jnp.ndarray,  # [N], <0 when mono
    # candidate landmarks
    lm_desc: jnp.ndarray,  # [M,8]
    lm_reproj: jnp.ndarray,  # [M,2]
    lm_x_right: jnp.ndarray,  # [M] predicted right x, <0 if n/a
    lm_pred_scale: jnp.ndarray,  # [M]
    lm_valid: jnp.ndarray,  # [M] visible + distance/direction gates passed
    *,
    scale_factors: jnp.ndarray,
    level_sigma_sq: jnp.ndarray,  # [L]
    num_levels: int,
    margin: float = 3.0,
):
    """Returns (best_idx [M] i32, accepted [M] bool, best_dist [M] i32)."""
    N = kp_desc.shape[0]
    dist = H.pairwise_hamming(lm_desc, kp_desc)  # [M,N]

    radius = margin * H.take_small_table(scale_factors, lm_pred_scale)
    du = kp_uv[None, :, 0] - lm_reproj[:, None, 0]
    dv = kp_uv[None, :, 1] - lm_reproj[:, None, 1]
    in_window = (jnp.abs(du) <= radius[:, None]) & (jnp.abs(dv) <= radius[:, None])
    level_ok = (kp_level[None, :] >= lm_pred_scale[:, None] - 1) & (
        kp_level[None, :] <= lm_pred_scale[:, None] + 1
    )

    # chi-square gate on the reprojection error, stereo-aware (fuse.cc:96-120)
    err2 = du * du + dv * dv
    dr = lm_x_right[:, None] - kp_x_right[None, :]
    err3 = err2 + dr * dr
    sigma_sq = H.take_small_table(level_sigma_sq, kp_level)[None, :]
    has_stereo = (kp_x_right[None, :] > 0) & (lm_x_right[:, None] > 0)
    chi_ok = jnp.where(
        has_stereo, err3 / sigma_sq <= CHI_SQ_3D, err2 / sigma_sq <= CHI_SQ_2D
    )

    cand = in_window & level_ok & chi_ok & kp_valid[None, :] & lm_valid[:, None]
    dist = jnp.where(cand, dist, H.MAX_HAMMING_DIST + 1)
    best = jnp.min(dist, axis=1)
    best_idx = jnp.argmin(dist, axis=1)
    accepted = (best <= H.HAMMING_DIST_THR_LOW) & lm_valid
    accepted = H.resolve_duplicate_targets(best_idx, best, accepted, N)
    return best_idx, accepted, best
