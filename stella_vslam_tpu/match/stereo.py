"""Rectified stereo keypoint matching as a dense masked device program.

Reference: src/stella_vslam/match/stereo.{h,cc} [HOT] — per-left-keypoint
candidate right keypoints in nearby rows (±2*scale), disparity range
[min_disp, max_disp), Hamming best under (THR_LOW+THR_HIGH)/2, subpixel
refinement by sliding an 11x11 SAD window ±5 px, parabola interpolation, and
a correlation filter at 2x the median (stereo.cc:20-130).

TPU form: one [NL, NR] masked Hamming matrix for candidate selection; the SAD
refinement slides over the descriptor patches already extracted by the ORB
front-end (the reference re-reads pyramid images; the 39x39 blurred patches
carry the same 11x11 neighborhood). Deviation: the 2x-median correlation
filter uses the masked MEAN instead of the median (TPU sorts are slow); the
mean is >= the median for positive SADs so the filter is slightly more
permissive.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.match import hamming as H

_PATCH_W = 39  # matches feature/orb_extractor._DESC_W
_WIN = 5  # 11x11 window
_SLIDE = 5  # +/- px subpixel search


@partial(jax.jit, static_argnames=("num_levels",))
def stereo_match(
    # left keypoints
    l_xy, l_level, l_desc, l_valid, l_patch,  # patch [NL, 39*39]
    # right keypoints
    r_xy, r_level, r_desc, r_valid, r_patch,
    *,
    scale_factors,
    inv_scale_factors,
    focal_x_baseline,
    true_baseline,
    num_levels: int,
):
    """Returns (x_right [NL], depth [NL]) with -1 where unmatched."""
    NL = l_desc.shape[0]
    dist = H.pairwise_hamming(l_desc, r_desc)  # [NL, NR]

    # row band: |y_r - y_l| <= 2 * scale_factor[right level] (stereo.cc:20)
    r_scale = H.take_small_table(scale_factors, r_level)
    dy = jnp.abs(r_xy[None, :, 1] - l_xy[:, None, 1])
    row_ok = dy <= 2.0 * r_scale[None, :]
    # disparity range [0, max_disp), max_disp = fx*baseline / baseline = fx
    max_disp = focal_x_baseline / jnp.maximum(true_baseline, 1e-9)
    disp = l_xy[:, None, 0] - r_xy[None, :, 0]
    disp_ok = (disp >= 0.0) & (disp < max_disp)
    lvl_ok = jnp.abs(l_level[:, None] - r_level[None, :]) <= 1

    cand = row_ok & disp_ok & lvl_ok & l_valid[:, None] & r_valid[None, :]
    dist = jnp.where(cand, dist, H.MAX_HAMMING_DIST + 1)
    best = jnp.min(dist, axis=1)
    best_idx = jnp.argmin(dist, axis=1)
    hamm_thr = (H.HAMMING_DIST_THR_LOW + H.HAMMING_DIST_THR_HIGH) / 2
    matched = (best < hamm_thr) & l_valid

    # ---- subpixel SAD on the 39x39 patches ----
    # center 11x11 window of the left patch vs sliding windows of the right
    NR = r_desc.shape[0]
    it = jax.lax.broadcasted_iota(jnp.int32, (NL, NR), 1)
    ohm = (best_idx[:, None] == it).astype(jnp.bfloat16)
    r_patch_m = (ohm @ r_patch.astype(jnp.bfloat16)).astype(jnp.float32)
    rx_m = jnp.sum(jnp.where(best_idx[:, None] == it, r_xy[None, :, 0], 0.0), axis=1)

    lp = l_patch.reshape(NL, _PATCH_W, _PATCH_W).astype(jnp.float32)
    rp = r_patch_m.reshape(NL, _PATCH_W, _PATCH_W)
    c = _PATCH_W // 2
    lw = jax.lax.slice(lp, (0, c - _WIN, c - _WIN), (NL, c + _WIN + 1, c + _WIN + 1))
    sads = []
    for d in range(-_SLIDE, _SLIDE + 1):
        rw = jax.lax.slice(
            rp, (0, c - _WIN, c - _WIN + d), (NL, c + _WIN + 1, c + _WIN + 1 + d)
        )
        sads.append(jnp.sum(jnp.abs(lw - rw), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)  # [NL, 11]
    best_d = jnp.argmin(sad, axis=1)
    best_sad = jnp.min(sad, axis=1)
    # parabola refinement using neighbors (guarded at the border)
    ds = jnp.clip(best_d, 1, 2 * _SLIDE - 1)
    i_nl = jax.lax.broadcasted_iota(jnp.int32, (NL, 2 * _SLIDE + 1), 1)
    take = lambda off: jnp.sum(
        jnp.where(i_nl == (ds + off)[:, None], sad, 0.0), axis=1
    )
    s_m, s_0, s_p = take(-1), take(0), take(1)
    denom = s_m + s_p - 2 * s_0
    frac = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (s_m - s_p) / denom, 0.0)
    frac = jnp.clip(frac, -1.0, 1.0)
    at_border = (best_d == 0) | (best_d == 2 * _SLIDE)
    delta = jnp.where(at_border, (best_d - _SLIDE).astype(jnp.float32),
                      (ds - _SLIDE).astype(jnp.float32) + frac)

    x_right = rx_m + delta
    disparity = l_xy[:, 0] - x_right
    disparity = jnp.where(disparity <= 0.0, 0.01, disparity)
    ok_disp = (disparity > 0.0) & (disparity < max_disp)
    matched = matched & ok_disp

    # correlation filter at 2x masked mean (median in the reference)
    corr_mean = jnp.sum(jnp.where(matched, best_sad, 0.0)) / jnp.maximum(
        jnp.sum(matched), 1
    )
    matched = matched & (best_sad <= 2.0 * corr_mean)

    depth = jnp.where(matched, focal_x_baseline / disparity, -1.0)
    x_right = jnp.where(matched, l_xy[:, 0] - disparity, -1.0)
    return x_right, depth
