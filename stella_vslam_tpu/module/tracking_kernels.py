"""Fused per-frame tracking device programs.

The reference splits per-frame work across frame_tracker (module/frame_tracker
.cc), the projection matcher, and pose_optimizer, each iterating over dynamic
landmark sets. Here each tracking mode is ONE jitted fixed-shape program over
the frame's slot tensors and the device-resident landmark table
(data/map_database.DeviceLandmarkTable):

* motion_track — project last-frame landmarks with the motion-model pose,
  dense-match (reference margin 20, then x2 retry folded into a second call),
  then the 4-round LM pose optimization. (frame_tracker.cc:20-58)
* keyframe_track — brute-force match against a (key)frame's landmark slots +
  pose optimization from the last-frame pose. Covers both the reference's
  bow_match_based_track and robust_match_based_track roles (dense matching
  subsumes BoW bucketing). (frame_tracker.cc:61-131)
* local_map_track — visibility-gate the WHOLE landmark table against the
  current pose (reference can_observe, frame.cc:59 + search_local_landmarks,
  tracking_module.cc:533-607), scale-predict, dense-match with margin 5/20,
  optimize. The reference bounds cost with a covisibility-derived local map
  (<= 60 keyframes); the dense table sweep is the TPU-native equivalent —
  cheaper than building dynamic neighborhoods, identical gating semantics.

Outputs stay on device; the host reads back only small association/index
arrays and the pose.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stella_vslam_tpu.match import hamming as H
from stella_vslam_tpu.match import projection as proj_match
from stella_vslam_tpu.ops.optim import pose as pose_opt
from stella_vslam_tpu.ops.optim.residuals import CamScalars


class TrackResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    assoc_ref: jnp.ndarray  # [N] i32: per current-slot source index (-1 none)
    # (last-frame slot for motion track; table row for local-map track)
    num_matches: jnp.ndarray  # i32 before optimization
    num_inliers: jnp.ndarray  # i32 after optimization
    inlier: jnp.ndarray  # [N] bool per current slot
    assoc_pos: jnp.ndarray  # [N,3] world position of the slot association


def _scatter_matches_to_current(best_idx, accepted, src_pos, N):
    """Matcher output is per-SOURCE (landmark/last-slot): (best current slot,
    accepted). Re-index to per-CURRENT-slot: source index + 3D position.
    One-hot contractions, no scatter."""
    M = best_idx.shape[0]
    it = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)
    oh = (best_idx[:, None] == it) & accepted[:, None]  # [M,N]
    pos_cur = jnp.einsum("mn,mk->nk", oh.astype(src_pos.dtype), src_pos)
    src = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    src_cur = jnp.sum(jnp.where(oh, src, 0), axis=0)
    has = jnp.any(oh, axis=0)
    return pos_cur, jnp.where(has, src_cur, -1), has


def make_cam_scalars(camera) -> CamScalars:
    p = camera.params
    return CamScalars(
        fx=p.fx, fy=p.fy, cx=p.cx, cy=p.cy, width=p.width, height=p.height,
        focal_x_baseline=p.focal_x_baseline,
    )


class TrackingKernels:
    """Holds jitted programs specialized to (camera, orb_params, slot count)."""

    def __init__(self, camera, orb_params, margin_last: float = 20.0,
                 margin_local: float = 5.0, margin_local_unstable: float = 20.0):
        self.camera = camera
        self.orb = orb_params
        self.cam_scalars = make_cam_scalars(camera)
        self.model = camera.model.name.lower()
        self.scale_factors = jnp.asarray(orb_params.scale_factors, dtype=jnp.float32)
        self.inv_sigma_sq = jnp.asarray(orb_params.inv_level_sigma_sq, dtype=jnp.float32)
        self.log_scale = float(jnp.log(jnp.float32(orb_params.scale_factor)))
        self.margin_last = margin_last
        self.margin_local = margin_local
        self.margin_local_unstable = margin_local_unstable

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "assume_forward", "assume_backward"))
    def motion_track(
        self,
        # current frame tensors
        cur_undist, cur_level, cur_desc, cur_valid, cur_angle, cur_xr,
        # last frame tensors + associations
        last_desc, last_level, last_angle, last_valid_assoc,  # [M]
        last_lm_pos,  # [M,3] world positions of last-frame associated landmarks
        # poses
        R_pred, t_pred,  # motion-model predicted pose (cam-from-world)
        margin,
        assume_forward=False, assume_backward=False,
    ) -> TrackResult:
        N = cur_desc.shape[0]
        cam = self.cam_scalars
        from stella_vslam_tpu.camera import base as cam_base
        from stella_vslam_tpu.camera.base import CameraModel

        model_enum = self.camera.model
        uv, depth, visible = cam_base.reproject_to_image(
            model_enum, self.camera.params, R_pred, t_pred, last_lm_pos
        )
        # predicted stereo x_right of the landmark
        lm_xr = jnp.where(
            depth > 1e-6, uv[:, 0] - cam.focal_x_baseline / jnp.maximum(depth, 1e-6), -1.0
        )
        lm_valid = last_valid_assoc & visible

        best_idx, accepted, _ = proj_match.match_current_and_last_frames(
            cur_undist, cur_level, cur_desc, cur_valid, cur_angle, cur_xr,
            last_desc, last_level, last_angle, uv, lm_xr, lm_valid,
            scale_factors=self.scale_factors, num_levels=self.orb.num_levels,
            margin=margin, assume_forward=assume_forward,
            assume_backward=assume_backward,
        )
        pos_cur, src_cur, has = _scatter_matches_to_current(
            best_idx, accepted, last_lm_pos, N
        )
        num_matches = jnp.sum(accepted)

        res = pose_opt.optimize_pose(
            R_pred, t_pred, pos_cur, cur_undist, cur_xr,
            H.take_small_table(self.inv_sigma_sq, cur_level),
            has, cam, model=self.model,
        )
        inlier = res.is_inlier & has
        return TrackResult(
            R_cw=res.R_cw, t_cw=res.t_cw,
            assoc_ref=jnp.where(inlier, src_cur, -1),
            num_matches=num_matches, num_inliers=jnp.sum(inlier), inlier=inlier,
            assoc_pos=pos_cur,
        )

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def keyframe_track(
        self,
        cur_undist, cur_level, cur_desc, cur_valid, cur_angle, cur_xr,
        # reference keyframe landmark slots
        kf_desc, kf_angle, kf_valid_assoc, kf_lm_pos,
        R_init, t_init,
    ) -> TrackResult:
        """Brute-force match vs a keyframe's associated slots + pose opt
        (replaces bow/robust_match_based_track)."""
        from stella_vslam_tpu.match import robust as robust_match

        N = cur_desc.shape[0]
        best_idx, accepted, _ = robust_match.brute_force_match(
            cur_angle, cur_desc, cur_valid,
            kf_angle, kf_desc, kf_valid_assoc,
            lowe_ratio=0.75,
        )
        pos_cur, src_cur, has = _scatter_matches_to_current(
            best_idx, accepted, kf_lm_pos, N
        )
        num_matches = jnp.sum(accepted)
        res = pose_opt.optimize_pose(
            R_init, t_init, pos_cur, cur_undist, cur_xr,
            H.take_small_table(self.inv_sigma_sq, cur_level),
            has, self.cam_scalars, model=self.model,
        )
        inlier = res.is_inlier & has
        return TrackResult(
            R_cw=res.R_cw, t_cw=res.t_cw,
            assoc_ref=jnp.where(inlier, src_cur, -1),
            num_matches=num_matches, num_inliers=jnp.sum(inlier), inlier=inlier,
            assoc_pos=pos_cur,
        )

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def local_map_track(
        self,
        cur_undist, cur_level, cur_desc, cur_valid, cur_angle, cur_xr,
        # current associations from the initial tracking stage
        assoc_pos,  # [N,3] world positions of already-matched slots
        assoc_valid,  # [N] bool
        # device landmark table
        tbl_pos, tbl_desc, tbl_normal, tbl_min_dist, tbl_max_dist, tbl_valid,
        R_cw, t_cw,
        margin,
    ):
        """Visibility-gate the full landmark table, match unassociated slots,
        then optimize with the union of associations.
        Returns (TrackResult, observable_mask [C], table_row_per_slot [N])."""
        cam = self.cam_scalars
        from stella_vslam_tpu.camera import base as cam_base

        N = cur_desc.shape[0]
        uv, depth, in_img = cam_base.reproject_to_image(
            self.camera.model, self.camera.params, R_cw, t_cw, tbl_pos
        )
        cam_center = -R_cw.T @ t_cw
        ray = tbl_pos - cam_center
        dist = jnp.linalg.norm(ray, axis=-1)
        # can_observe gates (frame.cc:59): distance range, viewing angle
        dist_ok = (dist >= 0.8 * tbl_min_dist) & (dist <= 1.3 * tbl_max_dist)
        cosang = jnp.sum(ray * tbl_normal, axis=-1) / jnp.maximum(dist, 1e-9)
        ang_ok = cosang > 0.5
        observable = tbl_valid & in_img & dist_ok & ang_ok & (depth > 0)

        # predicted scale level (landmark.h:114)
        ratio = jnp.maximum(tbl_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
        pred = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / self.log_scale)
        pred_scale = jnp.clip(pred, 0, self.orb.num_levels - 1).astype(jnp.int32)

        lm_xr = jnp.where(
            depth > 1e-6, uv[:, 0] - cam.focal_x_baseline / jnp.maximum(depth, 1e-6), -1.0
        )

        best_idx, accepted, _ = proj_match.match_frame_and_landmarks(
            cur_undist, cur_level, cur_desc, cur_valid, assoc_valid, cur_xr,
            tbl_desc, uv, lm_xr, pred_scale, observable,
            scale_factors=self.scale_factors, num_levels=self.orb.num_levels,
            margin=margin, lowe_ratio=0.6,
        )
        new_pos, new_src, new_has = _scatter_matches_to_current(
            best_idx, accepted, tbl_pos, N
        )
        pos_all = jnp.where(assoc_valid[:, None], assoc_pos, new_pos)
        has_all = assoc_valid | new_has

        res = pose_opt.optimize_pose(
            R_cw, t_cw, pos_all, cur_undist, cur_xr,
            H.take_small_table(self.inv_sigma_sq, cur_level),
            has_all, cam, model=self.model,
        )
        inlier = res.is_inlier & has_all
        result = TrackResult(
            R_cw=res.R_cw, t_cw=res.t_cw,
            assoc_ref=jnp.where(new_has & inlier, new_src, -1),
            num_matches=jnp.sum(has_all), num_inliers=jnp.sum(inlier),
            inlier=inlier, assoc_pos=pos_all,
        )
        return result, observable
