"""Fused per-frame tracking device programs.

The reference splits per-frame work across frame_tracker (module/frame_tracker
.cc), the projection matcher, and pose_optimizer, each iterating over dynamic
landmark sets with host control flow between stages. Here the ENTIRE per-frame
tracking cascade is ONE jitted fixed-shape program:

  1. motion-model stage: project last-frame associations with the predicted
     pose, dense-match (reference margin semantics,
     projection.cc match_current_and_last_frames), 4-round LM pose opt;
  2. keyframe fallback (lax.cond, only executed when stage 1's inlier count
     is below threshold): brute-force match against the reference keyframe's
     associated slots + pose opt from the last pose
     (frame_tracker.cc bow/robust_match_based_track roles);
  3. local-map stage: visibility-gate the WHOLE device-resident landmark
     table (reference can_observe gates, frame.cc:59 +
     search_local_landmarks, tracking_module.cc:533-607), dense-match the
     still-unassociated slots, and run the final pose optimization.

No host synchronization happens between stages — on the target TPU stack each
host<->device interaction costs 5-80 ms, so the tracking module dispatches
this program asynchronously and reads back one packed result while the next
frame's image uploads (software pipelining across frames).

Association bookkeeping returns as per-slot LANDMARK IDS (chained on device
alongside positions, deduplicated after the final chi-square gates); -1 where
a slot has no association.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stella_vslam_tpu.camera import base as cam_base
from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.match import hamming as H
from stella_vslam_tpu.match import projection as proj_match
from stella_vslam_tpu.match import robust as robust_match
from stella_vslam_tpu.ops.optim import pose as pose_opt
from stella_vslam_tpu.ops.optim.residuals import CamScalars


class FullTrackOut(NamedTuple):
    """Readback-minimized output: the host performs exactly ONE device->host
    copy per frame — a single device->host round trip measures ~33 ms on the
    relay, so everything is packed into one f32 vector (ids/flags cast to
    f32, exact below 2^24). assoc_pos/assoc_valid/assoc_id stay on device
    (chained into the next frame).

    packed layout: pose R(9) t(3) | counts(4) | lm_id(N) | inlier(N)
    | observable(C)"""

    packed: jnp.ndarray  # [16 + 2N + C] f32
    assoc_pos: jnp.ndarray  # [N,3] device-chained association positions
    assoc_valid: jnp.ndarray  # [N]
    assoc_id: jnp.ndarray  # [N] i32 device-chained landmark ids (-1 = none)
    R_cw: jnp.ndarray  # [3,3] device (pose chain for the next dispatch)
    t_cw: jnp.ndarray  # [3] device


def _scatter_matches_to_current(best_idx, accepted, src_pos, src_id, N):
    """Matcher output is per-SOURCE: (best current slot, accepted). Re-index
    per-CURRENT-slot, carrying the landmark id of each source association.
    When several sources pick the same current keypoint the association is
    AMBIGUOUS — the slot is dropped entirely (keeping an arbitrary source
    would feed a plausible-looking wrong pair into the pose optimization,
    which drags the pose; the reference's matchers resolve such contests by
    distance and never emit two landmarks for one keypoint). One-hot
    contractions, no scatter."""
    M = best_idx.shape[0]
    it = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)
    oh = (best_idx[:, None] == it) & accepted[:, None]  # [M,N]
    oh = oh & (jnp.sum(oh.astype(jnp.int32), axis=0, keepdims=True) == 1)
    pos_cur = jnp.einsum("mn,mk->nk", oh.astype(src_pos.dtype), src_pos)
    id_cur = jnp.sum(jnp.where(oh, src_id[:, None], 0), axis=0)
    has = jnp.any(oh, axis=0)
    return pos_cur, jnp.where(has, id_cur, -1), has


def _dedup_by_landmark_id(has, ids, score):
    """One keypoint slot per landmark. Duplicate candidates (the same
    landmark matched at a chained slot AND a fresh table slot) are kept all
    the way THROUGH the pose optimization — they are independent
    measurements and the chi-square gates decide which keypoint was right —
    and only then deduplicated here, keeping the lowest-`score` (residual)
    slot. Deduplicating before the optimizer would pick a slot blindly and
    discard the correct one whenever descriptor aliasing matched the
    landmark to a neighboring keypoint. Reference matchers enforce
    one-observation-per-landmark by construction; the dense pipeline must do
    it explicitly or duplicates multiply across frames, corrupting keyframe
    observations and observability statistics."""
    N = has.shape[0]
    ids_m = jnp.where(has, ids, -1)
    eq = (ids_m[:, None] == ids_m[None, :]) & has[:, None] & has[None, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    # slot j beats slot i when it has a lower score (ties break to j<i)
    beats = (score[None, :] < score[:, None]) | (
        (score[None, :] == score[:, None]) & (col < row)
    )
    dup = jnp.any(eq & beats & (col != row), axis=1)
    has = has & ~dup
    return has, jnp.where(has, ids, -1)


def make_cam_scalars(camera) -> CamScalars:
    p = camera.params
    return CamScalars(
        fx=p.fx, fy=p.fy, cx=p.cx, cy=p.cy, width=p.width, height=p.height,
        focal_x_baseline=p.focal_x_baseline,
    )


class TrackingKernels:
    """Holds jitted programs specialized to (camera, orb_params, slot count).

    Instances hash/compare by CONFIGURATION (not identity): these objects are
    passed as static jit arguments, and identity hashing would recompile every
    program for every new System instance (measured: minutes per compile on
    the remote-compile stack)."""

    def __init__(self, camera, orb_params, margin_last: float = 20.0,
                 margin_local: float = 5.0, margin_local_unstable: float = 20.0,
                 num_matches_thr: int = 10):
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
        self.num_matches_thr = num_matches_thr
        self._config_key = (
            tuple(sorted(camera.to_json().items())),
            tuple(orb_params.scale_factors), orb_params.num_levels,
            margin_last, margin_local, margin_local_unstable, num_matches_thr,
        )

    def __hash__(self):
        return hash(self._config_key)

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other._config_key == self._config_key
        )

    # ------------------------------------------------------------------
    def _pose_opt(self, R0, t0, pos, uv, xr, level, has):
        return pose_opt.optimize_pose(
            R0, t0, pos, uv, xr,
            H.take_small_table(self.inv_sigma_sq, level),
            has, self.cam_scalars, model=self.model,
        )

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "use_motion", "margin_local"))
    def track_frame(
        self,
        # current frame tensors
        cur_undist, cur_level, cur_desc, cur_valid, cur_angle, cur_xr,
        # last frame tensors + device-chained associations
        last_desc, last_level, last_angle,
        last_assoc_pos, last_assoc_valid, last_assoc_id,
        # reference keyframe tensors + associations
        kf_desc, kf_angle, kf_assoc_pos, kf_assoc_valid, kf_assoc_id,
        # device landmark table: TWO packed buffers (TableSnap layout —
        # tbl_f32 [C,8]: pos|normal|min_dist|max_dist; tbl_u32 [C,10]:
        # desc|ids-bits|valid), unpacked here inside the program so a table
        # publish costs two uploads instead of seven
        tbl_f32, tbl_u32,
        # device-chained poses: last frame (t-1) and the one before (t-2);
        # the motion-model prediction is computed ON DEVICE so the dispatch
        # needs no host-side pose (the previous frame may not be finalized yet)
        R_last, t_last, R_prev, t_prev,
        use_motion: bool = True,
        margin_local: float = 5.0,
    ) -> FullTrackOut:
        tbl_pos = tbl_f32[:, 0:3]
        tbl_normal = tbl_f32[:, 3:6]
        tbl_min_dist = tbl_f32[:, 6]
        tbl_max_dist = tbl_f32[:, 7]
        tbl_desc = tbl_u32[:, :8]
        tbl_ids = jax.lax.bitcast_convert_type(tbl_u32[:, 8], jnp.int32)
        tbl_valid = tbl_u32[:, 9] > 0
        N = cur_desc.shape[0]
        cam = self.cam_scalars
        # Chained rotations MUST be re-projected onto SO(3) before using R^T
        # as the inverse: the chain multiplies ~3 rotations per frame in f32
        # and an off-manifold error AMPLIFIES ~3x per frame (exponential pose
        # divergence) if not reset here.
        R_last = lie.so3_project(R_last)
        R_prev = lie.so3_project(R_prev)
        # pred = twist o T_last, twist = T_last o T_prev^-1 (cc:401-413)
        Rp_inv = R_prev.T
        tp_inv = -Rp_inv @ t_prev
        R_tw = R_last @ Rp_inv
        t_tw = R_last @ tp_inv + t_last
        R_pred = R_tw @ R_last
        t_pred = R_tw @ t_last + t_tw

        # ---------- stage 1: motion-model tracking ----------
        if use_motion:
            uv_l, depth_l, vis_l = cam_base.reproject_to_image(
                self.camera.model, self.camera.params, R_pred, t_pred,
                last_assoc_pos,
            )
            lm_xr = jnp.where(
                depth_l > 1e-6,
                uv_l[:, 0] - cam.focal_x_baseline / jnp.maximum(depth_l, 1e-6),
                -1.0,
            )
            m_idx, m_acc, _ = proj_match.match_current_and_last_frames(
                cur_undist, cur_level, cur_desc, cur_valid, cur_angle, cur_xr,
                last_desc, last_level, last_angle, uv_l, lm_xr,
                last_assoc_valid & vis_l,
                scale_factors=self.scale_factors,
                num_levels=self.orb.num_levels, margin=self.margin_last,
            )
            pos1, id1, has1 = _scatter_matches_to_current(
                m_idx, m_acc, last_assoc_pos, last_assoc_id, N
            )
            res1 = self._pose_opt(
                R_pred, t_pred, pos1, cur_undist, cur_xr, cur_level, has1
            )
            inl1 = res1.is_inlier & has1
            n1 = jnp.sum(inl1)
        else:
            n1 = jnp.int32(0)

        # ---------- stage 2: keyframe fallback (conditional) ----------
        def fallback(_):
            b_idx, b_acc, _ = robust_match.brute_force_match(
                cur_angle, cur_desc, cur_valid,
                kf_angle, kf_desc, kf_assoc_valid,
                lowe_ratio=0.75,
            )
            pos2, id2, has2 = _scatter_matches_to_current(
                b_idx, b_acc, kf_assoc_pos, kf_assoc_id, N
            )
            res2 = self._pose_opt(
                R_last, t_last, pos2, cur_undist, cur_xr, cur_level, has2
            )
            inl2 = res2.is_inlier & has2
            return (res2.R_cw, res2.t_cw, pos2, inl2,
                    jnp.where(inl2, id2, -1), jnp.int32(1))

        if use_motion:
            def keep(_):
                return (res1.R_cw, res1.t_cw, pos1, inl1,
                        jnp.where(inl1, id1, -1), jnp.int32(0))

            (R_s1, t_s1, pos_s1, has_s1, id_s1, used_fb) = jax.lax.cond(
                n1 >= self.num_matches_thr, keep, fallback, operand=None
            )
        else:
            (R_s1, t_s1, pos_s1, has_s1, id_s1, used_fb) = fallback(None)

        # ---------- stage 3: local-map tracking over the table ----------
        uv_t, depth_t, in_img = cam_base.reproject_to_image(
            self.camera.model, self.camera.params, R_s1, t_s1, tbl_pos
        )
        cam_center = -R_s1.T @ t_s1
        ray = tbl_pos - cam_center
        dist = jnp.linalg.norm(ray, axis=-1)
        dist_ok = (dist >= 0.8 * tbl_min_dist) & (dist <= 1.3 * tbl_max_dist)
        cosang = jnp.sum(ray * tbl_normal, axis=-1) / jnp.maximum(dist, 1e-9)
        observable = tbl_valid & in_img & dist_ok & (cosang > 0.5) & (depth_t > 0)

        ratio = jnp.maximum(tbl_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
        pred_scale = jnp.clip(
            jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / self.log_scale),
            0, self.orb.num_levels - 1,
        ).astype(jnp.int32)
        lm_xr_t = jnp.where(
            depth_t > 1e-6,
            uv_t[:, 0] - cam.focal_x_baseline / jnp.maximum(depth_t, 1e-6),
            -1.0,
        )
        # match the whole observable table against the still-unassociated
        # slots (reference search_local_landmarks, tracking_module.cc:533-607).
        # A landmark already chained at one slot may ALSO match a free slot —
        # both candidates go through the pose optimization and the chi-square
        # evidence picks the right keypoint (post-gate dedup below).
        t_idx, t_acc, _ = proj_match.match_frame_and_landmarks(
            cur_undist, cur_level, cur_desc, cur_valid, has_s1, cur_xr,
            tbl_desc, uv_t, lm_xr_t, pred_scale, observable,
            scale_factors=self.scale_factors, num_levels=self.orb.num_levels,
            margin=margin_local, lowe_ratio=0.6,
        )
        pos_new, id_new, has_new = _scatter_matches_to_current(
            t_idx, t_acc, tbl_pos, tbl_ids, N
        )
        # chained association keeps its slot; a fresh table match fills any
        # other slot (possibly duplicating the landmark — resolved after the
        # pose optimization by the chi-square evidence)
        pos_all = jnp.where(has_s1[:, None], pos_s1, pos_new)
        ids_all = jnp.where(has_s1, id_s1, id_new)
        has_all = has_s1 | has_new

        res3 = self._pose_opt(
            R_s1, t_s1, pos_all, cur_undist, cur_xr, cur_level, has_all
        )
        inlier = res3.is_inlier & has_all
        inlier, ids_all = _dedup_by_landmark_id(
            inlier, ids_all, jnp.where(inlier, res3.chi_sq, jnp.inf)
        )
        counts = jnp.stack(
            [n1.astype(jnp.int32), used_fb, jnp.sum(has_all).astype(jnp.int32),
             jnp.sum(inlier).astype(jnp.int32)]
        )
        out_ids = jnp.where(inlier, ids_all, -1)
        packed = jnp.concatenate([
            res3.R_cw.reshape(-1), res3.t_cw,
            counts.astype(jnp.float32),
            out_ids.astype(jnp.float32),  # exact below 2^24
            inlier.astype(jnp.float32),
            observable.astype(jnp.float32),
        ])
        return FullTrackOut(
            packed=packed,
            assoc_pos=jnp.where(inlier[:, None], pos_all, 0.0),
            assoc_valid=inlier,
            assoc_id=out_ids,
            R_cw=res3.R_cw, t_cw=res3.t_cw,
        )
