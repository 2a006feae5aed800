"""Device programs for the mapping thread: two-view triangulation + fuse prep.

Reference: src/stella_vslam/module/two_view_triangulator.{h,cc} (per-match
checks: parallax, positive depth both views, reprojection chi-square on the
octave sigma, scale-factor consistency) driven from
mapping_module::create_new_landmarks (mapping_module.cc:275-381) with
epipolar-gated matching (match::robust::match_for_triangulation).
Here: one jitted program per keyframe pair — dense epipolar matching, batched
DLT triangulation, all validity checks vectorized.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stella_vslam_tpu.camera import base as cam_base
from stella_vslam_tpu.match import hamming as H
from stella_vslam_tpu.match import robust as robust_match
from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops import triangulation as tri
from stella_vslam_tpu.ops.solve import essential as esolve

CHI_SQ_2D = 5.991


class TriangulationResult(NamedTuple):
    pos_w: jnp.ndarray  # [N1,3]
    idx2: jnp.ndarray  # [N1] matched keypoint in kf2 (-1 none)
    ok: jnp.ndarray  # [N1] all checks passed


class MappingKernels:
    """Hash/eq by configuration — see TrackingKernels (static jit args)."""

    def __init__(self, camera, orb_params):
        self.camera = camera
        self.orb = orb_params
        self.scale_factors = jnp.asarray(orb_params.scale_factors, dtype=jnp.float32)
        self.level_sigma_sq = jnp.asarray(orb_params.level_sigma_sq, dtype=jnp.float32)
        self._config_key = (
            tuple(sorted(camera.to_json().items())),
            tuple(orb_params.scale_factors), orb_params.num_levels,
        )

    def __hash__(self):
        return hash(self._config_key)

    def __eq__(self, other):
        return type(other) is type(self) and other._config_key == self._config_key

    @partial(jax.jit, static_argnames=("self",))
    def triangulate_pair(self, *args):
        return self._triangulate_pair_impl(*args)

    def _triangulate_pair_impl(
        self,
        # keyframe 1 (new) tensors
        kp1_uv, kp1_level, kp1_desc, kp1_bear, kp1_angle, kp1_valid_unassoc,
        kp1_is_stereo, kp1_xr,
        # keyframe 2 tensors
        kp2_uv, kp2_level, kp2_desc, kp2_bear, kp2_angle, kp2_valid_unassoc,
        kp2_is_stereo, kp2_xr,
        # poses (cam-from-world)
        R1, t1, R2, t2,
    ) -> TriangulationResult:
        # E and epipole for the matcher (mapping_module.cc:326)
        E_12 = esolve.create_E_21(R2, t2, R1, t1)  # kf1<-kf2 bearing constraint
        C1 = -R1.T @ t1
        ep2_cam = R2 @ C1 + t2
        ep2_norm = jnp.linalg.norm(ep2_cam)
        epiplane_in_2 = ep2_cam / jnp.maximum(ep2_norm, 1e-12)

        idx2, accepted, _ = robust_match.match_for_triangulation(
            kp1_angle, kp1_level, kp1_desc, kp1_bear, kp1_valid_unassoc,
            kp1_is_stereo,
            kp2_angle, kp2_desc, kp2_bear, kp2_valid_unassoc, kp2_is_stereo,
            E_12, epiplane_in_2, True,
            scale_factors=self.scale_factors,
        )
        N1 = kp1_desc.shape[0]
        N2 = kp2_desc.shape[0]
        # matched kf2 attributes per kf1 slot via one-hot rows
        b2m = jnp.stack(
            [H.take_rows(kp2_bear[:, i], idx2, N2) for i in range(3)], axis=-1
        )
        uv2m = jnp.stack(
            [H.take_rows(kp2_uv[:, i], idx2, N2) for i in range(2)], axis=-1
        )
        lvl2m = H.take_rows(kp2_level, idx2, N2)

        # triangulate in world frame (DLT over both poses)
        P1 = jnp.concatenate([R1, t1[:, None]], axis=1)
        P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
        pos_w = tri.triangulate_dlt(kp1_bear, b2m, P1, P2)

        # ---- two_view_triangulator checks ----
        pc1 = pos_w @ R1.T + t1
        pc2 = pos_w @ R2.T + t2
        depth_ok = (pc1[:, 2] > 0) & (pc2[:, 2] > 0)

        # parallax between rays (reference: cos_rays < 0.99998 ~ 0.36 deg;
        # stereo-supported points may pass without parallax — mono slice here)
        ray1 = pos_w - C1
        C2 = -R2.T @ t2
        ray2 = pos_w - C2
        cos_rays = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12
        )
        parallax_ok = cos_rays < 0.99998

        # reprojection chi-square in both views
        uv1p, _, vis1 = cam_base.reproject_to_image(
            self.camera.model, self.camera.params, R1, t1, pos_w
        )
        uv2p, _, vis2 = cam_base.reproject_to_image(
            self.camera.model, self.camera.params, R2, t2, pos_w
        )
        s1 = H.take_small_table(self.level_sigma_sq, kp1_level)
        s2 = H.take_small_table(self.level_sigma_sq, lvl2m)
        e1 = jnp.sum((uv1p - kp1_uv) ** 2, axis=-1) / s1
        e2 = jnp.sum((uv2p - uv2m) ** 2, axis=-1) / s2
        reproj_ok = (e1 <= CHI_SQ_2D) & (e2 <= CHI_SQ_2D) & vis1 & vis2

        # scale consistency (two_view_triangulator.cc: ratio of camera
        # distances within the scale-factor ratio x 2)
        d1 = jnp.linalg.norm(ray1, axis=-1)
        d2 = jnp.linalg.norm(ray2, axis=-1)
        sf1 = H.take_small_table(self.scale_factors, kp1_level)
        sf2 = H.take_small_table(self.scale_factors, lvl2m)
        ratio_dist = d2 / jnp.maximum(d1, 1e-12)
        ratio_scale = sf2 / jnp.maximum(sf1, 1e-12)
        scale_ok = (ratio_dist < ratio_scale * 2.0) & (
            ratio_dist > ratio_scale / 2.0
        )

        ok = accepted & depth_ok & parallax_ok & reproj_ok & scale_ok
        return TriangulationResult(
            pos_w=pos_w, idx2=jnp.where(ok, idx2, -1), ok=ok
        )

    # ------------------------------------------------------------------
    def _triangulate_multi_impl(
        self,
        kp1_uv, kp1_level, kp1_desc, kp1_bear, kp1_angle, kp1_valid_unassoc,
        kp1_is_stereo, kp1_xr,
        # stacked neighbor tensors [B, ...]
        kp2_uv, kp2_level, kp2_desc, kp2_bear, kp2_angle, kp2_valid_unassoc,
        kp2_is_stereo, kp2_xr,
        R1, t1,
        R2, t2,  # [B,3,3], [B,3]
        pair_valid,  # [B] bool
    ):
        """Triangulate the new keyframe against B neighbors in ONE program
        (the reference loops neighbors on the mapping thread,
        mapping_module.cc:286-340; per-dispatch latency on the target stack
        makes one vmapped program ~B x cheaper)."""

        def one(kp2_uv_, kp2_level_, kp2_desc_, kp2_bear_, kp2_angle_,
                kp2_un_, kp2_st_, kp2_xr_, R2_, t2_, pv):
            res = self._triangulate_pair_impl(
                kp1_uv, kp1_level, kp1_desc, kp1_bear, kp1_angle,
                kp1_valid_unassoc, kp1_is_stereo, kp1_xr,
                kp2_uv_, kp2_level_, kp2_desc_, kp2_bear_, kp2_angle_,
                kp2_un_, kp2_st_, kp2_xr_, R1, t1, R2_, t2_,
            )
            return TriangulationResult(
                pos_w=res.pos_w,
                idx2=jnp.where(pv, res.idx2, -1),
                ok=res.ok & pv,
            )

        return jax.vmap(one)(
            kp2_uv, kp2_level, kp2_desc, kp2_bear, kp2_angle,
            kp2_valid_unassoc, kp2_is_stereo, kp2_xr, R2, t2, pair_valid,
        )

    @partial(jax.jit, static_argnames=("self",))
    def triangulate_multi(self, *args):
        return self._triangulate_multi_impl(*args)

    @partial(jax.jit, static_argnames=("self",))
    def triangulate_gather(self, cur, others, pair_valid):
        """Pytree entry point: `cur` is a tuple of the 10 current-keyframe
        tensors (uv, level, desc, bear, angle, unassoc, is_stereo, xr, R, t);
        `others` a tuple of B such tuples for the neighbors. Stacking happens
        INSIDE the program — the host issues ONE dispatch instead of ~13
        eager jnp.stack calls per mapped keyframe (each eager op costs
        trace+dispatch overhead on the tunneled runtime)."""
        stacked = [jnp.stack(vals) for vals in zip(*others)]
        (kp1_uv, kp1_level, kp1_desc, kp1_bear, kp1_angle, kp1_un,
         kp1_st, kp1_xr, R1, t1) = cur
        return self._triangulate_multi_impl(
            kp1_uv, kp1_level, kp1_desc, kp1_bear, kp1_angle, kp1_un,
            kp1_st, kp1_xr,
            stacked[0], stacked[1], stacked[2], stacked[3], stacked[4],
            stacked[5], stacked[6], stacked[7],
            R1, t1, stacked[8], stacked[9], pair_valid,
        )

    @partial(jax.jit, static_argnames=("self",))
    def triangulate_packed(self, cur_dev, others_dev, masks_pack, pose_pack):
        """Packed-upload entry: device-resident per-keyframe tensors ride as
        pytree leaves (no transfer), while every HOST-side operand crosses
        in TWO buffers instead of ~24 — `masks_pack` [B+1, N, 2] f32
        (unassoc, is_stereo; row 0 = current keyframe) and `pose_pack`
        [B+1, 13] f32 (R row-major | t | pair_valid; row 0 = current).
        Each small transfer costs per-op tunnel latency (measured 1-3 ms
        quiet, 10x under load), so the upload COUNT is what the keyframe
        event's weather exposure scales with."""
        (kp1_uv, kp1_level, kp1_desc, kp1_bear, kp1_angle, kp1_xr) = cur_dev
        stacked = [jnp.stack(vals) for vals in zip(*others_dev)]
        R_all = pose_pack[:, :9].reshape(-1, 3, 3)
        t_all = pose_pack[:, 9:12]
        pair_valid = pose_pack[1:, 12] > 0
        un = masks_pack[..., 0] > 0
        st = masks_pack[..., 1] > 0
        return self._triangulate_multi_impl(
            kp1_uv, kp1_level, kp1_desc, kp1_bear, kp1_angle, un[0],
            st[0], kp1_xr,
            stacked[0], stacked[1], stacked[2], stacked[3], stacked[4],
            un[1:], st[1:], stacked[5],
            R_all[0], t_all[0], R_all[1:], t_all[1:], pair_valid,
        )

    def _fuse_multi_impl(
        self,
        # stacked keyframe tensors [B, ...]
        kf_uv, kf_level, kf_desc, kf_valid, kf_xr,
        R_cw, t_cw,  # [B,3,3], [B,3]
        kf_batch_valid,  # [B] bool (padding slots masked)
        # landmark candidate arrays [M, ...]
        lm_pos, lm_desc, lm_min_dist, lm_max_dist, lm_normal, lm_valid,
        margin: float = 3.0,
    ):
        """Fuse-candidate detection against B keyframes in ONE program
        (reference fuse loops keyframes on the mapping thread; margin 3 in
        mapping fusion, 4 in loop-closure fusion — match/fuse.cc callers)."""
        from stella_vslam_tpu.match import fuse as fuse_match

        def one(uv_, lvl_, desc_, val_, xr_, R_, t_, bv_):
            ruv, rxr, pred, gate = self._reproject_for_fuse_impl(
                R_, t_, lm_pos, lm_min_dist, lm_max_dist, lm_normal, lm_valid
            )
            best_idx, accepted, _ = fuse_match.detect_duplication(
                uv_, lvl_, desc_, val_, xr_,
                lm_desc, ruv, rxr, pred, gate,
                scale_factors=self.scale_factors,
                level_sigma_sq=self.level_sigma_sq,
                num_levels=self.orb.num_levels, margin=margin,
            )
            return best_idx, accepted & bv_

        return jax.vmap(one)(
            kf_uv, kf_level, kf_desc, kf_valid, kf_xr, R_cw, t_cw, kf_batch_valid
        )

    @partial(jax.jit, static_argnames=("self", "margin"))
    def fuse_multi(self, *args, margin: float = 3.0):
        return self._fuse_multi_impl(*args, margin=margin)

    @partial(jax.jit, static_argnames=("self", "margin"))
    def fuse_gather(
        self, kfs, kf_batch_valid,
        lm_pos, lm_desc, lm_min_dist, lm_max_dist, lm_normal, lm_valid,
        margin: float = 3.0,
    ):
        """Pytree entry point: `kfs` is a tuple of B per-keyframe tuples
        (uv, level, desc, valid, xr, R, t); stacking happens inside the
        program (see triangulate_gather)."""
        s = [jnp.stack(vals) for vals in zip(*kfs)]
        return self._fuse_multi_impl(
            s[0], s[1], s[2], s[3], s[4], s[5], s[6], kf_batch_valid,
            lm_pos, lm_desc, lm_min_dist, lm_max_dist, lm_normal, lm_valid,
            margin=margin,
        )

    @partial(jax.jit, static_argnames=("self", "margin"))
    def fuse_packed(self, kfs_dev, kf_pack, lm_pack, lm_desc,
                    margin: float = 3.0):
        """Packed-upload entry: `kfs_dev` is a tuple of B per-keyframe
        tuples of DEVICE tensors (uv, level, desc, valid, xr); every
        host-side operand crosses in THREE buffers — `kf_pack` [B, 13] f32
        (R row-major | t | batch_valid), `lm_pack` [M, 9] f32 (pos | dmin |
        dmax | normal | valid), `lm_desc` [M, 8] u32 — instead of ~38 per
        chunk (see triangulate_packed on why the COUNT matters)."""
        s = [jnp.stack(vals) for vals in zip(*kfs_dev)]
        R_cw = kf_pack[:, :9].reshape(-1, 3, 3)
        t_cw = kf_pack[:, 9:12]
        kf_batch_valid = kf_pack[:, 12] > 0
        return self._fuse_multi_impl(
            s[0], s[1], s[2], s[3], s[4], R_cw, t_cw, kf_batch_valid,
            lm_pack[:, 0:3], lm_desc, lm_pack[:, 3], lm_pack[:, 4],
            lm_pack[:, 5:8], lm_pack[:, 8] > 0,
            margin=margin,
        )

    @partial(jax.jit, static_argnames=("self",))
    def reproject_landmarks_for_fuse(
        self, R_cw, t_cw, lm_pos, lm_min_dist, lm_max_dist, lm_normal, lm_valid
    ):
        return self._reproject_for_fuse_impl(
            R_cw, t_cw, lm_pos, lm_min_dist, lm_max_dist, lm_normal, lm_valid
        )

    def _reproject_for_fuse_impl(
        self, R_cw, t_cw, lm_pos, lm_min_dist, lm_max_dist, lm_normal, lm_valid
    ):
        """Visibility + distance/direction gates for fuse candidates
        (reference fuse.cc:50-71). Returns (uv, x_right_pred, pred_scale,
        gate_mask)."""
        uv, depth, in_img = cam_base.reproject_to_image(
            self.camera.model, self.camera.params, R_cw, t_cw, lm_pos
        )
        cam_center = -R_cw.T @ t_cw
        ray = lm_pos - cam_center
        dist = jnp.linalg.norm(ray, axis=-1)
        dist_ok = (dist >= lm_min_dist / 1.3) & (dist <= lm_max_dist * 1.3)
        cosang = jnp.sum(ray * lm_normal, axis=-1) / jnp.maximum(dist, 1e-9)
        ang_ok = cosang > 0.5
        log_scale = jnp.log(jnp.float32(self.orb.scale_factor))
        ratio = jnp.maximum(lm_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
        pred = jnp.clip(
            jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale),
            0, self.orb.num_levels - 1,
        ).astype(jnp.int32)
        xr = jnp.where(
            depth > 1e-6,
            uv[:, 0] - self.camera.params.focal_x_baseline / jnp.maximum(depth, 1e-6),
            -1.0,
        )
        gate = lm_valid & in_img & dist_ok & ang_ok & (depth > 0)
        return uv, xr, pred, gate
