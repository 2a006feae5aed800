"""Relocalization: BoW candidates -> match -> PnP RANSAC -> pose refinement.

Reference: src/stella_vslam/module/relocalizer.{h,cc} — acquire BoW candidates
(cc:56-64); per candidate: (BoW|robust) match needing >= min_num_bow_matches
(20) -> EPnP RANSAC -> pose optimization -> projection-match refinement until
>= min_num_valid_obs (50) inliers (relocalizer.h:44-63).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.util.fetch import fetch_all

from stella_vslam_tpu.match import projection as proj_match
from stella_vslam_tpu.match import robust as robust_match
from stella_vslam_tpu.ops.solve import pnp as pnp_solve
from stella_vslam_tpu.ops.optim import pose as pose_opt
from stella_vslam_tpu.match import hamming as H


class Relocalizer:
    def __init__(self, camera, orb_params, bow_db, *,
                 min_num_bow_matches: int = 20, min_num_valid_obs: int = 50,
                 use_fixed_seed: bool = False):
        self.camera = camera
        self.orb = orb_params
        self.bow_db = bow_db
        self.min_num_bow_matches = min_num_bow_matches
        self.min_num_valid_obs = min_num_valid_obs
        self.scale_factors = jnp.asarray(orb_params.scale_factors, dtype=jnp.float32)
        self.inv_sigma_sq = jnp.asarray(orb_params.inv_level_sigma_sq, dtype=jnp.float32)
        self._key = jax.random.PRNGKey(7 if use_fixed_seed else np.random.randint(1 << 30))
        from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars

        self.cam_scalars = make_cam_scalars(camera)
        self.model = camera.model.name.lower()

    # ------------------------------------------------------------------
    def warmup(self, num_slots: int):
        """Compile every device program the relocalization cascade can
        dispatch. Relocalization fires at the worst possible moment
        (tracking just lost); a cold first attempt measured 1.5-2.7 s of
        mid-run jit lowering on the tunneled backend."""
        n = num_slots
        f32 = lambda *s: jnp.zeros(s, jnp.float32)
        u32 = lambda *s: jnp.zeros(s, jnp.uint32)
        i32 = lambda *s: jnp.zeros(s, jnp.int32)
        bl = lambda *s: jnp.zeros(s, bool)
        eye3 = jnp.eye(3, dtype=jnp.float32)
        outs = []
        b = robust_match.brute_force_match(
            f32(n), u32(n, 8), bl(n), f32(n), u32(n, 8), bl(n),
            lowe_ratio=0.75)
        outs.append(b[0])
        res = pnp_solve.find_via_ransac(
            jax.random.PRNGKey(0), f32(n, 3), f32(n, 3), i32(n), bl(n),
            scale_factors=self.scale_factors,
            min_num_inliers=self.min_num_bow_matches)
        outs.append(res.valid)
        opt = pose_opt.optimize_pose(
            eye3, f32(3), f32(n, 3), f32(n, 2), f32(n),
            H.take_small_table(self.inv_sigma_sq, i32(n)), bl(n),
            self.cam_scalars, model=self.model)
        outs.append(opt.R_cw)
        uv, _, vis = self.camera.reproject(eye3, f32(3), f32(n, 3))
        p = proj_match.match_frame_and_keyframe(
            f32(n, 2), i32(n), u32(n, 8), bl(n), f32(n), bl(n),
            u32(n, 8), uv, i32(n), f32(n), vis,
            scale_factors=self.scale_factors,
            num_levels=self.orb.num_levels, margin=10.0)
        outs.append(p[0])
        for o in outs:
            jax.block_until_ready(o)

    # ------------------------------------------------------------------
    def relocalize(self, map_db, frm) -> bool:
        vocab = self.bow_db.vocab
        words, bow_vec = vocab.compute_bow(frm.h_desc, frm.h_valid)
        candidates = self.bow_db.acquire_keyframes(bow_vec)
        for kf_id in candidates[:5]:
            kf = map_db.keyframes.get(kf_id)
            if kf is None or kf.will_be_erased:
                continue
            if self.reloc_by_candidate(map_db, frm, kf):
                return True
        return False

    # ------------------------------------------------------------------
    def reloc_by_candidate(self, map_db, frm, kf) -> bool:
        # 1. brute-force 2D-3D matches vs the keyframe's landmark slots
        kf_pos = np.zeros((kf.num_slots, 3), np.float32)
        kf_has = np.zeros(kf.num_slots, bool)
        for i in np.nonzero(kf.lm_ids >= 0)[0]:
            lm = map_db.landmarks.get(int(kf.lm_ids[i]))
            if lm is None or lm.will_be_erased:
                continue
            kf_pos[i] = lm.pos_w
            kf_has[i] = True
        if kf_has.sum() < self.min_num_bow_matches:
            return False
        b_idx, b_acc, _ = robust_match.brute_force_match(
            frm.feats.angle, frm.feats.desc, frm.feats.valid,
            kf.feats.angle, kf.feats.desc, jnp.asarray(kf_has),
            lowe_ratio=0.75,
        )
        acc = np.asarray(b_acc)
        idx = np.asarray(b_idx)
        if acc.sum() < self.min_num_bow_matches:
            return False

        # 2. per-frame-slot 3D correspondences
        n = frm.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        src_kf_slot = np.full(n, -1, np.int64)
        for kf_slot in np.nonzero(acc)[0]:
            f_slot = idx[kf_slot]
            pos[f_slot] = kf_pos[kf_slot]
            has[f_slot] = True
            src_kf_slot[f_slot] = kf_slot

        # 3. PnP RANSAC on bearings
        self._key, sub = jax.random.split(self._key)
        res = pnp_solve.find_via_ransac(
            sub, frm.bearings, jnp.asarray(pos),
            frm.feats.level, jnp.asarray(has),
            scale_factors=self.scale_factors,
            min_num_inliers=self.min_num_bow_matches,
        )
        valid_h, inl_h = fetch_all(res.valid, res.is_inlier)
        if not bool(valid_h):
            return False

        # 4. pose optimization on the inlier set
        inl = inl_h & has
        opt = pose_opt.optimize_pose(
            res.R_cw, res.t_cw, jnp.asarray(pos), frm.undist_xy, frm.x_right,
            H.take_small_table(self.inv_sigma_sq, frm.feats.level),
            jnp.asarray(inl), self.cam_scalars, model=self.model,
        )
        num_h, R_np, t_np = fetch_all(opt.num_inliers, opt.R_cw, opt.t_cw)
        num = int(num_h)
        if num < self.min_num_valid_obs:
            # 5. projection-based refinement against ALL keyframe landmarks
            uv, depth, vis = self.camera.reproject(
                jnp.asarray(R_np), jnp.asarray(t_np), jnp.asarray(kf_pos)
            )
            matched = np.asarray(opt.is_inlier) & has
            p_idx, p_acc, _ = proj_match.match_frame_and_keyframe(
                frm.undist_xy, frm.feats.level, frm.feats.desc, frm.feats.valid,
                frm.feats.angle, jnp.asarray(matched),
                kf.feats.desc, uv, kf.feats.level, kf.feats.angle,
                jnp.asarray(kf_has) & vis,
                scale_factors=self.scale_factors, num_levels=self.orb.num_levels,
                margin=10.0,
            )
            pa = np.asarray(p_acc)
            pi = np.asarray(p_idx)
            for kf_slot in np.nonzero(pa)[0]:
                f_slot = pi[kf_slot]
                if not matched[f_slot]:
                    pos[f_slot] = kf_pos[kf_slot]
                    matched[f_slot] = True
                    src_kf_slot[f_slot] = kf_slot
            opt = pose_opt.optimize_pose(
                jnp.asarray(R_np), jnp.asarray(t_np), jnp.asarray(pos),
                frm.undist_xy, frm.x_right,
                H.take_small_table(self.inv_sigma_sq, frm.feats.level),
                jnp.asarray(matched), self.cam_scalars, model=self.model,
            )
            num = int(opt.num_inliers)
            if num < self.min_num_valid_obs:
                return False
            R_np, t_np = np.asarray(opt.R_cw), np.asarray(opt.t_cw)

        # success: write pose + associations
        T = np.eye(4)
        T[:3, :3] = R_np
        T[:3, 3] = t_np
        frm.set_pose_cw(T)
        final_inl = np.asarray(opt.is_inlier)
        frm.lm_ids[:] = -1
        for f_slot in np.nonzero(final_inl & (src_kf_slot >= 0))[0]:
            frm.lm_ids[f_slot] = kf.lm_ids[src_kf_slot[f_slot]]
        frm.ref_keyfrm_id = kf.id
        return True
