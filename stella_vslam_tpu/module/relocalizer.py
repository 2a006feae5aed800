"""Relocalization: BoW candidates -> match -> PnP RANSAC -> pose refinement.

Reference: src/stella_vslam/module/relocalizer.{h,cc} — acquire BoW candidates
(cc:56-64); per candidate: (BoW|robust) match needing >= min_num_bow_matches
(20) -> EPnP RANSAC -> pose optimization -> projection-match refinement until
>= min_num_valid_obs (50) inliers -> final local-map refinement: project the
candidate's whole local map (1st/2nd-order covisibility landmarks) over three
margin rounds {5,15,5}, re-optimizing each round, with a 0.2x-tracked-landmark
acceptance gate (relocalizer.cc:299-388, relocalizer.h:44-63).
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
        # local-map refinement programs (fixed LOCAL_MAP_CAP shape, three
        # margins -> three compiled variants of the same program)
        M = self.LOCAL_MAP_CAP
        uv_m, _, vis_m = self.camera.reproject(eye3, f32(3), f32(M, 3))
        for margin in (5.0, 15.0):
            q = proj_match.match_frame_and_landmarks(
                f32(n, 2), i32(n), u32(n, 8), bl(n), bl(n), f32(n),
                u32(M, 8), uv_m, f32(M), i32(M), vis_m,
                scale_factors=self.scale_factors,
                num_levels=self.orb.num_levels, margin=margin, lowe_ratio=0.8)
            outs.append(q[0])
        for o in outs:
            jax.block_until_ready(o)

    # ------------------------------------------------------------------
    def relocalize(self, map_db, frm) -> bool:
        vocab = self.bow_db.vocab
        words, bow_vec = vocab.compute_bow(frm.h_desc, frm.h_valid)
        # covisibility-cluster filtering keeps this list short and good
        # (reference bow_database.cc:99-162); try every surviving candidate
        # like reloc_by_candidates does (relocalizer.cc:67-92)
        candidates = self.bow_db.acquire_keyframes(
            bow_vec, keyframes=map_db.keyframes)
        for kf_id in candidates:
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

        # 2. per-frame-slot 3D correspondences (assoc_ids = landmark id per
        # frame slot, carried through every refinement stage)
        n = frm.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        assoc_ids = np.full(n, -1, np.int64)
        for kf_slot in np.nonzero(acc)[0]:
            f_slot = idx[kf_slot]
            pos[f_slot] = kf_pos[kf_slot]
            has[f_slot] = True
            assoc_ids[f_slot] = kf.lm_ids[kf_slot]

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
                    assoc_ids[f_slot] = kf.lm_ids[kf_slot]
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

        # keyframe-level success; keep only inlier associations
        matched = np.asarray(opt.is_inlier) & (assoc_ids >= 0)

        # 6. final stage: refine against the candidate's whole local map
        # (reference refine_pose_by_local_map, relocalizer.cc:299-388)
        ok, R_np, t_np, matched, pos, assoc_ids = self._refine_by_local_map(
            map_db, frm, kf, R_np, t_np, pos, matched, assoc_ids)
        if not ok:
            return False

        # success: write pose + associations
        self._commit(frm, kf, R_np, t_np, matched, assoc_ids)
        return True

    def _commit(self, frm, kf, R_np, t_np, matched, assoc_ids):
        T = np.eye(4)
        T[:3, :3] = R_np
        T[:3, 3] = t_np
        frm.set_pose_cw(T)
        frm.lm_ids[:] = -1
        for f_slot in np.nonzero(matched & (assoc_ids >= 0))[0]:
            frm.lm_ids[f_slot] = assoc_ids[f_slot]
        frm.ref_keyfrm_id = kf.id

    # ------------------------------------------------------------------
    def reloc_by_pose_hint(self, map_db, frm, pose_cw, kf) -> bool:
        """Pose-hint relocalization (reference system.cc:604-624 +
        map_database::get_close_keyframes): the frame is seated AT the
        supplied pose and the map is re-acquired by PROJECTION of the nearby
        keyframe's landmarks — no BoW, no PnP. Succeeds only when the local
        map around that keyframe yields enough matches at the hinted pose."""
        pose_cw = np.asarray(pose_cw, np.float64)
        R_np, t_np = pose_cw[:3, :3], pose_cw[:3, 3]
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
        uv, _, vis = self.camera.reproject(
            jnp.asarray(R_np.astype(np.float32)),
            jnp.asarray(t_np.astype(np.float32)), jnp.asarray(kf_pos))
        n = frm.num_slots
        pos = np.zeros((n, 3), np.float32)
        matched = np.zeros(n, bool)
        assoc_ids = np.full(n, -1, np.int64)
        # generous margin: the hint may be off by the caller's odometric error
        p_idx, p_acc, _ = proj_match.match_frame_and_keyframe(
            frm.undist_xy, frm.feats.level, frm.feats.desc, frm.feats.valid,
            frm.feats.angle, jnp.asarray(matched),
            kf.feats.desc, uv, kf.feats.level, kf.feats.angle,
            jnp.asarray(kf_has) & vis,
            scale_factors=self.scale_factors, num_levels=self.orb.num_levels,
            margin=20.0,
        )
        pa, pi = np.asarray(p_acc), np.asarray(p_idx)
        for kf_slot in np.nonzero(pa)[0]:
            f_slot = pi[kf_slot]
            if not matched[f_slot]:
                pos[f_slot] = kf_pos[kf_slot]
                matched[f_slot] = True
                assoc_ids[f_slot] = kf.lm_ids[kf_slot]
        if matched.sum() < self.min_num_bow_matches:
            return False
        opt = pose_opt.optimize_pose(
            jnp.asarray(R_np.astype(np.float32)),
            jnp.asarray(t_np.astype(np.float32)), jnp.asarray(pos),
            frm.undist_xy, frm.x_right,
            H.take_small_table(self.inv_sigma_sq, frm.feats.level),
            jnp.asarray(matched), self.cam_scalars, model=self.model,
        )
        num_h, inl_h, R_h, t_h = fetch_all(
            opt.num_inliers, opt.is_inlier, opt.R_cw, opt.t_cw)
        if int(num_h) < self.min_num_bow_matches:
            return False
        matched = matched & np.asarray(inl_h)
        R_np = np.asarray(R_h, np.float64)
        t_np = np.asarray(t_h, np.float64)
        ok, R_np, t_np, matched, pos, assoc_ids = self._refine_by_local_map(
            map_db, frm, kf, R_np, t_np, pos, matched, assoc_ids)
        if not ok:
            return False
        self._commit(frm, kf, R_np, t_np, matched, assoc_ids)
        return True

    # ------------------------------------------------------------------
    # fixed landmark capacity for the local-map refinement program — one
    # compiled shape (padded/truncated), warmed up alongside the cascade
    LOCAL_MAP_CAP = 4096
    MAX_LOCAL_KEYFRAMES = 60

    def _refine_by_local_map(self, map_db, frm, kf, R_np, t_np,
                             pos, matched, assoc_ids):
        """reference refine_pose_by_local_map (relocalizer.cc:299-388):
        build the local map around the frame's current associations
        (observer keyframes + their top covisibilities, <= 60 keyframes),
        then over margin rounds {5,15,5}: project unassociated local
        landmarks (can_observe gate: distance range + viewing-angle cos >
        0.5), projection-match, re-optimize, reject outliers. Final gate:
        inliers >= 0.2 x the candidate keyframe's tracked landmarks."""
        # --- local keyframes (local_map_updater semantics)
        first_order: dict = {}
        for lm_id in assoc_ids[matched]:
            lm = map_db.landmarks.get(int(lm_id))
            if lm is None or lm.will_be_erased:
                continue
            for obs_kf in lm.observations:
                first_order[obs_kf] = first_order.get(obs_kf, 0) + 1
        local_kf_ids = sorted(first_order, key=first_order.get, reverse=True)
        for kid in list(local_kf_ids):
            okf = map_db.keyframes.get(kid)
            if okf is None:
                continue
            for cid in okf.graph_node.get_top_n_covisibilities(10):
                if cid not in first_order:
                    first_order[cid] = 0
                    local_kf_ids.append(cid)
            if len(local_kf_ids) >= self.MAX_LOCAL_KEYFRAMES:
                break
        local_kf_ids = local_kf_ids[: self.MAX_LOCAL_KEYFRAMES]

        # --- local landmarks (dedup, excluding current associations)
        cur_ids = set(int(i) for i in assoc_ids[matched])
        lm_map: dict = {}
        for kid in local_kf_ids:
            okf = map_db.keyframes.get(kid)
            if okf is None or okf.will_be_erased:
                continue
            for lm_id in okf.lm_ids[okf.lm_ids >= 0]:
                lm_id = int(lm_id)
                if lm_id in lm_map or lm_id in cur_ids:
                    continue
                lm = map_db.landmarks.get(lm_id)
                if lm is not None and not lm.will_be_erased:
                    lm_map[lm_id] = lm
        if not lm_map:
            return False, R_np, t_np, matched, pos, assoc_ids

        M = self.LOCAL_MAP_CAP
        lms = list(lm_map.values())[:M]
        m = len(lms)
        lm_pos = np.zeros((M, 3), np.float32)
        lm_desc = np.zeros((M, 8), np.uint32)
        lm_dmin = np.zeros(M, np.float32)
        lm_dmax = np.zeros(M, np.float32)
        lm_norm = np.zeros((M, 3), np.float32)
        lm_ids_arr = np.full(M, -1, np.int64)
        for i, lm in enumerate(lms):
            lm_pos[i] = lm.pos_w
            lm_desc[i] = lm.descriptor
            lm_dmin[i], lm_dmax[i] = lm.min_valid_dist, lm.max_valid_dist
            lm_norm[i] = lm.mean_normal
            lm_ids_arr[i] = lm.id
        lm_present = lm_ids_arr >= 0
        log_sf = float(np.log(self.orb.scale_factor))
        L = self.orb.num_levels

        num_valid = 0
        lm_pos_dev, lm_desc_dev = jnp.asarray(lm_pos), jnp.asarray(lm_desc)
        for margin in (5.0, 15.0, 5.0):
            cam_center = -R_np.T @ t_np
            vec = lm_pos - cam_center[None, :]
            dist = np.linalg.norm(vec, axis=1)
            dist_ok = (lm_dmin * 0.8 <= dist) & (dist <= lm_dmax * 1.2)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos_view = np.where(
                    dist > 1e-9, (vec * lm_norm).sum(1) / dist, -1.0)
                ratio = np.where(dist > 1e-9, lm_dmax / dist, 0.0)
            pred = np.clip(np.ceil(np.log(np.maximum(ratio, 1e-9)) / log_sf),
                           0, L - 1).astype(np.int32)
            uv, _, vis = self.camera.reproject(
                jnp.asarray(R_np.astype(np.float32)),
                jnp.asarray(t_np.astype(np.float32)), lm_pos_dev)
            observable = (lm_present & dist_ok & (cos_view > 0.5)
                          & np.asarray(vis))
            if not observable.any():
                return False, R_np, t_np, matched, pos, assoc_ids
            p_idx, p_acc = proj_match.match_frame_and_landmarks(
                frm.undist_xy, frm.feats.level, frm.feats.desc,
                frm.feats.valid, jnp.asarray(matched), frm.x_right,
                lm_desc_dev, uv, jnp.full(M, -1.0, jnp.float32),
                jnp.asarray(pred), jnp.asarray(observable),
                scale_factors=self.scale_factors, num_levels=L,
                margin=float(margin), lowe_ratio=0.8,
            )[:2]
            pa, pi = np.asarray(p_acc), np.asarray(p_idx)
            for mi in np.nonzero(pa)[0]:
                f_slot = pi[mi]
                if not matched[f_slot]:
                    pos[f_slot] = lm_pos[mi]
                    matched[f_slot] = True
                    assoc_ids[f_slot] = lm_ids_arr[mi]
            opt = pose_opt.optimize_pose(
                jnp.asarray(R_np.astype(np.float32)),
                jnp.asarray(t_np.astype(np.float32)), jnp.asarray(pos),
                frm.undist_xy, frm.x_right,
                H.take_small_table(self.inv_sigma_sq, frm.feats.level),
                jnp.asarray(matched), self.cam_scalars, model=self.model,
            )
            num_h, inl_h, R_np, t_np = fetch_all(
                opt.num_inliers, opt.is_inlier, opt.R_cw, opt.t_cw)
            num_valid = int(num_h)
            matched = matched & np.asarray(inl_h)
            R_np, t_np = np.asarray(R_np, np.float64), np.asarray(t_np, np.float64)

        # acceptance: >= 20% of the candidate keyframe's tracked landmarks
        num_tracked = int((kf.lm_ids >= 0).sum())
        if num_valid < 0.2 * num_tracked:
            return False, R_np, t_np, matched, pos, assoc_ids
        return True, R_np, t_np, matched, pos, assoc_ids
