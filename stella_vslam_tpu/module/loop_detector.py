"""Loop detection: BoW candidates with continuity + Sim3 validation.

Reference: src/stella_vslam/module/loop_detector.{h,cc} — two phases:
(A) candidates: min BoW score over current covisibilities as the floor
    (cc:278), BoW acquisition excluding the connected set (cc:72-132),
    continuity check requiring >= 3 consecutive "keyframe sets" (cc:140-180);
(B) validation: brute-force match >= 20 -> pose hypothesis via PnP RANSAC ->
    Sim3 scale from matched landmark pair-distance ratios -> transform
    optimizer refinement -> inlier gate (cc:358-560). Outputs Sim3
    world->current.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.util.fetch import fetch_all

from stella_vslam_tpu.match import hamming as H
from stella_vslam_tpu.match import projection as proj_match
from stella_vslam_tpu.match import robust as robust_match
from stella_vslam_tpu.ops.optim import pose as pose_opt
from stella_vslam_tpu.ops.optim import sim3 as sim3_opt
from stella_vslam_tpu.ops.solve import pnp as pnp_solve

_log = logging.getLogger(__name__)


class LoopDetector:
    def __init__(self, camera, orb_params, bow_db, *,
                 num_final_matches_thr: int = 40,
                 min_continuity: int = 3,
                 use_fixed_seed: bool = False,
                 fix_scale_in_Sim3_estimation: bool = False,
                 reject_by_graph_distance: bool = False,
                 min_distance_on_graph: int = 50):
        self.camera = camera
        self.orb = orb_params
        self.bow_db = bow_db
        self.num_final_matches_thr = num_final_matches_thr
        self.min_continuity = min_continuity
        self.fix_scale = fix_scale_in_Sim3_estimation
        # optional candidate-rejection mode (loop_detector.cc:25-26, 89-114):
        # default rejects the connected set; this mode instead rejects any
        # candidate within min_distance_on_graph hops on the spanning tree +
        # covisibility graph
        self.reject_by_graph_distance = reject_by_graph_distance
        self.min_distance_on_graph = min_distance_on_graph
        self.scale_factors = jnp.asarray(orb_params.scale_factors, dtype=jnp.float32)
        self.inv_sigma_sq = jnp.asarray(
            orb_params.inv_level_sigma_sq, dtype=jnp.float32)
        from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars

        self.cam_scalars = make_cam_scalars(camera)
        self.model = camera.model.name.lower()
        self._key = jax.random.PRNGKey(11 if use_fixed_seed else np.random.randint(1 << 30))
        # continuity bookkeeping: list of (keyframe id set, count)
        self.cont_sets: List[Tuple[Set[int], int]] = []
        self.enabled = True
        self._dump_counter = 0  # uniquifies SVT_DUMP_SIM3_FAIL filenames

    # ------------------------------------------------------------------
    def detect_loop_candidates(self, map_db, cur_kf) -> List[int]:
        if not self.enabled:
            return []
        bow_cur = self.bow_db.bow_vecs.get(cur_kf.id)
        if bow_cur is None:
            return []
        covis = cur_kf.graph_node.get_covisibilities()
        # score floor: min score against own covisibilities (cc:278)
        min_score = 1.0
        for kid in covis:
            v = self.bow_db.bow_vecs.get(kid)
            if v is not None:
                min_score = min(min_score, self.bow_db.vocab.score(bow_cur, v))
        if not self.reject_by_graph_distance:
            reject = set(covis) | {cur_kf.id}
        else:
            # graph-distance rejection (loop_detector.cc:93-127): walk the
            # spanning tree (parent + children) and loop edges out to
            # min_distance_on_graph hops; everything reached is too close to
            # be a loop candidate
            reject = {cur_kf.id}
            targets = [(cur_kf.id, 0)]
            while targets:
                kid, dist = targets.pop()
                if dist + 1 >= self.min_distance_on_graph:
                    continue
                kf = map_db.keyframes.get(kid)
                if kf is None:
                    continue
                gn = kf.graph_node
                neighbors = []
                if gn.spanning_parent is not None:
                    neighbors.append(gn.spanning_parent)
                neighbors.extend(gn.loop_edges)
                neighbors.extend(gn.spanning_children)
                for nid in neighbors:
                    if nid not in reject:
                        reject.add(nid)
                        targets.append((nid, dist + 1))
        cands = self.bow_db.acquire_keyframes(
            bow_cur, min_score=min_score, reject=reject,
            keyframes=map_db.keyframes,
        )
        # continuity: candidate's set = candidate + its covisibilities must
        # intersect a previously tracked set for >= min_continuity rounds
        passed = []
        new_sets: List[Tuple[Set[int], int]] = []
        for cand_id in cands:
            kf = map_db.keyframes.get(cand_id)
            if kf is None or kf.will_be_erased:
                continue
            cand_set = set(kf.graph_node.get_covisibilities()) | {cand_id}
            count = 0
            for prev_set, prev_count in self.cont_sets:
                if cand_set & prev_set:
                    count = max(count, prev_count + 1)
            new_sets.append((cand_set, count))
            if count >= self.min_continuity - 1:
                passed.append(cand_id)
        self.cont_sets = new_sets
        if cands and _log.isEnabledFor(logging.DEBUG):
            _log.debug(
                "loop cands kf %d: %d raw (floor %.4g), %d past continuity "
                "(counts %s)", cur_kf.id, len(cands), min_score, len(passed),
                [c for _, c in new_sets])
        return passed

    # ------------------------------------------------------------------
    def validate_candidates(self, map_db, cur_kf, candidates: List[int]):
        """Returns (cand_kf_id, Sim3 (s,R,t) cur<-world, matched landmark ids
        per current slot) or None. EVERY candidate is run through the Sim3
        validation and the one with the most post-refinement inliers wins —
        first-pass-wins could pick a worse loop when two candidates pass
        (the reference iterates all validated candidates,
        loop_detector.cc:207-356)."""
        best, best_score = None, -1
        for cand_id in candidates:
            out = self.select_loop_candidate_via_Sim3(map_db, cur_kf, cand_id)
            if out is not None and out[4] > best_score:
                best, best_score = out[:4], out[4]
        return best

    def select_loop_candidate_via_Sim3(self, map_db, cur_kf, cand_id: int):
        cand = map_db.keyframes.get(cand_id)
        if cand is None or cand.will_be_erased:
            return None
        # 1. brute force match: per cand landmark slot -> cur keypoint
        cand_pos = np.zeros((cand.num_slots, 3), np.float32)
        cand_has = np.zeros(cand.num_slots, bool)
        for i in np.nonzero(cand.lm_ids >= 0)[0]:
            lm = map_db.landmarks.get(int(cand.lm_ids[i]))
            if lm is not None and not lm.will_be_erased:
                cand_pos[i] = lm.pos_w
                cand_has[i] = True
        b_idx, b_acc, _ = robust_match.brute_force_match(
            cur_kf.feats.angle, cur_kf.feats.desc, cur_kf.feats.valid,
            cand.feats.angle, cand.feats.desc, jnp.asarray(cand_has),
            lowe_ratio=0.75,
        )
        acc = np.asarray(b_acc)
        idx = np.asarray(b_idx)
        if acc.sum() < 20:
            _log.debug("validate kf %d~%d: brute match %d < 20",
                       cur_kf.id, cand_id, int(acc.sum()))
            return None

        # per-cur-slot correspondence to candidate landmarks
        n = cur_kf.num_slots
        pos = np.zeros((n, 3), np.float32)
        has = np.zeros(n, bool)
        src_cand_slot = np.full(n, -1, np.int64)
        for cand_slot in np.nonzero(acc)[0]:
            f = idx[cand_slot]
            pos[f] = cand_pos[cand_slot]
            has[f] = True
            src_cand_slot[f] = cand_slot

        # 2. SE3 hypothesis via PnP RANSAC (cur bearings vs candidate-map pts)
        self._key, sub = jax.random.split(self._key)
        res = pnp_solve.find_via_ransac(
            sub, cur_kf.bearings, jnp.asarray(pos), cur_kf.feats.level,
            jnp.asarray(has), scale_factors=self.scale_factors,
            min_num_inliers=15,
        )
        valid_h, inl_h, R_pnp, t_pnp = fetch_all(
            res.valid, res.is_inlier, res.R_cw, res.t_cw)
        if not bool(valid_h):
            _log.debug("validate kf %d~%d: PnP found no model (%d corrs)",
                       cur_kf.id, cand_id, int(has.sum()))
            return None
        inl = inl_h & has
        if inl.sum() < 15:
            _log.debug("validate kf %d~%d: PnP inliers %d < 15",
                       cur_kf.id, cand_id, int(inl.sum()))
            return None

        # 2b. reference validation loop (loop_detector.cc:440-540): pose
        # optimize + Sim3-guided projection rematch against the candidate's
        # landmarks, three rounds with growing inlier thresholds 10/25/40
        # and shrinking margins 10 -> 3. Recovers true loops whose initial
        # PnP inlier set is a near-miss.
        R_np, t_np = np.asarray(R_pnp), np.asarray(t_pnp)
        matched = inl.copy()
        thresholds = (10, 25, self.num_final_matches_thr)
        margins = (None, 10.0, 3.0)
        for rnd, (thr, margin) in enumerate(zip(thresholds, margins)):
            if margin is not None:
                # projection rematch vs candidate keyframe landmark slots
                uv, _, vis = self.camera.reproject(
                    jnp.asarray(R_np.astype(np.float32)),
                    jnp.asarray(t_np.astype(np.float32)),
                    jnp.asarray(cand_pos))
                p_idx, p_acc, _ = proj_match.match_frame_and_keyframe(
                    cur_kf.undist_xy, cur_kf.feats.level, cur_kf.feats.desc,
                    cur_kf.feats.valid, cur_kf.feats.angle,
                    jnp.asarray(matched),
                    cand.feats.desc, uv, cand.feats.level, cand.feats.angle,
                    jnp.asarray(cand_has) & vis,
                    scale_factors=self.scale_factors,
                    num_levels=self.orb.num_levels, margin=margin,
                )
                pa, pi = np.asarray(p_acc), np.asarray(p_idx)
                for cand_slot in np.nonzero(pa)[0]:
                    f = pi[cand_slot]
                    if not matched[f]:
                        pos[f] = cand_pos[cand_slot]
                        matched[f] = True
                        src_cand_slot[f] = cand_slot
                if matched.sum() < thr:
                    _log.debug("validate kf %d~%d: round %d rematch %d < %d",
                               cur_kf.id, cand_id, rnd, int(matched.sum()), thr)
                    return None
            opt = pose_opt.optimize_pose(
                jnp.asarray(R_np.astype(np.float32)),
                jnp.asarray(t_np.astype(np.float32)), jnp.asarray(pos),
                cur_kf.undist_xy, cur_kf.x_right,
                H.take_small_table(self.inv_sigma_sq, cur_kf.feats.level),
                jnp.asarray(matched), self.cam_scalars, model=self.model,
            )
            num_h, inl_opt, R_np, t_np = fetch_all(
                opt.num_inliers, opt.is_inlier, opt.R_cw, opt.t_cw)
            if int(num_h) < thr:
                _log.debug("validate kf %d~%d: round %d pose-opt %d < %d",
                           cur_kf.id, cand_id, rnd, int(num_h), thr)
                return None
            matched = matched & np.asarray(inl_opt)
            R_np, t_np = np.asarray(R_np), np.asarray(t_np)
        # final optimized pose is the Sim3 seed (reference optimized_pose2)
        R_pnp, t_pnp = R_np, t_np
        inl = matched

        # 3. scale estimate from pair-distance ratios between the CURRENT
        # map's landmark positions and the candidate's (loop_detector Sim3
        # scale from matched landmark-pair norms); 1.0 when fix_scale
        if self.fix_scale:
            scale = 1.0
        else:
            cur_pos = np.zeros((n, 3), np.float32)
            cur_ok = np.zeros(n, bool)
            for f in np.nonzero(inl)[0]:
                lm_id = cur_kf.lm_ids[f]
                if lm_id >= 0:
                    lm = map_db.landmarks.get(int(lm_id))
                    if lm is not None and not lm.will_be_erased:
                        cur_pos[f] = lm.pos_w
                        cur_ok[f] = True
            both = np.nonzero(inl & cur_ok)[0]
            if len(both) >= 8:
                # centroid-relative scale between the matched point sets
                # (robust version of the reference's pair-norm ratio estimate)
                a = cur_pos[both] - cur_pos[both].mean(0)
                b = pos[both] - pos[both].mean(0)
                na = float(np.sqrt((a ** 2).sum()))
                nb = float(np.sqrt((b ** 2).sum()))
                scale = nb / na if na > 1e-9 and nb > 1e-9 else 1.0
            else:
                scale = 1.0

        # 4. Sim3 refinement with mutual reprojection between the two camera
        # frames (reference transform_optimizer usage in loop validation).
        # Frame 1 = current keyframe camera, frame 2 = candidate camera.
        # R_pnp/t_pnp: candidate-map world -> cur camera (fetched above)
        # correspondences with positions in BOTH maps
        cur_pos_all = np.zeros((n, 3), np.float32)
        cur_ok = np.zeros(n, bool)
        for f in np.nonzero(inl)[0]:
            lm_id = cur_kf.lm_ids[f]
            if lm_id >= 0:
                lm = map_db.landmarks.get(int(lm_id))
                if lm is not None and not lm.will_be_erased:
                    cur_pos_all[f] = lm.pos_w
                    cur_ok[f] = True
        both = np.nonzero(inl & cur_ok)[0]
        if len(both) < 15:
            _log.debug("validate kf %d~%d: only %d matches live in BOTH maps",
                       cur_kf.id, cand_id, len(both))
            return None
        R_cand, t_cand = cand.rot_cw, cand.trans_cw
        R_cur, t_cur = cur_kf.rot_cw, cur_kf.trans_cw
        pts_in_cand = pos[both] @ R_cand.T + t_cand  # cand cam frame
        pts_in_cur = cur_pos_all[both] @ R_cur.T + t_cur  # cur cam frame
        obs_cur = cur_kf.h_undist_xy[both]
        obs_cand = cand.h_undist_xy[src_cand_slot[both]]
        # initial S_12 (cur <- cand) from the PnP pose:
        R12 = R_pnp @ R_cand.T
        t12 = t_pnp - R12 @ t_cand
        p = self.camera.params
        resT = sim3_opt.optimize_transform(
            # initial scale from matched landmark pair-norm ratios (reference
            # loop detector Sim3 estimate) — the mutual-reprojection scale is
            # weakly observable on near-planar scenes, so a good init matters
            jnp.float32(scale), jnp.asarray(R12, dtype=jnp.float32),
            jnp.asarray(t12, dtype=jnp.float32),
            jnp.asarray(pts_in_cur), jnp.asarray(pts_in_cand),
            jnp.asarray(obs_cur), jnp.asarray(obs_cand),
            jnp.ones(len(both)), jnp.ones(len(both)), jnp.ones(len(both), bool),
            p.fx, p.fy, p.cx, p.cy, fix_scale=self.fix_scale,
        )
        num_inl = int(resT.num_inliers)
        if num_inl < min(self.num_final_matches_thr, max(15, len(both) // 2)):
            _log.debug("validate kf %d~%d: Sim3 refine inliers %d < %d",
                       cur_kf.id, cand_id, num_inl,
                       min(self.num_final_matches_thr,
                           max(15, len(both) // 2)))
            if os.environ.get("SVT_DUMP_SIM3_FAIL"):
                # debug aid only: never let a bad dump path (missing dir,
                # read-only fs) abort loop detection; uniquify repeated
                # failures of the same pair with a monotonic attempt counter
                self._dump_counter += 1
                try:
                    np.savez(os.environ["SVT_DUMP_SIM3_FAIL"] +
                             f"_{cur_kf.id}_{cand_id}_{self._dump_counter}.npz",
                             scale=scale, R12=R12, t12=t12,
                             pts_in_cur=pts_in_cur, pts_in_cand=pts_in_cand,
                             obs_cur=np.asarray(obs_cur),
                             obs_cand=np.asarray(obs_cand),
                             R_pnp=R_pnp, t_pnp=t_pnp,
                             R_cand=R_cand, t_cand=t_cand,
                             R_cur=R_cur, t_cur=t_cur,
                             fx=p.fx, fy=p.fy, cx=p.cx, cy=p.cy)
                except Exception as exc:
                    _log.warning("SVT_DUMP_SIM3_FAIL dump failed: %s", exc)
            return None
        _log.debug("validate kf %d~%d: ACCEPTED with %d Sim3 inliers",
                   cur_kf.id, cand_id, num_inl)

        # corrected Sim3 cur<-world: S_12_refined o S_cand_w (s=1)
        s12 = float(resT.s_12)
        R12r = np.asarray(resT.R_12)
        t12r = np.asarray(resT.t_12)
        s_cw = s12
        R_cw = R12r @ R_cand
        t_cw = s12 * (R12r @ t_cand) + t12r
        return cand_id, (s_cw, R_cw, t_cw), src_cand_slot, inl, num_inl
