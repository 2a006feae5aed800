"""Monocular / stereo / RGBD map initializer.

Reference: src/stella_vslam/module/initializer.{h,cc} + initialize/perspective
.cc + initialize/bearing_vector.cc:

* mono perspective: area-match vs the init frame (margin 100, lowe 0.9), run
  H and F RANSAC (the reference uses two std::threads; here both are batched
  device programs), pick H when rel_cost_H < 0.5 (perspective.cc:60-77),
  evaluate all 8 (H) / 4 (F->E) motion hypotheses by triangulating the inlier
  matches and counting geometrically valid points, normalize scale by median
  depth, build the two-keyframe map and bundle-adjust it.
* mono equirectangular/fisheye: E-based (bearing_vector.cc) — same hypothesis
  machinery on bearings.
* stereo/RGBD: instant map from depth (initializer.h:124-128) — handled by
  the tracking module via create_map_for_stereo.

Defaults follow initializer.cc:23-26 (min_num_valid_pts 50,
min_num_triangulated_pts 50, parallax 1 deg, reprojection threshold 4 px).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.camera.base import CameraModel
from stella_vslam_tpu.data.frame import Frame
from stella_vslam_tpu.match import area as area_match
from stella_vslam_tpu.ops import triangulation as tri
from stella_vslam_tpu.ops.solve import essential as esolve
from stella_vslam_tpu.ops.solve import fundamental as fsolve
from stella_vslam_tpu.ops.solve import homography as hsolve


@partial(jax.jit, static_argnames=("min_pts", "require_positive_z"))
def _evaluate_hypotheses(
    R_h, t_h, hyp_valid,  # [B,3,3], [B,3], [B] candidate cam2<-cam1 motions
    b1, b2,  # [N,3] bearings in ref(1) / cur(2)
    match_valid,  # [N]
    parallax_cos_thr, reproj_cos_thr,
    min_pts: int = 50,
    require_positive_z: bool = True,
):
    """Triangulate every match under every hypothesis; count valid points
    (positive depth both views, angular reprojection error below threshold,
    enough parallax). Returns per-hypothesis counts + the best hypothesis's
    triangulation. (reference initialize/base.cc find_most_plausible_pose)"""
    B = R_h.shape[0]

    def eval_one(R21, t21):
        pts1 = tri.triangulate_midpoint(b1, b2, R21, t21)  # in cam1 frame
        d1 = pts1[:, 2]
        pc2 = pts1 @ R21.T + t21
        d2 = pc2[:, 2]
        # angular reprojection errors
        n1 = pts1 / jnp.maximum(jnp.linalg.norm(pts1, axis=-1, keepdims=True), 1e-12)
        n2 = pc2 / jnp.maximum(jnp.linalg.norm(pc2, axis=-1, keepdims=True), 1e-12)
        cos1 = jnp.sum(n1 * b1, axis=-1)
        cos2 = jnp.sum(n2 * b2, axis=-1)
        # parallax between rays
        ray2_in_1 = (b2 @ R21)  # R21^T b2
        cos_par = jnp.sum(b1 * ray2_in_1, axis=-1)
        ok = (
            match_valid
            & (cos1 > reproj_cos_thr) & (cos2 > reproj_cos_thr)
            & (cos_par < parallax_cos_thr)
        )
        if require_positive_z:
            # perspective-family cameras: points must sit in front of both
            # views (for 360 cameras the bearing-alignment check above already
            # pins the point to the observed direction; z may be negative)
            ok = ok & (d1 > 0) & (d2 > 0)
        return jnp.sum(ok), pts1, ok

    counts, ptss, oks = jax.vmap(eval_one)(R_h, t_h)
    counts = jnp.where(hyp_valid, counts, -1)
    best = jnp.argmax(counts)
    best_count = counts[best]
    # require a distinct winner (no other hypothesis within 70%)
    near = jnp.sum(counts > 0.7 * best_count)
    ok_overall = (best_count >= min_pts) & (near <= 1)
    return best, best_count, ok_overall, ptss[best], oks[best], R_h[best], t_h[best]


class Initializer:
    NOT_READY = 0
    INITIALIZING = 1
    SUCCEEDED = 2

    # 1024 hypotheses: measured 6.2 ms vs 4.6 ms at 256 on-chip — near-free
    # on the MXU, and at 45% inliers the 8-pt batch reaches 99%+ success vs
    # ~85% for the reference's bounded 5-pt iterations
    # (scripts/measure_ransac_8pt.py; PARITY.md §2.6)
    def __init__(self, camera, orb_params, *, num_ransac_iters: int = 1024,
                 min_num_valid_pts: int = 50, min_num_triangulated_pts: int = 50,
                 parallax_deg_thr: float = 1.0, reproj_err_thr: float = 4.0,
                 use_fixed_seed: bool = False,
                 escalation_ratio_thr: float = 0.45):
        self.camera = camera
        self.orb_params = orb_params
        self.num_ransac_iters = num_ransac_iters
        # consensus ratio below which a failed init attempt retries with the
        # chunked 32k-hypothesis escalated sweep (measured 8-pt crossover)
        self.escalation_ratio_thr = escalation_ratio_thr
        self.min_num_valid_pts = min_num_valid_pts
        self.min_num_triangulated_pts = min_num_triangulated_pts
        self.parallax_cos_thr = float(np.cos(np.deg2rad(parallax_deg_thr)))
        # angular tolerance equivalent of the pixel threshold
        fx = max(float(camera.params.fx), 100.0)
        self.reproj_cos_thr = float(np.cos(reproj_err_thr / fx))
        self.state = Initializer.NOT_READY
        self.init_frame: Optional[Frame] = None
        self.prev_matched: Optional[np.ndarray] = None
        self.init_matches: Optional[np.ndarray] = None
        self._key = jax.random.PRNGKey(42 if use_fixed_seed else np.random.randint(1 << 30))
        # init products
        self.triangulated_pts: Optional[np.ndarray] = None
        self.triangulated_ok: Optional[np.ndarray] = None
        self.R_21 = None
        self.t_21 = None

    def reset(self):
        self.state = Initializer.NOT_READY
        self.init_frame = None

    # ------------------------------------------------------------------
    def set_initial_frame(self, frm: Frame):
        self.init_frame = frm
        self.prev_matched = frm.h_undist_xy.copy()
        self.state = Initializer.INITIALIZING

    # ------------------------------------------------------------------
    def try_initialize_monocular(self, cur_frm: Frame) -> bool:
        """Returns True when a two-view reconstruction succeeded; products in
        (init_frame pose=I, cur pose (R_21,t_21), triangulated_pts)."""
        if self.init_frame is None:
            self.set_initial_frame(cur_frm)
            return False

        ref = self.init_frame
        idx2, accepted, _ = area_match.match_in_consistent_area(
            ref.feats.level, ref.feats.desc, ref.feats.angle, ref.feats.valid,
            jnp.asarray(self.prev_matched),
            cur_frm.undist_xy, cur_frm.feats.level, cur_frm.feats.desc,
            cur_frm.feats.angle, cur_frm.feats.valid,
            margin=100.0, lowe_ratio=0.9,
        )
        idx2_h = np.asarray(idx2)
        acc_h = np.asarray(accepted)
        num_matches = int(acc_h.sum())
        if num_matches < self.min_num_valid_pts:
            # restart from the current frame (initializer.cc:155-160)
            self.set_initial_frame(cur_frm)
            return False
        # update search centers (area.cc tail)
        self.prev_matched[acc_h] = np.asarray(cur_frm.h_undist_xy)[idx2_h[acc_h]]
        self.init_matches = np.where(acc_h, idx2_h, -1)

        # aligned per-ref-slot arrays for the solvers
        cur_uv_aligned = jnp.asarray(
            np.asarray(cur_frm.h_undist_xy)[np.clip(idx2_h, 0, None)]
        )
        cur_bear_aligned = jnp.asarray(
            np.asarray(cur_frm.h_bearings)[np.clip(idx2_h, 0, None)]
        )
        mvalid = jnp.asarray(acc_h)
        return self._initialize_from_aligned(
            ref, cur_uv_aligned, cur_bear_aligned, mvalid, num_matches)

    # ------------------------------------------------------------------
    def _initialize_from_aligned(self, ref, cur_uv_aligned, cur_bear_aligned,
                                 mvalid, num_matches: int) -> bool:
        """Two-view reconstruction from per-ref-slot aligned correspondences
        (`ref` only needs .undist_xy / .bearings). Standard hypothesis batch
        first; on failure with low consensus, the escalated sweep."""
        self._key, k1, k2, k3, k4 = jax.random.split(self._key, 5)

        hyp = self._two_view_hypotheses(
            ref, cur_uv_aligned, cur_bear_aligned, mvalid, k1, k2,
            escalated=False)
        n_std = float(jnp.sum(hyp[3] & mvalid)) if hyp is not None else 0.0
        if n_std / max(num_matches, 1) >= self.escalation_ratio_thr:
            # healthy consensus: trust the standard batch. A triangulation
            # failure here (low parallax / pure rotation) is not retried —
            # more hypotheses cannot manufacture parallax.
            return hyp is not None and self._finish_two_view(
                hyp, ref, cur_bear_aligned, mvalid)

        # low-inlier escalation: below the measured 8-point crossover
        # (~45% inliers, PARITY.md §2.6 / scripts/measure_ransac_8pt.py) a
        # sub-threshold consensus is as likely a wrong model as a hard
        # scene, so escalate EVEN when the standard batch found a nominal
        # model — brute-force with a chunked 32k-hypothesis sweep + LO
        # refits (the TPU counterpart of the reference's 5-point Stewenius
        # solver, essential_5pt.h) and reconstruct from whichever model
        # explains more correspondences.
        hyp_esc = self._two_view_hypotheses(
            ref, cur_uv_aligned, cur_bear_aligned, mvalid, k3, k4,
            escalated=True)
        n_esc = (float(jnp.sum(hyp_esc[3] & mvalid))
                 if hyp_esc is not None else -1.0)
        first, second = ((hyp_esc, hyp) if n_esc >= n_std else (hyp, hyp_esc))
        if first is not None and self._finish_two_view(
                first, ref, cur_bear_aligned, mvalid):
            return True
        return second is not None and self._finish_two_view(
            second, ref, cur_bear_aligned, mvalid)

    # ------------------------------------------------------------------
    def _two_view_hypotheses(self, ref, cur_uv_aligned, cur_bear_aligned,
                             mvalid, k1, k2, *, escalated: bool):
        """Candidate motions (R_h, t_h, hyp_valid, model_inliers) from the
        H/F model selection (perspective, perspective.cc:60-77) or the
        bearing-vector E solver (bearing_vector.cc); None when no solver
        produced a valid model."""
        if self.camera.model == CameraModel.PERSPECTIVE:
            if escalated:
                hres = hsolve.find_via_ransac_escalated(
                    k1, ref.undist_xy, cur_uv_aligned, mvalid)
                fres = fsolve.find_via_ransac_escalated(
                    k2, ref.undist_xy, cur_uv_aligned, mvalid)
            else:
                hres = hsolve.find_via_ransac(
                    k1, ref.undist_xy, cur_uv_aligned, mvalid,
                    num_hypotheses=self.num_ransac_iters, recompute=False)
                fres = fsolve.find_via_ransac(
                    k2, ref.undist_xy, cur_uv_aligned, mvalid,
                    num_hypotheses=self.num_ransac_iters, recompute=False)
            cost_h = float(hres.cost)
            cost_f = float(fres.cost)
            use_h = (cost_h / max(cost_h + cost_f, 1e-9) < 0.5) and bool(hres.valid)
            p = self.camera.params
            K = np.array(
                [[float(p.fx), 0, float(p.cx)], [0, float(p.fy), float(p.cy)], [0, 0, 1]],
                dtype=np.float32,
            )
            if use_h:
                Hn = jnp.asarray(np.linalg.inv(K)) @ hres.H_21 @ jnp.asarray(K)
                R8, t8, n8, okh = hsolve.decompose(Hn)
                return R8, t8, okh, hres.is_inlier
            if bool(fres.valid):
                E = jnp.asarray(K.T) @ fres.F_21 @ jnp.asarray(K)
                R4, t4 = esolve.decompose(E)
                return R4, t4, jnp.ones(4, bool), fres.is_inlier
            return None
        # bearing-vector (E-based) initializer for all other models
        if escalated:
            eres = esolve.find_via_ransac_escalated(
                k1, ref.bearings, cur_bear_aligned, mvalid)
            # true 5-point minimal sets (the reference's Stewenius path,
            # bearing_vector.cc + essential_solver.h:46-58): ~37x better
            # per-sample odds than 8-point at 30% inliers — measured
            # 9/10 vs 1/10 at 256 hypotheses (tests/test_essential_5pt.py)
            eres5 = esolve.find_via_ransac_5pt(
                k2, ref.bearings, cur_bear_aligned, mvalid,
                num_hypotheses=1024)
            if bool(eres5.valid) and (
                    not bool(eres.valid)
                    or int(eres5.num_inliers) > int(eres.num_inliers)):
                eres = eres5
        else:
            eres = esolve.find_via_ransac(
                k1, ref.bearings, cur_bear_aligned, mvalid,
                num_hypotheses=self.num_ransac_iters)
        if not bool(eres.valid):
            return None
        R4, t4 = esolve.decompose(eres.E_21)
        return R4, t4, jnp.ones(4, bool), eres.is_inlier

    # ------------------------------------------------------------------
    def _finish_two_view(self, hyp, ref, cur_bear_aligned, mvalid) -> bool:
        """Evaluate the motion hypotheses by triangulation and, on success,
        stash the scale-normalized reconstruction products."""
        R_h, t_h, hyp_valid, inl = hyp
        best, count, ok, pts1, pt_ok, R21, t21 = _evaluate_hypotheses(
            R_h, t_h, hyp_valid, ref.bearings, cur_bear_aligned, inl & mvalid,
            self.parallax_cos_thr, self.reproj_cos_thr,
            min_pts=self.min_num_triangulated_pts,
            require_positive_z=self.camera.model == CameraModel.PERSPECTIVE,
        )
        if not bool(ok):
            return False

        pts1_h = np.asarray(pts1)
        pt_ok_h = np.asarray(pt_ok)
        # scale normalization by median (absolute) depth — abs for 360
        # cameras where points sit behind the camera plane
        # (initializer.h:104-108; keyframe compute_median_depth(abs))
        med = float(np.median(np.abs(pts1_h[pt_ok_h][:, 2])))
        if med <= 0:
            return False
        scale = 1.0 / med
        self.triangulated_pts = pts1_h * scale
        self.triangulated_ok = pt_ok_h
        self.R_21 = np.asarray(R21)
        self.t_21 = np.asarray(t21) * scale
        self.state = Initializer.SUCCEEDED
        return True
