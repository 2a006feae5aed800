"""Global optimization module: loop detection, correction, pose-graph + BA.

Reference: src/stella_vslam/global_optimization_module.{h,cc} — a dedicated
thread consuming keyframes from the mapper: loop detect -> validate ->
Sim3-propagate the correction to covisibilities (cc:212-312, 314-398),
de-duplicate landmarks across the loop (cc:400-491), pose-graph optimization
(cc:284), loop-edge insertion, and a detached global-BA with spanning-tree
propagation (module/loop_bundle_adjuster.cc).

TPU-native split: pose-graph and global BA run as device programs
(ops/optim/sim3.optimize_pose_graph, ops/optim/ba.bundle_adjust with global
buckets); graph surgery stays host-side.
"""
from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.util.fetch import fetch_all

from stella_vslam_tpu.module.loop_detector import LoopDetector
from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars
from stella_vslam_tpu.ops import lie as lie_np  # noqa: F401  (naming clarity)
from stella_vslam_tpu.ops.optim import ba as ba_mod
from stella_vslam_tpu.ops.optim import sim3 as sim3_opt

_log = logging.getLogger(__name__)


class GlobalOptimizationModule:
    def __init__(self, map_db, camera, orb_params, bow_db, *,
                 fix_scale: bool = False, use_fixed_seed: bool = False,
                 loop_detector_kwargs: Optional[dict] = None):
        self.map_db = map_db
        self.camera = camera
        self.orb_params = orb_params
        self.loop_detector = LoopDetector(
            camera, orb_params, bow_db,
            fix_scale_in_Sim3_estimation=fix_scale,
            use_fixed_seed=use_fixed_seed,
            **(loop_detector_kwargs or {}),
        )
        self._queue: "queue.Queue" = queue.Queue()
        # False while a popped keyframe is being processed — shutdown's
        # drain barrier needs "queue empty AND nothing mid-flight"
        self._idle = True
        self._thread: Optional[threading.Thread] = None
        self._terminate = threading.Event()
        self.mapper = None  # wired by system
        self.num_loops_closed = 0
        self.loop_ba_running = False
        self._abort_loop_ba = False
        self._loop_ba_thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------------
    def warmup(self):
        """Pre-compile the loop-CORRECTION path's device programs at the
        (K, E) / (K, L, D) buckets a mid-size session reaches: the Sim3
        pose graph and the global BA otherwise cold-compile AT the first
        loop closure — measured: one local-BA writeback fetch blocked
        10.1 s mid-bench behind the pose-graph compile landing exactly at
        correction time, and the starved window cost the run its accuracy
        (ATE 165 mm vs 11 mm for the cache-warm rerun). Compiles either
        hit the persistent cache (~1 s each) or run once at startup where
        stalls are free."""
        import jax

        from stella_vslam_tpu.parallel.sharded_ba import \
            sharded_bundle_adjust

        eye = jnp.eye(3, dtype=jnp.float32)
        for Kp, Ep in ((32, 128), (32, 256)):
            res = sim3_opt.optimize_pose_graph(
                jnp.ones(Kp, jnp.float32),
                jnp.tile(eye[None], (Kp, 1, 1)),
                jnp.zeros((Kp, 3), jnp.float32),
                jnp.zeros(Kp, bool).at[0].set(True),
                jnp.zeros(Kp, bool).at[:3].set(True),
                jnp.zeros(Ep, jnp.int32),
                jnp.ones(Ep, jnp.int32),
                jnp.ones(Ep, jnp.float32),
                jnp.tile(eye[None], (Ep, 1, 1)),
                jnp.zeros((Ep, 3), jnp.float32),
                jnp.zeros(Ep, bool).at[:2].set(True),
            )
            jax.block_until_ready(res.s_cw)
        cam = make_cam_scalars(self.camera)
        model = self.camera.model.name.lower()
        for (K, L, D) in ((32, 4096, 16), (32, 8192, 16),
                          (32, 4096, 32), (32, 8192, 32)):
            prob = ba_mod.BAProblem(
                cam_R=jnp.tile(eye[None], (K, 1, 1)),
                cam_t=jnp.zeros((K, 3), jnp.float32),
                cam_fixed=jnp.zeros(K, bool).at[0].set(True),
                cam_valid=jnp.zeros(K, bool),
                lm_pos=jnp.zeros((L, 3), jnp.float32),
                lm_valid=jnp.zeros(L, bool),
                obs_cam=jnp.zeros((L, D), jnp.int32),
                obs_uv=jnp.zeros((L, D, 2), jnp.float32),
                obs_x_right=jnp.full((L, D), -1.0),
                obs_inv_sigma_sq=jnp.ones((L, D), jnp.float32),
                obs_valid=jnp.zeros((L, D), bool),
            )
            res = sharded_bundle_adjust(
                prob, cam, model=model, num_first=16, num_second=0)
            jax.block_until_ready(res.cost)

    # ------------------------------------------------------------------
    def queue_keyframe(self, kf):
        self._queue.put(kf)

    def start(self):
        self._terminate.clear()
        self._thread = threading.Thread(target=self.run, daemon=True)
        self._thread.start()

    def request_terminate(self):
        self._terminate.set()

    def join(self):
        if self._thread is not None:
            self._thread.join(timeout=30)
        if self._loop_ba_thread is not None:
            self._loop_ba_thread.join(timeout=60)

    def enable_loop_detector(self):
        self.loop_detector.enabled = True

    def disable_loop_detector(self):
        self.loop_detector.enabled = False

    def loop_detector_is_enabled(self) -> bool:
        return self.loop_detector.enabled

    def abort_loop_BA(self):
        """Abandon the in-flight loop BA (reference loop_bundle_adjuster
        abort: results are discarded when a new loop arrives)."""
        self._abort_loop_ba = True

    def request_loop_closure(self, keyfrm1_id: int, keyfrm2_id: int) -> bool:
        """Manual loop closure between two keyframes (reference
        global_optimization_module.cc:61-120): run the Sim3 validation of
        keyfrm1 against keyfrm2 directly (no BoW detection / continuity) and
        correct if it holds."""
        with self.map_db.lock:
            kf1 = self.map_db.keyframes.get(keyfrm1_id)
            kf2 = self.map_db.keyframes.get(keyfrm2_id)
            if kf1 is None or kf2 is None or kf1.will_be_erased \
                    or kf2.will_be_erased:
                return False
        out = self.loop_detector.select_loop_candidate_via_Sim3(
            self.map_db, kf1, keyfrm2_id
        )
        if out is None:
            return False
        cand_id, sim3_cw, src_cand_slot, inl = out[:4]
        self.correct_loop(kf1, cand_id, sim3_cw, src_cand_slot, inl)
        return True

    # ------------------------------------------------------------------
    def run(self):
        while not self._terminate.is_set():
            try:
                kf = self._queue.get(timeout=0.005)
            except queue.Empty:
                continue
            self._idle = False
            try:
                self.process_keyframe(kf)
            except Exception:
                # never let the loop-closing thread die silently — a dead
                # thread would stop ALL future loop detection (the reference
                # thread survives per-keyframe failures)
                _log.exception("loop processing failed for keyframe %d", kf.id)
            finally:
                self._idle = True

    def is_idle(self) -> bool:
        return self._idle and self._queue.empty()

    def process_keyframe(self, kf):
        if kf.will_be_erased:
            return
        # erase protection while this keyframe is under loop processing: the
        # mapper's redundant-keyframe culling runs concurrently and erasing
        # the query or the selected candidate mid-flight would corrupt the
        # correction (reference global_optimization_module.cc:164-169 +
        # loop_detector candidate protection)
        kf.set_not_to_be_erased(True)
        cand_kf = None
        try:
            cands = self.loop_detector.detect_loop_candidates(self.map_db, kf)
            if not cands:
                return
            # protect every candidate for the duration of validation
            # (reference loop_detector.cc protects candidates through the
            # Sim3 validation rounds)
            with self.map_db.lock:
                protected = [
                    self.map_db.keyframes[c] for c in cands
                    if c in self.map_db.keyframes
                    and not self.map_db.keyframes[c].will_be_erased
                ]
                for c_kf in protected:
                    c_kf.set_not_to_be_erased(True)
            try:
                val = self.loop_detector.validate_candidates(
                    self.map_db, kf, cands)
            finally:
                for c_kf in protected:
                    c_kf.set_not_to_be_erased(False)
            if val is None:
                return
            cand_id, sim3_cw, src_cand_slot, inl = val
            with self.map_db.lock:
                cand_kf = self.map_db.keyframes.get(cand_id)
                if cand_kf is None or cand_kf.will_be_erased:
                    return
                cand_kf.set_not_to_be_erased(True)
            self.correct_loop(kf, cand_id, sim3_cw, src_cand_slot, inl)
        finally:
            kf.set_not_to_be_erased(False)
            if cand_kf is not None:
                # keyframes on a closed loop keep their loop edges, which
                # can_be_erased() already treats as permanent protection
                cand_kf.set_not_to_be_erased(False)

    # ------------------------------------------------------------------
    def correct_loop(self, cur_kf, cand_id, sim3_cw, src_cand_slot, inl):
        map_db = self.map_db
        # a newer loop supersedes any BA still in flight (reference
        # global_optimization_module.cc:228-235 abort + wait)
        if self._loop_ba_thread is not None and self._loop_ba_thread.is_alive():
            self.abort_loop_BA()
            self._loop_ba_thread.join(timeout=60)
        if self.mapper is not None:
            self.mapper.request_pause()
            t0 = time.time()
            while not self.mapper.is_paused() and time.time() - t0 < 5.0 \
                    and self.mapper._thread is not None and self.mapper._thread.is_alive():
                time.sleep(0.002)

        try:
            with map_db.lock:
                # invalidate any BA writeback still in flight on the mapper:
                # applying pre-correction poses after this point would undo
                # the correction (inline mode / pause-timeout path)
                map_db.bump_epoch()
                s_cw, R_cw, t_cw = sim3_cw
                # non-corrected Sim3 of current
                R_old, t_old = cur_kf.rot_cw, cur_kf.trans_cw
                # corrected Sim3s for current + covisibilities:
                # S_i_corr = S_i_old o S_cur_old^-1 o S_cur_corr
                covis = [cur_kf.id] + cur_kf.graph_node.get_covisibilities()
                corrections = {}
                # pre-correction poses — the pose-graph edge measurements must
                # come from the NON-corrected relative poses so the loop
                # constraint creates tension that the optimization distributes
                # over the essential graph (reference graph_optimizer.cc:65-104
                # non_corrected_Sim3s)
                pre_poses = {}
                moved_lms = set()
                for kid in covis:
                    kf = map_db.keyframes.get(kid)
                    if kf is None or kf.will_be_erased:
                        continue
                    R_i, t_i = kf.rot_cw, kf.trans_cw
                    pre_poses[kid] = (R_i.copy(), t_i.copy())
                    # relative (SE3): i <- cur
                    R_rel = R_i @ R_old.T
                    t_rel = t_i - R_rel @ t_old
                    # corrected: S_i = SE3_rel o S_cur_corr (scale folds in)
                    s_i = s_cw
                    R_i_new = R_rel @ R_cw
                    t_i_new = R_rel @ t_cw + t_rel * s_cw
                    corrections[kid] = (s_i, R_i_new, t_i_new)
                # move landmarks observed by the covisible set:
                # X_new = S_i_corr^-1 ( S_i_old (X_old) ), Sim3 inverse recovers
                # the scale-corrected position
                for kid in covis:
                    kf = map_db.keyframes.get(kid)
                    if kf is None or kid not in corrections:
                        continue
                    s_i, R_i_new, t_i_new = corrections[kid]
                    R_i, t_i = kf.rot_cw, kf.trans_cw
                    for lm_id in kf.lm_ids[kf.lm_ids >= 0]:
                        lm = map_db.landmarks.get(int(lm_id))
                        if lm is None or lm.will_be_erased or lm.id in moved_lms:
                            continue
                        moved_lms.add(lm.id)
                        Xc = R_i @ lm.pos_w + t_i  # old camera coords
                        # corrected world: S_corr^-1 applied to camera point
                        lm.pos_w = (R_i_new.T @ (Xc - t_i_new)) / s_i
                    # write the corrected SE3 pose (divide translation by s)
                    T = np.eye(4)
                    T[:3, :3] = R_i_new
                    T[:3, 3] = t_i_new / s_i
                    kf.set_pose_cw(T)

                # landmark de-duplication across the loop: matched candidate
                # landmarks replace current ones (cc:400-491)
                cand = map_db.keyframes.get(cand_id)
                if cand is not None:
                    for f_slot in np.nonzero(inl & (src_cand_slot >= 0))[0]:
                        cand_lm_id = cand.lm_ids[src_cand_slot[f_slot]]
                        cur_lm_id = cur_kf.lm_ids[f_slot]
                        if cand_lm_id < 0:
                            continue
                        cand_lm = map_db.landmarks.get(int(cand_lm_id))
                        if cand_lm is None or cand_lm.will_be_erased:
                            continue
                        if cur_lm_id >= 0 and cur_lm_id != cand_lm_id:
                            cur_lm = map_db.landmarks.get(int(cur_lm_id))
                            if cur_lm is not None and not cur_lm.will_be_erased:
                                map_db.replace_landmark(cur_lm, cand_lm)
                        elif cur_lm_id < 0 and cur_kf.id not in cand_lm.observations:
                            cand_lm.add_observation(cur_kf.id, int(f_slot))
                            cur_kf.add_landmark(int(cand_lm_id), int(f_slot))

                # cross-loop landmark fusion: project the candidate-side
                # local landmarks into EVERY corrected covisibility keyframe
                # and fuse duplicates (reference replace_duplicated_landmarks,
                # global_optimization_module.cc:400-491) — this creates the
                # cross-loop observations that let the global BA stitch the
                # two sides rigidly
                if cand is not None and self.mapper is not None:
                    arrs = []
                    for kid in [cand_id] + cand.graph_node.get_covisibilities():
                        ckf = map_db.keyframes.get(kid)
                        if ckf is None or ckf.will_be_erased:
                            continue
                        arrs.append(ckf.lm_ids[ckf.lm_ids >= 0])
                    cand_side_ids = map_db.fields.live(
                        np.unique(np.concatenate(arrs))) if arrs else []
                    fuse_kfs = [
                        map_db.keyframes[k] for k in covis
                        if k in map_db.keyframes
                        and not map_db.keyframes[k].will_be_erased
                    ]
                    if len(cand_side_ids) and fuse_kfs:
                        self.mapper._fuse_into(map_db, fuse_kfs, cand_side_ids,
                                               margin=4.0)

                # new connections after fusion (reference
                # extract_new_connections, global_optimization_module.cc:
                # 493-517): connections that EXIST ONLY BECAUSE of the loop
                # fusion. Their true relative geometry is the corrected one —
                # the pose graph must measure them at the corrected Sim3s
                # like the loop edge (graph_optimizer.cc:128-154 adds
                # loop_connections from Sim3s_cw), NOT at the pre-correction
                # poses (which for a cross-seam pair encode the full
                # odometric drift and would fight the loop constraint; a
                # run with such mis-measured edges left a 0.3-0.9 m bend).
                covis_set = set(covis)
                new_connections = set()
                for kid in covis:
                    kf = map_db.keyframes.get(kid)
                    if kf is None or kf.will_be_erased:
                        continue
                    before = set(kf.graph_node.get_covisibilities())
                    kf.graph_node.update_connections(map_db)
                    after = set(kf.graph_node.get_covisibilities())
                    for nid in after - before - covis_set:
                        # reference threshold: >= 100 shared landmarks
                        # except the cur-loop pair itself
                        w = kf.graph_node.connections.get(nid, 0)
                        if w >= 100 or {kid, nid} == {cur_kf.id, cand_id}:
                            new_connections.add(
                                (min(kid, nid), max(kid, nid)))
                # loop edges
                cur_kf.graph_node.add_loop_edge(cand_id)
                if cand is not None:
                    cand.graph_node.add_loop_edge(cur_kf.id)

            # pose-graph optimization over the essential graph
            self._pose_graph_optimize(
                corrections, pre_poses, loop_pair=(cur_kf.id, cand_id),
                new_connections=new_connections,
            )
            self.num_loops_closed += 1
        finally:
            if self.mapper is not None:
                self.mapper.resume()
            # post-correction local map re-centered on the corrected keyframe
            # (its covisibilities now include the loop side)
            self.map_db.refresh_device_table(center_kf_id=cur_kf.id)

        # global BA runs DETACHED with mapping live (reference spawns a
        # thread, global_optimization_module.cc:302 -> loop_bundle_adjuster);
        # keyframes created meanwhile get spanning-tree-propagated poses at
        # writeback. Inline/deterministic mode keeps it synchronous.
        center = cur_kf.id
        if self.mapper is not None and self.mapper.synchronous_ba:
            self.run_global_bundle_adjustment(center_kf_id=center)
            self._merge_duplicate_layers(center_kf_id=center)
        else:
            self.loop_ba_running = True
            self._loop_ba_thread = threading.Thread(
                target=self._loop_ba_then_merge,
                kwargs={"center_kf_id": center}, daemon=True)
            self._loop_ba_thread.start()

    def _loop_ba_then_merge(self, center_kf_id=None):
        self.run_global_bundle_adjustment(center_kf_id=center_kf_id)
        if not self._abort_loop_ba:
            self._merge_duplicate_layers(center_kf_id=center_kf_id)

    def _merge_duplicate_layers(self, center_kf_id=None,
                                max_pairs: int = 64):
        """Post-loop-BA duplicate-layer merge (beyond the reference).

        The reference's replace_duplicated_landmarks
        (global_optimization_module.cc:400-491) fuses only the loop
        keyframe's covisibility neighborhood, so when a revisit leg mapped a
        duplicate landmark layer under occlusion (the panels-world failure
        mode: the legs share ~zero landmarks away from the seam), the pose
        graph distributes the seam correction into a weakly-tied leg and the
        closed loop keeps a 0.1-0.2 m bend. After the corrected gauges
        agree, duplicates are finally within projection range of each other
        — detect keyframe pairs whose VIEW FOOTPRINTS overlap (centroids of
        their observed landmarks closer than the footprint spread: they
        mapped the same surface) yet are covisibility-DISCONNECTED and
        temporally distant (i.e. a revisit that never re-acquired), fuse
        each side's landmarks into the other, and if anything merged run
        one more global BA so the new cross-leg ties actually pull the
        layers together. Camera-center proximity is deliberately NOT the
        criterion: a revisit leg passes meters away from the original leg
        while observing the same scene content. No-op (zero device
        dispatches) on well-coupled maps, where every overlapping-view pair
        is already connected."""
        map_db = self.map_db
        if self.mapper is None:
            return
        with map_db.lock:
            kfs = [kf for kf in map_db.keyframes.values()
                   if not kf.will_be_erased]
            if len(kfs) < 8:
                return
            pos = map_db.fields.pos
            alive = map_db.fields.alive
            cent, spread, lm_sets = [], [], []
            for kf in kfs:
                ids = kf.get_valid_landmark_ids()
                ids = ids[alive[ids]]
                if len(ids) < 20:
                    cent.append(np.full(3, np.nan))
                    spread.append(0.0)
                    lm_sets.append(ids)
                    continue
                p = pos[ids]
                c = p.mean(axis=0)
                cent.append(c)
                spread.append(float(np.median(
                    np.linalg.norm(p - c, axis=1))))
                lm_sets.append(ids)
            cent = np.stack(cent)
            spread = np.asarray(spread)
            ts = np.asarray([kf.timestamp for kf in kfs])
            covis = {kf.id: set(kf.graph_node.get_covisibilities())
                     for kf in kfs}
        d = np.linalg.norm(cent[:, None, :] - cent[None, :, :], axis=2)
        overlap = d < 0.5 * (spread[:, None] + spread[None, :])
        ii, jj = np.nonzero(
            overlap & (np.abs(ts[:, None] - ts[None, :]) > 5.0))
        pairs = []
        for a, b in zip(ii.tolist(), jj.tolist()):
            if a >= b:
                continue
            ka, kb = kfs[a], kfs[b]
            if kb.id in covis.get(ka.id, ()):  # already coupled
                continue
            pairs.append((a, b, d[a, b]))
        if len(pairs) < 4:
            # isolated stragglers happen on healthy maps (e.g. around the
            # seam before its connections recount) — not a duplicate layer
            return
        pairs.sort(key=lambda p: p[2])
        pairs = pairs[:max_pairs]
        _log.info("duplicate-layer merge: %d disconnected overlapping-view "
                  "pairs", len(pairs))
        # group per keyframe: ONE fuse dispatch per involved keyframe over
        # the union of its partners' landmarks
        partner_ids: dict = {}
        touched = set()
        for a, b, _dist in pairs:
            partner_ids.setdefault(a, []).append(lm_sets[b])
            partner_ids.setdefault(b, []).append(lm_sets[a])
            touched.add(kfs[a].id)
            touched.add(kfs[b].id)
        for idx, chunks in partner_ids.items():
            kf = kfs[idx]
            with map_db.lock:
                ids = map_db.fields.live(
                    np.unique(np.concatenate(chunks)))
            if len(ids):
                self.mapper._fuse_into(map_db, [kf], ids, margin=4.0)
        with map_db.lock:
            n_new = 0
            for kid in touched:
                kf = map_db.keyframes.get(kid)
                if kf is None or kf.will_be_erased:
                    continue
                before = set(kf.graph_node.get_covisibilities())
                kf.graph_node.update_connections(map_db)
                n_new += len(set(kf.graph_node.get_covisibilities()) - before)
        _log.info("duplicate-layer merge: %d new covisibility links", n_new)
        if n_new and not self._abort_loop_ba:
            # the merged observations only straighten the layers once an
            # optimization consumes them
            self.run_global_bundle_adjustment(center_kf_id=center_kf_id)

    # ------------------------------------------------------------------
    def _pose_graph_optimize(self, corrections, pre_poses=None,
                             loop_pair=None, new_connections=None):
        """Sim3 pose-graph over the essential graph (reference
        graph_optimizer.cc). Vertex initialization uses the CORRECTED Sim3s
        for the loop-corrected covisibility group; PRE-EXISTING edge
        measurements use the NON-corrected relative poses — the resulting
        tension against the loop edge and the fusion-born `new_connections`
        (both measured at the corrected poses, graph_optimizer.cc:128-154)
        is what distributes the correction over the whole graph
        (graph_optimizer.cc:65-150)."""
        map_db = self.map_db
        pre_poses = pre_poses or {}
        with map_db.lock:
            kf_ids = sorted(
                k for k, kf in map_db.keyframes.items() if not kf.will_be_erased
            )
            if len(kf_ids) < 3:
                return
            idx_of = {k: i for i, k in enumerate(kf_ids)}
            K = len(kf_ids)
            s = np.ones(K, np.float32)
            R = np.zeros((K, 3, 3), np.float32)
            t = np.zeros((K, 3), np.float32)
            # vertex init Sim3: the landmark-consistent pose of each keyframe
            # (corrected Sim3 for the covis group, current SE3 otherwise)
            before_sim3 = {}
            for k, i in idx_of.items():
                kf = map_db.keyframes[k]
                if k in corrections:
                    s_i, R_i, t_i = corrections[k]
                    s[i], R[i], t[i] = s_i, R_i, t_i
                    before_sim3[k] = (float(s_i), np.array(R_i), np.array(t_i))
                else:
                    R[i] = kf.rot_cw
                    t[i] = kf.trans_cw
                    before_sim3[k] = (1.0, kf.rot_cw.copy(), kf.trans_cw.copy())

            def sim3_noncorr(k):
                # pre-correction pose (SE3) — the odometry the graph must bend
                if k in pre_poses:
                    R_p, t_p = pre_poses[k]
                    return 1.0, R_p, t_p
                kf = map_db.keyframes[k]
                return 1.0, kf.rot_cw, kf.trans_cw

            # essential graph edges: spanning tree + loop edges + covis >= 100
            edges = set()
            loop_edge_set = set()
            for k in kf_ids:
                kf = map_db.keyframes[k]
                gn = kf.graph_node
                if gn.spanning_parent is not None and gn.spanning_parent in idx_of:
                    edges.add((min(k, gn.spanning_parent), max(k, gn.spanning_parent)))
                for le in gn.loop_edges:
                    if le in idx_of:
                        edges.add((min(k, le), max(k, le)))
                        loop_edge_set.add((min(k, le), max(k, le)))
                for cid, w in gn.connections.items():
                    if w >= 100 and cid in idx_of:
                        edges.add((min(k, cid), max(k, cid)))
            for (a, b) in (new_connections or ()):
                if a in idx_of and b in idx_of:
                    edges.add((a, b))
                    loop_edge_set.add((a, b))
            if loop_pair is not None:
                a, b = loop_pair
                if a in idx_of and b in idx_of:
                    edges.add((min(a, b), max(a, b)))
                    loop_edge_set.add((min(a, b), max(a, b)))
                else:
                    # an endpoint was erased between validation and here —
                    # the erase-protection protocol should prevent this;
                    # optimizing without the loop edge would bend the graph
                    # toward nothing, so bail out
                    _log.error("pose graph: loop pair (%d,%d) not alive", a, b)
                    return
            edges = sorted(edges)
            if not edges:
                return
            # diagnostics: the essential-graph structure this correction
            # distributed over (read by scripts/diag_ate.py)
            self._last_pose_graph_edges = {
                "edges": list(edges), "loop_edges": sorted(loop_edge_set),
                "corrected": sorted(corrections.keys()),
            }
            E = len(edges)
            ei = np.array([idx_of[a] for a, b in edges], np.int32)
            ej = np.array([idx_of[b] for a, b in edges], np.int32)
            es = np.ones(E, np.float32)
            eR = np.zeros((E, 3, 3), np.float32)
            et = np.zeros((E, 3), np.float32)
            for n, (a, b) in enumerate(edges):
                if (a, b) in loop_edge_set:
                    # loop constraints are measured at the corrected poses
                    sa, Ra, ta = before_sim3[a]
                    sb, Rb, tb = before_sim3[b]
                else:
                    sa, Ra, ta = sim3_noncorr(a)
                    sb, Rb, tb = sim3_noncorr(b)
                # measurement S_ab = S_a o S_b^-1 (Sim3 composition)
                es[n] = sa / sb
                eR[n] = Ra @ Rb.T
                et[n] = ta - es[n] * (eR[n] @ tb)

        # pow2 (K, E) buckets so loop closures with nearby graph sizes share
        # ONE compiled program: the raw-shape version recompiled on nearly
        # every loop closure (keyframe/edge counts almost never repeat) —
        # a fresh 20-60 s compile while the mapper is paused, mid-run
        Kp = 1 << int(np.ceil(np.log2(max(K, 16))))
        Ep = 1 << int(np.ceil(np.log2(max(E, 16))))
        fixed = np.array([k in map_db.spanning_roots for k in kf_ids])
        valid = np.zeros(Kp, bool)
        valid[:K] = True
        evalid = np.zeros(Ep, bool)
        evalid[:E] = True

        def padk(a, fill=0.0):
            out = np.full((Kp,) + a.shape[1:], fill, a.dtype)
            out[:K] = a
            return out

        def pade(a, fill=0.0):
            out = np.full((Ep,) + a.shape[1:], fill, a.dtype)
            out[:E] = a
            return out

        R_pad = padk(R)
        R_pad[K:] = np.eye(3, dtype=np.float32)
        eR_pad = pade(eR)
        eR_pad[E:] = np.eye(3, dtype=np.float32)
        res = sim3_opt.optimize_pose_graph(
            jnp.asarray(padk(s, 1.0)), jnp.asarray(R_pad),
            jnp.asarray(padk(t)),
            jnp.asarray(np.concatenate([fixed, np.ones(Kp - K, bool)])),
            jnp.asarray(valid),
            jnp.asarray(pade(ei)), jnp.asarray(pade(ej)),
            jnp.asarray(pade(es, 1.0)),
            jnp.asarray(eR_pad), jnp.asarray(pade(et)), jnp.asarray(evalid),
        )
        s_new, R_new, t_new = fetch_all(res.s_cw, res.R_cw, res.t_cw)
        with map_db.lock:
            # remap landmarks via their reference keyframe's
            # landmark-consistent Sim3 before / optimized Sim3 after
            # (graph_optimizer.cc tail)
            for lm in map_db.landmarks.values():
                if lm.will_be_erased:
                    continue
                rk = lm.ref_keyfrm_id
                if rk not in idx_of or rk not in before_sim3:
                    continue
                i = idx_of[rk]
                s_b, R_b, t_b = before_sim3[rk]
                Xc = s_b * (R_b @ lm.pos_w) + t_b  # camera coords (Sim3)
                lm.pos_w = R_new[i].T @ (Xc - t_new[i]) / s_new[i]
            for k, i in idx_of.items():
                kf = map_db.keyframes.get(k)
                if kf is None:
                    continue
                T = np.eye(4)
                T[:3, :3] = R_new[i]
                T[:3, 3] = t_new[i] / s_new[i]
                kf.set_pose_cw(T)

    # ------------------------------------------------------------------
    def run_global_bundle_adjustment(self, num_iter: int = 16,
                                     center_kf_id=None):
        """Full-map BA (reference loop_bundle_adjuster + global_bundle_adjuster).

        Unlike local BA, the reference's global BA is a SINGLE robust stage
        with no mid-schedule outlier reclassification
        (global_bundle_adjuster.cc) — pruning would drop exactly the
        high-residual cross-loop observations that stitch the corrected map.

        Mapping stays LIVE while the BA device program runs; only the
        writeback pauses the mapper. Keyframes and landmarks created during
        the BA are brought into the optimized frame by spanning-tree
        propagation: a non-optimized child keeps its relative pose to its
        spanning parent, and a non-optimized landmark rides its reference
        keyframe's before/after poses (loop_bundle_adjuster.cc:84-116,
        139-175)."""
        map_db = self.map_db
        self.loop_ba_running = True
        self._abort_loop_ba = False
        paused_here = False
        try:
            prob, lm_ids, kf_slots, marker_rows = self._assemble_global_ba()
            if prob is None:
                return
            # multi-chip: landmark rows sharded over the mesh, XLA inserts
            # the Schur-assembly all-reduces (parallel/sharded_ba.py);
            # single-chip: the same program unsharded
            from stella_vslam_tpu.parallel.sharded_ba import \
                sharded_bundle_adjust

            res = sharded_bundle_adjust(
                prob, make_cam_scalars(self.camera),
                model=self.camera.model.name.lower(),
                num_first=num_iter, num_second=0,
            )
            camR, camt, lm_new = fetch_all(res.cam_R, res.cam_t, res.lm_pos)
            if self._abort_loop_ba:
                # a newer loop superseded this BA: discard the results
                # (reference loop_bundle_adjuster.cc abort path)
                return
            # pause the mapper only for the writeback; the pause ack settles
            # any in-flight local-BA writeback first
            if self.mapper is not None and not self.mapper.is_paused() \
                    and not self.mapper.synchronous_ba:
                self.mapper.request_pause()
                t0 = time.time()
                while not self.mapper.is_paused() and time.time() - t0 < 5.0 \
                        and self.mapper._thread is not None \
                        and self.mapper._thread.is_alive():
                    time.sleep(0.002)
                paused_here = True
            self._apply_global_ba_result(
                prob, lm_ids, kf_slots, marker_rows, camR, camt, lm_new)
            map_db.refresh_device_table(center_kf_id=center_kf_id)
        finally:
            if paused_here and self.mapper is not None:
                self.mapper.resume()
            self.loop_ba_running = False

    def _apply_global_ba_result(self, prob, lm_ids, kf_slots, marker_rows,
                            camR, camt, lm_new):
        """Global-BA writeback with spanning-tree propagation (factored out
        so tests can interleave map growth between solve and writeback)."""
        map_db = self.map_db
        with map_db.lock:
            if self._abort_loop_ba:
                return
            # any pending local BA surviving the pause settle is stale now
            map_db.bump_epoch()
            cam_fixed_h = np.asarray(prob.cam_fixed)
            before = {
                k: (kf.rot_cw.copy(), kf.trans_cw.copy())
                for k, kf in map_db.keyframes.items()
                if not kf.will_be_erased
            }
            after = {}
            for slot, kf_id in enumerate(kf_slots):
                if kf_id < 0 or kf_id not in before:
                    continue
                if bool(cam_fixed_h[slot]):
                    after[kf_id] = before[kf_id]
                else:
                    after[kf_id] = (
                        camR[slot].astype(np.float64),
                        camt[slot].astype(np.float64),
                    )
            # spanning-tree propagation, parents before children
            roots = [
                k for k in before
                if map_db.keyframes[k].graph_node.spanning_parent is None
            ]
            stack = list(roots)
            visited = set()
            while stack:
                k = stack.pop()
                if k in visited:
                    continue
                visited.add(k)
                kf = map_db.keyframes.get(k)
                if kf is None:
                    continue
                if k not in after and k in before:
                    parent = kf.graph_node.spanning_parent
                    if parent in after and parent in before:
                        Rp_b, tp_b = before[parent]
                        Rc_b, tc_b = before[k]
                        R_rel = Rc_b @ Rp_b.T  # child <- parent (before)
                        t_rel = tc_b - R_rel @ tp_b
                        Rp_a, tp_a = after[parent]
                        after[k] = (R_rel @ Rp_a, R_rel @ tp_a + t_rel)
                stack.extend(kf.graph_node.spanning_children)
            for k, (Ra, ta) in after.items():
                kf = map_db.keyframes.get(k)
                if kf is None or kf.will_be_erased:
                    continue
                T = np.eye(4)
                T[:3, :3] = Ra
                T[:3, 3] = ta
                kf.set_pose_cw(T)
            # landmarks: optimized rows directly, the rest remapped via
            # their reference keyframe before/after poses
            row_of = {
                lm_id: l for l, lm_id in enumerate(lm_ids) if lm_id >= 0
            }
            for lm_id, lm in map_db.landmarks.items():
                if lm.will_be_erased:
                    continue
                row = row_of.get(lm_id)
                if row is not None:
                    lm.pos_w = lm_new[row].astype(np.float64)
                    continue
                rk = lm.ref_keyfrm_id
                if rk in before and rk in after:
                    Rb, tb = before[rk]
                    Ra, ta = after[rk]
                    Xc = Rb @ lm.pos_w + tb
                    lm.pos_w = Ra.T @ (Xc - ta)
            for mk, ci, row in marker_rows:
                if not mk.keep_fixed:
                    mk.corners_world[ci] = lm_new[row].astype(np.float64)

    def _assemble_global_ba(self, D: Optional[int] = None):
        map_db = self.map_db
        with map_db.lock:
            kf_ids = sorted(
                k for k, kf in map_db.keyframes.items() if not kf.will_be_erased
            )
            lm_ids = sorted(
                k for k, lm in map_db.landmarks.items() if not lm.will_be_erased
            )
            if len(kf_ids) < 2 or len(lm_ids) < 8:
                return None, None, None, None
            K = 1 << int(np.ceil(np.log2(max(len(kf_ids), 2))))
            L = 1 << int(np.ceil(np.log2(max(len(lm_ids), 8))))
            if D is None:
                # adaptive observation width: pow2 bucket of the true max
                # observer count, so EVERY observation constrains the solve —
                # the reference's global BA keeps all observations
                # (global_bundle_adjuster.cc); a fixed D=8 silently dropped
                # constraints from long-lived landmarks during loop stitching
                counts = map_db.assoc_store.num_obs_bulk(
                    np.asarray(lm_ids, np.int64))
                max_obs = int(counts.max()) if len(counts) else 2
                D = 1 << int(np.ceil(np.log2(max(max_obs, 8))))
            slot_of = {k: i for i, k in enumerate(kf_ids)}
            inv_sigma = np.asarray(self.orb_params.inv_level_sigma_sq, np.float32)
            cam_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
            cam_t = np.zeros((K, 3), np.float32)
            cam_fixed = np.ones(K, bool)
            cam_valid = np.zeros(K, bool)
            for k, i in slot_of.items():
                kf = map_db.keyframes[k]
                cam_R[i] = kf.rot_cw
                cam_t[i] = kf.trans_cw
                cam_valid[i] = True
                cam_fixed[i] = (
                    k in map_db.spanning_roots
                    or k <= map_db.fixed_keyframe_id_threshold
                )
            lm_pos = np.zeros((L, 3), np.float32)
            lm_valid = np.zeros(L, bool)
            nl = len(lm_ids)
            lm_pos[:nl] = map_db.fields.pos[np.asarray(lm_ids, np.int64)]
            lm_valid[:nl] = True
            lm_ids_arr = np.asarray(
                list(lm_ids) + [-1] * (L - len(lm_ids)), np.int64
            )
            obs_cam, obs_idx, obs_valid = map_db.assoc_store.assemble_ba(
                lm_ids_arr, np.asarray(kf_ids, np.int64),
                np.arange(len(kf_ids), dtype=np.int32), D,
            )
            from stella_vslam_tpu.data.map_database import \
                fill_observation_tables

            obs_uv, obs_xr, obs_w = fill_observation_tables(
                map_db, kf_ids, obs_cam, obs_idx, obs_valid, inv_sigma)
            # marker corner vertices (reference global_bundle_adjuster
            # marker edges; same semantics as local BA)
            from stella_vslam_tpu.marker.marker import append_marker_rows

            lm_fixed = np.zeros(L, bool)
            lm_keep = np.zeros(L, bool)
            marker_rows = append_marker_rows(
                map_db, slot_of, lm_pos, lm_valid, lm_fixed,
                obs_cam, obs_uv, obs_w, obs_valid, start_row=len(lm_ids),
                lm_keep_inlier=lm_keep,
            )
        prob = ba_mod.BAProblem(
            cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
            cam_fixed=jnp.asarray(cam_fixed), cam_valid=jnp.asarray(cam_valid),
            lm_pos=jnp.asarray(lm_pos), lm_valid=jnp.asarray(lm_valid),
            obs_cam=jnp.asarray(obs_cam), obs_uv=jnp.asarray(obs_uv),
            obs_x_right=jnp.asarray(obs_xr), obs_inv_sigma_sq=jnp.asarray(obs_w),
            obs_valid=jnp.asarray(obs_valid), lm_fixed=jnp.asarray(lm_fixed),
            lm_keep_inlier=jnp.asarray(lm_keep),
        )
        return (
            prob,
            list(lm_ids) + [-1] * (L - len(lm_ids)),
            list(kf_ids) + [-1] * (K - len(kf_ids)),
            marker_rows,
        )
