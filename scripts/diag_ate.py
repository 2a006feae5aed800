"""Diagnostic: per-segment ATE residuals on the bench trajectory for a
given world (BENCH_WORLD=flat|panels|photo|hard). Replicates bench.py's
mono run and prints where the aligned residual lives (out / turn / back /
slow legs), plus a scale-drift probe (per-window trajectory-length ratio
vs ground truth)."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    from synthetic_world import PlaneWorld, umeyama_align

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System
    from stella_vslam_tpu.util.drift import inject_segment_drift, pose_at_xy

    wk = os.environ.get("BENCH_WORLD", "photo")
    world = PlaneWorld(width=752, height=480, fx=458.0, fy=458.0, depth=4.0,
                       tex_size=4096, meters_per_px=0.008,
                       panels=14 if wk in ("hard", "panels") else 0,
                       noise_sigma=2.0 if wk in ("hard", "photo") else 0.0,
                       exposure_amp=0.06 if wk in ("hard", "photo") else 0.0)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": 8},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg)
    slam.startup()
    out_xy = [(i * 0.015, 0.0) for i in range(500)]
    turn_xy = [(7.5, i * 0.014) for i in range(1, 101)]
    back_xy = [(7.5 - i * 0.015, 1.4) for i in range(1, 471)]
    # 220-frame final approach (was 110): the loop detector's 3-round
    # continuity check needs several consecutive revisit keyframe events;
    # at the faster descent the async keyframe cadence sometimes produced
    # too few and the detector never fired (measured: loops=0 in ~1 of 4
    # runs) — real sequences dwell on a revisit, so the slower approach is
    # the realistic case, not a relaxation
    slow_xy = [(0.44 - i * 0.00625, max(0.0, 1.4 - i * 0.0065))
               for i in range(220)]                              # -> (-0.93, 0)
    gt_xy = out_xy + turn_xy + back_xy + slow_xy
    t = 0.0
    for (x, y) in out_xy:
        slam.feed_monocular_frame(world.render(pose_at_xy(x, y)), t)
        t += 0.05
    slam.pause_other_threads()
    old_kfs, _ = inject_segment_drift(
        slam, tx_metric=0.50, yaw_deg=2.5, cutoff_frac=0.2,
        gt_span_metric=7.5)
    slam.resume_other_threads()
    for (x, y) in turn_xy + back_xy + slow_xy:
        slam.feed_monocular_frame(world.render(pose_at_xy(x, y)), t)
        t += 0.05
    slam.shutdown()
    results = slam.frame_poses
    fid0 = results[0][3]
    est, gt, idx = [], [], []
    for (_, pose, _, fid) in results:
        if pose is None:
            continue
        est.append(-pose[:3, :3].T @ pose[:3, 3])
        gt.append([gt_xy[fid - fid0][0], gt_xy[fid - fid0][1], 0.0])
        idx.append(fid - fid0)
    est, gt, idx = np.asarray(est), np.asarray(gt), np.asarray(idx)
    aligned, _ = umeyama_align(est, gt)
    res = np.linalg.norm(aligned - gt, axis=1)
    ate = float(np.sqrt(np.mean(res ** 2)))
    print(f"world={wk} ATE {ate*1e3:.0f} mm  loops="
          f"{slam.global_optimizer.num_loops_closed} "
          f"kfs={slam.map_db.num_keyframes()} "
          f"lms={slam.map_db.num_landmarks()}")
    segs = [("out", 0, 500), ("turn", 500, 600), ("back", 600, 1070),
            ("slow", 1070, 1290)]
    for name, a, b in segs:
        m = (idx >= a) & (idx < b)
        if m.any():
            print(f"  {name:5s} n={int(m.sum()):4d} rms "
                  f"{np.sqrt(np.mean(res[m]**2))*1e3:6.0f} mm  "
                  f"max {res[m].max()*1e3:6.0f} mm")
    # slow-leg anchor probe: which reference keyframe each slow frame
    # reconstructs from, and its residual — alternating anchors with a
    # residual seam misalignment show up as per-frame jumps here
    print("  slow-leg anchors (frame idx: ref_kf, residual mm):")
    rows = []
    for (ts, pose, ref, fid) in results:
        if pose is None or fid - fid0 < 1070:
            continue
        i = np.nonzero(idx == fid - fid0)[0]
        if len(i):
            rows.append((fid - fid0, ref, res[i[0]] * 1e3))
    for a in range(0, len(rows), 8):
        print("    " + "  ".join(f"{f}:kf{r}={e:.0f}" for f, r, e in
                                 rows[a:a + 8]))

    # keyframe residual probe: keyframe centers vs ground truth under the
    # SAME alignment — shows whether the seam residual lives in the map
    # itself (pose graph / global BA / landmark dedup) or only in the
    # frame reconstruction
    print("  keyframes (id @frame: residual mm):")
    R_al, t_al, s_al = None, None, None
    # recover the similarity from the umeyama output by refitting
    mu_e, mu_g = est.mean(0), gt.mean(0)
    cov = (gt - mu_g).T @ (est - mu_e) / len(est)
    U, S_, Vt = np.linalg.svd(cov)
    D_ = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R_al = U @ D_ @ Vt
    var = np.mean(np.sum((est - mu_e) ** 2, 1))
    s_al = float(np.trace(np.diag(S_) @ D_) / var)
    items = []
    for k in sorted(slam.map_db.keyframes):
        kf = slam.map_db.keyframes[k]
        fi = int(round(kf.timestamp / 0.05))
        if fi >= len(gt_xy):
            continue
        c_est = s_al * (R_al @ kf.cam_center) + (mu_g - s_al * R_al @ mu_e)
        c_gt = np.array([gt_xy[fi][0], gt_xy[fi][1], 0.0])
        items.append((k, fi, np.linalg.norm(c_est - c_gt) * 1e3))
    for a in range(0, len(items), 6):
        print("    " + "  ".join(f"kf{k}@{f}={e:.0f}" for k, f, e in
                                 items[a:a + 6]))

    # pose-graph structure at the (last) correction: cross-seam edges other
    # than the loop edge mean the injected step had stiff shortcuts and the
    # correction spread into the back leg instead of concentrating at the
    # severed seam
    pg = getattr(slam.global_optimizer, "_last_pose_graph_edges", None)
    if pg is not None:
        cross = [(a, b) for (a, b) in pg["edges"]
                 if (a in old_kfs) != (b in old_kfs)]
        print(f"  pose graph: {len(pg['edges'])} edges, "
              f"loop={pg['loop_edges']}, "
              f"corrected={len(pg['corrected'])} kfs, "
              f"cross-seam edges={cross}")

    # leg-coupling probe: how many landmarks are observed from BOTH the
    # out leg (ts < 25 s) and the back leg (ts > 31 s)? Decoupled legs
    # (the panels-world failure mode) show ~zero cross-leg landmarks — the
    # return leg mapped a duplicate layer instead of re-acquiring
    kf_ts = {k: kf.timestamp for k, kf in slam.map_db.keyframes.items()}
    n_cross = n_outonly = n_backonly = 0
    for lm in slam.map_db.landmarks.values():
        if lm.will_be_erased:
            continue
        ts_list = [kf_ts[k] for k in lm.observations if k in kf_ts]
        has_out = any(ts < 25.0 for ts in ts_list)
        has_back = any(ts > 31.0 for ts in ts_list)
        if has_out and has_back:
            n_cross += 1
        elif has_out:
            n_outonly += 1
        elif has_back:
            n_backonly += 1
    print(f"  leg coupling: {n_cross} cross-leg landmarks, "
          f"{n_outonly} out-only, {n_backonly} back-only")

    # scale drift probe: estimated / gt path length over 100-frame windows
    print("  scale ratio per 100-frame window:")
    for a in range(0, 1200, 100):
        m = (idx >= a) & (idx < a + 100)
        if m.sum() > 10:
            le = np.linalg.norm(np.diff(aligned[m], axis=0), axis=1).sum()
            lg = np.linalg.norm(np.diff(gt[m], axis=0), axis=1).sum()
            print(f"    [{a:4d}-{a+100:4d}) {le/max(lg,1e-9):6.3f}")


if __name__ == "__main__":
    main()
