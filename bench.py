"""Headline benchmark: monocular tracking FPS on a synthetic EuRoC-scale
sequence, run end-to-end (extraction + tracking + mapping) on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of >60 FPS monocular tracking on one v5e chip
(BASELINE.md); vs_baseline = fps / 60.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "tests")
    from synthetic_world import PlaneWorld, lateral_trajectory

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System

    # EuRoC-like geometry: 752x480 @ 8-level pyramid
    world = PlaneWorld(width=752, height=480, fx=458.0, fy=458.0, depth=4.0,
                       tex_size=3072, meters_per_px=0.008)
    n_frames = 120
    poses = lateral_trajectory(n_frames, step=0.012, yaw_rate=0.0015)
    cfg = Config.from_dict(
        {
            "Camera": world.camera_yaml(),
            "Feature": {"num_levels": 8},
            "Initializer": {"use_fixed_seed": True},
        }
    )
    import os
    slam = System(cfg, inline_mapping=os.environ.get("BENCH_INLINE", "0") == "1")
    slam.startup()

    frame_times = []
    imgs = [world.render(T) for T in poses]
    for i, img in enumerate(imgs):
        t0 = time.time()
        slam.feed_monocular_frame(img, i * 0.05)
        frame_times.append(time.time() - t0)
    slam.shutdown()

    # steady-state sustained throughput: drop compile-warmup frames (first
    # 30), then use the MEAN so keyframe-event work is amortized honestly
    # (median would hide it)
    steady = np.asarray(frame_times[30:])
    med = float(np.median(steady))
    mean = float(np.mean(steady))
    fps = 1.0 / mean if mean > 0 else 0.0
    results = slam.frame_poses
    tracked = sum(1 for (_, p, _, _) in results if p is not None)

    # the FPS number is only meaningful if the run actually tracked: assert
    # no silent mid-run loss (everything after init must track) and a sane
    # trajectory (Umeyama-aligned ATE against the rendered ground truth)
    first_tracked = next(
        i for i, (_, p, _, _) in enumerate(results) if p is not None)
    tracked_after_init = sum(
        1 for (_, p, _, _) in results[first_tracked:] if p is not None)
    # <=2 transient losses tolerated (async pipeline reloc recovers within a
    # frame); anything more is a silent mid-run tracking failure
    assert tracked_after_init >= n_frames - first_tracked - 2, (
        f"lost frames mid-run: {tracked_after_init}/{n_frames - first_tracked}"
        " tracked after init")
    from stella_vslam_tpu.util.synthetic import umeyama_align

    est, gt = [], []
    for (_, pose, _, fid) in results:
        if pose is None:
            continue
        R, t = pose[:3, :3], pose[:3, 3]
        est.append(-R.T @ t)
        Tg = poses[fid]
        gt.append(-Tg[:3, :3].T @ Tg[:3, 3])
    aligned, _ = umeyama_align(np.asarray(est), np.asarray(gt))
    ate = float(np.sqrt(np.mean(np.sum((aligned - np.asarray(gt)) ** 2, 1))))
    assert ate < 0.05, f"ATE RMSE {ate:.4f} m exceeds 0.05 m bound"
    if os.environ.get("BENCH_DUMP"):
        slow = [(i, round(t * 1e3, 1)) for i, t in enumerate(frame_times)
                if t > 0.012 and i >= 30]
        sys.stderr.write(f"slow frames (>12 ms): {slow}\n")
    sys.stderr.write(
        f"tracked {tracked}/{n_frames} frames (all {tracked_after_init} after "
        f"init), ATE {ate*1000:.1f} mm, kfs={slam.map_db.num_keyframes()}, "
        f"lms={slam.map_db.num_landmarks()}, median {med*1000:.1f} ms, "
        f"mean {np.mean(steady)*1000:.1f} ms\n"
    )
    print(json.dumps({
        "metric": "mono tracking throughput (synthetic 752x480, end-to-end)",
        "value": round(fps, 2),
        "unit": "FPS",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
