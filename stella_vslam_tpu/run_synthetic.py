"""Synthetic end-to-end SLAM run: render a textured-plane sequence, track it,
report FPS + ATE. The quickest way to drive the full pipeline on real
hardware (`python -m stella_vslam_tpu.run_synthetic`).

Mirrors the role of the reference's example binaries (run_image_slam etc. in
stella_vslam_examples; .github/workflows/main.yml:131-216 drives them in CI),
with the dataset replaced by the in-repo synthetic renderer.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--width", type=int, default=752)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--step", type=float, default=0.012, help="m per frame")
    ap.add_argument("--fps", type=float, default=20.0)
    ap.add_argument("--inline-mapping", action="store_true",
                    help="run mapping synchronously (deterministic)")
    ap.add_argument("--eval-log-dir", default=None,
                    help="write frame_trajectory.txt + track_times.txt here")
    ap.add_argument("--map-db-out", default=None)
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    args = ap.parse_args(argv)

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System
    from stella_vslam_tpu.util.synthetic import (
        PlaneWorld, lateral_trajectory, umeyama_align,
    )

    world = PlaneWorld(width=args.width, height=args.height,
                       fx=0.61 * args.width, fy=0.61 * args.width,
                       depth=4.0, tex_size=3072, meters_per_px=0.008)
    poses = lateral_trajectory(args.frames, step=args.step, yaw_rate=0.0015)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": args.levels},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg, inline_mapping=args.inline_mapping)
    slam.startup()
    imgs = [world.render(T) for T in poses]
    t_wall = time.time()
    for i, img in enumerate(imgs):
        slam.feed_monocular_frame(img, i / args.fps)
    slam.shutdown()
    t_wall = time.time() - t_wall

    est, gt = [], []
    for (ts, pose, _, _), T_gt in zip(slam.frame_poses, poses):
        if pose is None:
            continue
        est.append(-pose[:3, :3].T @ pose[:3, 3])
        gt.append(-T_gt[:3, :3].T @ T_gt[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    ate = float("nan")
    if len(est) >= 10:
        aligned, _ = umeyama_align(est, gt)
        ate = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))
    steady = np.asarray(slam.track_times[min(30, len(slam.track_times) // 2):])
    med_ms = float(np.median(steady) * 1000)
    out = {
        "frames": args.frames,
        "tracked": int(len(est)),
        "keyframes": slam.map_db.num_keyframes(),
        "landmarks": slam.map_db.num_landmarks(),
        "ate_rmse_m": ate,
        "median_track_ms": med_ms,
        "fps": 1000.0 / med_ms if med_ms > 0 else 0.0,
        "wall_s": t_wall,
    }
    if args.eval_log_dir:
        import os

        os.makedirs(args.eval_log_dir, exist_ok=True)
        slam.save_frame_trajectory(
            os.path.join(args.eval_log_dir, "frame_trajectory.txt"), "TUM")
        slam.save_track_times(
            os.path.join(args.eval_log_dir, "track_times.txt"))
    if args.map_db_out:
        slam.save_map_database(args.map_db_out)
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")
    return 0 if (len(est) >= args.frames // 2) else 1


if __name__ == "__main__":
    sys.exit(main())
