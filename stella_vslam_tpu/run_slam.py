"""Dataset SLAM runner: the equivalent of the reference's example binaries
(run_image_slam / run_video_slam / run_euroc_slam in stella_vslam_examples,
driven by CI in .github/workflows/main.yml:131-216).

Usage:
  python -m stella_vslam_tpu.run_slam --config cfg.yaml --images dir/
  python -m stella_vslam_tpu.run_slam --config cfg.yaml --video seq.mp4
  python -m stella_vslam_tpu.run_slam --config cfg.yaml --euroc MH_01/mav0
Outputs frame_trajectory.txt / keyframe_trajectory.txt (TUM or KITTI format)
and track_times.txt, consumable by the reference's CI evaluation scripts.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def iter_image_dir(path, fps):
    import cv2

    exts = (".png", ".jpg", ".jpeg", ".pgm", ".bmp", ".tiff")
    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith(exts)
    )
    for i, f in enumerate(files):
        img = cv2.imread(os.path.join(path, f), cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        # timestamps from numeric filenames (ns or s) when possible
        stem = os.path.splitext(f)[0]
        try:
            ts = float(stem)
            if ts > 1e14:  # nanoseconds
                ts *= 1e-9
        except ValueError:
            ts = i / fps
        yield ts, img, None


def iter_video(path, fps):
    import cv2

    cap = cv2.VideoCapture(path)
    vfps = cap.get(cv2.CAP_PROP_FPS) or fps
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        yield i / vfps, frame, None
        i += 1
    cap.release()


def iter_euroc(mav0, stereo):
    """EuRoC ASL layout: mav0/cam{0,1}/data.csv + data/<ts>.png."""
    import cv2

    def read_csv(cam):
        rows = []
        with open(os.path.join(mav0, cam, "data.csv")) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                ts, name = line.strip().split(",")[:2]
                rows.append((int(ts), name))
        return rows

    left = read_csv("cam0")
    right = dict(read_csv("cam1")) if stereo else {}
    for ts, name in left:
        img = cv2.imread(os.path.join(mav0, "cam0", "data", name),
                         cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        img_r = None
        if stereo and ts in right:
            img_r = cv2.imread(os.path.join(mav0, "cam1", "data", right[ts]),
                               cv2.IMREAD_GRAYSCALE)
        yield ts * 1e-9, img, img_r


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="YAML config (reference-compatible)")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--images", help="directory of image files")
    src.add_argument("--video", help="video file")
    src.add_argument("--euroc", help="EuRoC mav0 directory")
    ap.add_argument("--vocab", default=None, help="vocabulary file (optional)")
    ap.add_argument("--depth-dir", default=None,
                    help="directory of aligned depth images (RGBD)")
    ap.add_argument("--depth-scale", type=float, default=5000.0,
                    help="depth png scale (TUM: 5000/m)")
    ap.add_argument("--map-db-in", default=None, help="prebuilt map to load")
    ap.add_argument("--map-db-out", default=None)
    ap.add_argument("--disable-mapping", action="store_true",
                    help="localization mode on a prebuilt map")
    ap.add_argument("--temporal-mapping", action="store_true",
                    help="keep pre-loaded keyframes fixed; new ones ephemeral")
    ap.add_argument("--eval-log-dir", default=None)
    ap.add_argument("--traj-format", default="TUM", choices=["TUM", "KITTI"])
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--frame-skip", type=int, default=1)
    ap.add_argument("--inline-mapping", action="store_true")
    args = ap.parse_args(argv)

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System

    cfg = Config.from_yaml_file(args.config)
    slam = System(cfg, vocab_path=args.vocab, inline_mapping=args.inline_mapping)
    if args.map_db_in:
        slam.load_map_database(args.map_db_in)
        slam.startup(need_initialize=False)
    else:
        slam.startup()
    if args.disable_mapping:
        slam.disable_mapping_module()
    elif args.temporal_mapping:
        slam.enable_temporal_mapping()

    setup = cfg.get("Camera", "setup", "monocular")
    fps = float(cfg.get("Camera", "fps", 30.0))
    if args.images:
        it = iter_image_dir(args.images, fps)
    elif args.video:
        it = iter_video(args.video, fps)
    else:
        it = iter_euroc(args.euroc, setup == "stereo")

    n = 0
    depth_files = None
    if args.depth_dir:
        depth_files = sorted(os.listdir(args.depth_dir))
    for i, (ts, img, img_r) in enumerate(it):
        if i % args.frame_skip:
            continue
        if setup == "stereo" and img_r is not None:
            slam.feed_stereo_frame(img, img_r, ts)
        elif setup == "RGBD" and depth_files is not None:
            import cv2

            d = cv2.imread(os.path.join(args.depth_dir, depth_files[min(i, len(depth_files) - 1)]),
                           cv2.IMREAD_UNCHANGED)
            slam.feed_RGBD_frame(img, d.astype(np.float32) / args.depth_scale, ts)
        else:
            slam.feed_monocular_frame(img, ts)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    slam.shutdown()

    tracked = sum(1 for (_, p, _, _) in slam.frame_poses if p is not None)
    med = float(np.median(slam.track_times) * 1000) if slam.track_times else 0.0
    print(f"fed {n} frames, tracked {tracked}, keyframes "
          f"{slam.map_db.num_keyframes()}, landmarks {slam.map_db.num_landmarks()}, "
          f"median track time {med:.1f} ms")
    if args.eval_log_dir:
        os.makedirs(args.eval_log_dir, exist_ok=True)
        slam.save_frame_trajectory(
            os.path.join(args.eval_log_dir, "frame_trajectory.txt"), args.traj_format)
        slam.save_keyframe_trajectory(
            os.path.join(args.eval_log_dir, "keyframe_trajectory.txt"), args.traj_format)
        slam.save_track_times(os.path.join(args.eval_log_dir, "track_times.txt"))
    if args.map_db_out:
        slam.save_map_database(args.map_db_out)
    return 0 if tracked > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
