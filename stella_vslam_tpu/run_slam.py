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


def make_depth_lookup(depth_dir: str, tolerance_s: float = 0.02):
    """Depth-image association for RGBD feeds.

    TUM RGB-D sequences name depth PNGs by capture timestamp
    (`<seconds>.png`, reference example/tum_rgbd layout) and the RGB/depth
    streams are NOT frame-aligned — after any dropped image, index pairing
    silently mis-pairs every subsequent frame. When every filename parses
    as a float timestamp, pair each RGB frame with the nearest depth
    timestamp within `tolerance_s` (none -> frame skipped). Otherwise fall
    back to index pairing (plain numbered dumps).

    Returns lookup(ts, index) -> filename | None."""
    files = sorted(os.listdir(depth_dir))
    stamps = []
    try:
        stamps = [float(os.path.splitext(f)[0]) for f in files]
    except ValueError:
        stamps = None
    if not files:
        return lambda ts, i: None
    if stamps is None:
        return lambda ts, i: files[min(i, len(files) - 1)]
    order = np.argsort(stamps)
    sorted_stamps = np.asarray(stamps)[order]
    sorted_files = [files[j] for j in order]

    def lookup(ts, _i):
        j = int(np.searchsorted(sorted_stamps, ts))
        best, best_dt = None, tolerance_s
        for k in (j - 1, j):
            if 0 <= k < len(sorted_stamps):
                dt = abs(float(sorted_stamps[k]) - ts)
                if dt <= best_dt:
                    best, best_dt = sorted_files[k], dt
        return best

    return lookup


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
    if args.depth_dir and "depthmap_factor" not in cfg.node.get(
            "Preprocessing", {}):
        # CLI fallback for configs without Preprocessing.depthmap_factor
        # (the reference reads the YAML key, system.cc:86-92; --depth-scale
        # keeps old invocations working)
        cfg.node.setdefault("Preprocessing", {})["depthmap_factor"] = \
            args.depth_scale
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
    depth_lookup = None
    n_depth_dropped = 0
    if args.depth_dir:
        depth_lookup = make_depth_lookup(args.depth_dir)
    for i, (ts, img, img_r) in enumerate(it):
        if i % args.frame_skip:
            continue
        if setup == "stereo" and img_r is not None:
            slam.feed_stereo_frame(img, img_r, ts)
        elif setup == "RGBD" and depth_lookup is not None:
            import cv2

            fname = depth_lookup(ts, i)
            if fname is None:
                # no depth within tolerance (dropped depth frame in a TUM
                # RGB-D sequence): skip the frame rather than silently
                # mis-pairing by index
                n_depth_dropped += 1
                continue
            d = cv2.imread(os.path.join(args.depth_dir, fname),
                           cv2.IMREAD_UNCHANGED)
            # RAW units: System divides by Preprocessing.depthmap_factor
            # (reference convert_to_true_depth, image_converter.cc:41-43)
            slam.feed_RGBD_frame(img, d.astype(np.float32), ts)
        else:
            slam.feed_monocular_frame(img, ts)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    slam.shutdown()

    tracked = sum(1 for (_, p, _, _) in slam.frame_poses if p is not None)
    med = float(np.median(slam.track_times) * 1000) if slam.track_times else 0.0
    if n_depth_dropped:
        print(f"skipped {n_depth_dropped} frames with no depth image "
              f"within tolerance")
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
