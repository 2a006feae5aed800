"""Short perf-iteration bench: the first 420 frames of bench.py's out-leg
(same world/geometry/config), printing mean/median frame time and the
PERF pipeline budget. For tuning keyframe-event cost without paying the
full 1180-frame certification run. Not a certification — bench.py is.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    n_frames = int(os.environ.get("MB_FRAMES", "420"))
    from synthetic_world import PlaneWorld

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System
    from stella_vslam_tpu.util.drift import pose_at_xy
    from stella_vslam_tpu.util.perf import PERF

    world = PlaneWorld(width=752, height=480, fx=458.0, fy=458.0, depth=4.0,
                       tex_size=4096, meters_per_px=0.008)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": 8},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg)
    slam.startup()
    gt_xy = [(i * 0.015, 0.0) for i in range(n_frames)]
    imgs = None
    frame_times = []
    t = 0.0
    for (x, y) in gt_xy:
        img = world.render(pose_at_xy(x, y))
        t0 = time.time()
        slam.feed_monocular_frame(img, t)
        frame_times.append(time.time() - t0)
        t += 0.05
    slam.shutdown()
    steady = np.asarray(frame_times[30:])
    results = slam.frame_poses
    tracked = sum(1 for (_, p, _, _) in results if p is not None)
    ba_ms = slam.mapper.local_ba_ms
    print(f"frames {n_frames} tracked {tracked} "
          f"median {np.median(steady)*1e3:.1f} ms mean {np.mean(steady)*1e3:.1f} ms "
          f"({1.0/np.mean(steady):.1f} FPS) kfs={slam.map_db.num_keyframes()} "
          f"created={slam.mapper.num_processed} "
          f"localBA {np.mean(ba_ms):.0f} ms/kf (n={len(ba_ms)})")
    print("---- pipeline budget ----")
    print(PERF.report(min_total_ms=5.0))


if __name__ == "__main__":
    main()
