"""Measure threaded-pipeline ATE variance (same workload as
tests/test_threaded_pipeline.py). Prints one line per run:
ate_rel, keyframes created/kept, landmarks, frames lost."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SVT_JAX_CACHE"] = "0"
os.environ["SVT_WARMUP"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
jax.config.update("jax_default_matmul_precision", "float32")
sys.path.insert(0, ".")
from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory, umeyama_align


def run_once():
    world = PlaneWorld()
    n = 60
    poses_gt = lateral_trajectory(n)
    cfg = Config.from_dict(
        {
            "Camera": world.camera_yaml(),
            "Feature": {"num_levels": 4},
            "Preprocessing": {"min_size": 400},
            "Initializer": {"use_fixed_seed": True},
        }
    )
    sys_ = System(cfg, inline_mapping=False)
    sys_.startup()
    for i, T in enumerate(poses_gt):
        img = world.render(T)
        sys_.feed_monocular_frame(img, i * 0.05)
    sys_.shutdown()
    by_ts = {round(ts / 0.05): pose for (ts, pose, _, _) in sys_.frame_poses}
    results = [by_ts.get(i) for i in range(n)]
    est, gt = [], []
    for T_gt, pose in zip(poses_gt, results):
        if pose is None:
            continue
        est.append(-pose[:3, :3].T @ pose[:3, 3])
        gt.append(-T_gt[:3, :3].T @ T_gt[:3, 3])
    est, gt = np.array(est), np.array(gt)
    aligned, _ = umeyama_align(est, gt)
    ate_rmse = np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1)))
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    rel = ate_rmse / max(traj_len, 1e-9)
    lost = sum(1 for r in results if r is None)
    print(
        f"ate_rel={rel:.4f} tracked={len(est)}/{n} lost={lost} "
        f"kf={sys_.map_db.num_keyframes()} lms={sys_.map_db.num_landmarks()} "
        f"ba_events={len(sys_.mapper.local_ba_ms)}",
        flush=True,
    )
    return rel


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    vals = [run_once() for _ in range(reps)]
    print(f"median={np.median(vals):.4f} max={max(vals):.4f}")
