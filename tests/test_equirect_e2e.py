"""End-to-end equirectangular (360) monocular SLAM on a ray-cast box room —
the reference's headline equirectangular CI runs
(.github/workflows/main.yml:178-216), bearing-vector initializer path."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from stella_vslam_tpu.util.synthetic import BoxWorld, umeyama_align


@pytest.mark.slow
def test_equirect_slam_e2e():
    world = BoxWorld(width=512, height=256, half=4.0)
    n = 32
    poses_gt = []
    for i in range(n):
        T = np.eye(4)
        # translate along x with a slight yaw, staying inside the box
        yaw = 0.004 * i
        c, s = np.cos(yaw), np.sin(yaw)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = T[:3, :3] @ -np.array([i * 0.05, 0.002 * i, 0.0])
        poses_gt.append(T)

    cfg = Config.from_dict(
        {
            "Camera": world.camera_yaml(),
            "Feature": {"num_levels": 4},
            "Preprocessing": {"min_size": 300},
            "Initializer": {"use_fixed_seed": True},
        }
    )
    slam = System(cfg, inline_mapping=True)
    slam.startup()
    for i, T in enumerate(poses_gt):
        slam.feed_monocular_frame(world.render(T), i * 0.05)
    slam.shutdown()

    est, gt = [], []
    for (ts, pose, _, _), T_gt in zip(slam.frame_poses, poses_gt):
        if pose is None:
            continue
        est.append(-pose[:3, :3].T @ pose[:3, 3])
        gt.append(-T_gt[:3, :3].T @ T_gt[:3, 3])
    est, gt = np.asarray(est), np.asarray(gt)
    assert len(est) >= 20, f"only {len(est)}/{n} frames tracked"
    aligned, _ = umeyama_align(est, gt)
    ate_rmse = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert ate_rmse / max(traj_len, 1e-9) < 0.05, \
        f"ATE {ate_rmse:.3f} m over {traj_len:.2f} m"
    assert slam.map_db.num_keyframes() >= 2
    assert slam.map_db.num_landmarks() > 80
