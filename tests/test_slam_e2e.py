"""End-to-end monocular SLAM on a synthetic sequence: initialization, tracking,
mapping, and trajectory accuracy (ATE after similarity alignment)."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory, umeyama_align


@pytest.fixture(scope="module")
def slam_run(base_map_run):
    # session-shared base run (tests/conftest.py) — this module only reads it
    world, poses_gt, sys_, cfg_dict, path = base_map_run
    n = len(poses_gt)
    # finalized per-frame poses, ordered by timestamp
    by_ts = {round(ts / 0.05): pose for (ts, pose, _, _) in sys_.frame_poses}
    results = [by_ts.get(i) for i in range(n)]
    return sys_, poses_gt, results


def test_initializes_and_tracks(slam_run):
    sys_, poses_gt, results = slam_run
    tracked = [r is not None for r in results]
    # must initialize within the first frames and then track continuously
    first = tracked.index(True)
    assert first < 15, f"initialized too late: frame {first}"
    assert all(tracked[first:]), "tracking lost after initialization"


def test_map_grows(slam_run):
    sys_, _, _ = slam_run
    assert sys_.map_db.num_keyframes() >= 2
    assert sys_.map_db.num_landmarks() > 80


def test_trajectory_ate(slam_run):
    sys_, poses_gt, results = slam_run
    est_centers, gt_centers = [], []
    for T_gt, pose in zip(poses_gt, results):
        if pose is None:
            continue
        est_centers.append(-pose[:3, :3].T @ pose[:3, 3])
        gt_centers.append(-T_gt[:3, :3].T @ T_gt[:3, 3])
    est = np.array(est_centers)
    gt = np.array(gt_centers)
    assert len(est) >= 20
    aligned, _ = umeyama_align(est, gt)
    ate_rmse = np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1)))
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    rel = ate_rmse / max(traj_len, 1e-9)
    # 6.5%: the base fixture is only 40 frames / 0.66 m at 400x300, and the
    # renderer now emits uint8 (real camera input) — the +-0.5 intensity
    # quantization adds ~0.5% relative ATE at this tiny parallax (measured
    # 5.5% vs 4.x% with float images); the real accuracy certification is
    # bench.py's 1180-frame run asserting ATE < 100 mm over 15 m
    assert rel < 0.065, \
        f"ATE RMSE {ate_rmse:.4f} m over {traj_len:.2f} m ({rel:.1%})"


def test_trajectory_export(slam_run, tmp_path):
    sys_, _, _ = slam_run
    p = tmp_path / "frame_trajectory.txt"
    sys_.save_frame_trajectory(str(p), "TUM")
    lines = p.read_text().strip().splitlines()
    assert len(lines) >= 20
    assert len(lines[0].split()) == 8
    p2 = tmp_path / "kf_trajectory_kitti.txt"
    sys_.save_keyframe_trajectory(str(p2), "KITTI")
    assert len(p2.read_text().strip().splitlines()[0].split()) == 12
