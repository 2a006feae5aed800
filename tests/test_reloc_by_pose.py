"""relocalize_by_pose(_2d) honors the supplied pose: the tracker is seated
AT the hint and re-acquires the map by projection — BoW relocalization is
disabled, so only the pose-hint path can recover (reference system.cc:604-624,
tracking_module.cc:26-27 + 385-399, map_database.cc:132-164)."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory


@pytest.fixture(scope="module")
def lost_system(base_map_run):
    # session-shared base run (tests/conftest.py): load its saved map into a
    # System whose BoW auto-relocalization is OFF, so only the pose-hint
    # path can recover. Loading (vs re-running SLAM) also matches the API's
    # primary use: re-seating a tracker on a prebuilt map.
    world, poses_gt, _slam, cfg_dict, path = base_map_run
    cfg_dict = {k: (dict(v) if isinstance(v, dict) else v)
                for k, v in cfg_dict.items()}
    cfg_dict["Tracking"] = {"enable_auto_relocalization": False,
                            "reloc_distance_threshold": 0.5}
    sys_ = System(Config.from_dict(cfg_dict), inline_mapping=True)
    sys_.load_map_database(path, "msgpack")
    sys_.startup(need_initialize=False)
    return sys_, world, poses_gt


def _force_lost(sys_):
    tr = sys_.tracker
    tr.finalize_pending()
    tr.state = "Lost"
    tr.twist = None
    tr._dev_pose = None
    tr._dev_pose_prev = None
    tr._last_assoc_pos = None
    tr._last_assoc_valid = None
    tr._last_assoc_id = None


def _gt_wc_scaled(sys_, poses_gt, idx):
    """GT camera-to-world pose mapped into the map's gauge scale (estimated
    from keyframe span vs GT span)."""
    kf_x = [kf.cam_center[0] for kf in sys_.map_db.keyframes.values()
            if not kf.will_be_erased]
    gt_centers = np.array([-T[:3, :3].T @ T[:3, 3] for T in poses_gt])
    span_gt = gt_centers[:, 0].max() - gt_centers[:, 0].min()
    scale = (max(kf_x) - min(kf_x)) / span_gt
    T = poses_gt[idx].copy()
    T[:3, 3] *= scale  # pose_cw translation scales with the map
    return np.linalg.inv(T), scale


def test_pose_hint_recovers_tracking(lost_system):
    sys_, world, poses_gt = lost_system
    _force_lost(sys_)
    idx = 20
    T_wc, scale = _gt_wc_scaled(sys_, poses_gt, idx)
    # perturb the hint: a few cm + the caller's odometric error stand-in
    T_wc = T_wc.copy()
    T_wc[:3, 3] += np.array([0.03, -0.02, 0.04]) * scale
    assert sys_.relocalize_by_pose(T_wc), "no keyframes near the hint"
    pose = sys_.feed_monocular_frame(world.render(poses_gt[idx]), 99.0)
    sys_.tracker.finalize_pending()
    assert sys_.tracker.state == "Tracking", "pose hint did not recover"
    assert pose is not None
    # the recovered pose must be near the hinted location (map units)
    c_est = -pose[:3, :3].T @ pose[:3, 3]
    c_gt = np.linalg.inv(T_wc)[:3, 3]
    c_gt = -np.linalg.inv(T_wc)[:3, :3].T @ c_gt
    assert np.linalg.norm(c_est - c_gt) < 0.2 * scale + 0.05


def test_pose_hint_far_from_map_fails(lost_system):
    sys_, world, poses_gt = lost_system
    _force_lost(sys_)
    T_wc = np.eye(4)
    T_wc[:3, 3] = [50.0, 50.0, 50.0]  # nowhere near any keyframe
    assert not sys_.relocalize_by_pose(T_wc)
    # with auto-reloc disabled the tracker must STAY Lost
    pose = sys_.feed_monocular_frame(world.render(poses_gt[5]), 100.0)
    sys_.tracker.finalize_pending()
    assert sys_.tracker.state == "Lost"
    assert pose is None


def test_pose_hint_2d_recovers(lost_system):
    sys_, world, poses_gt = lost_system
    _force_lost(sys_)
    idx = 28
    T_wc, scale = _gt_wc_scaled(sys_, poses_gt, idx)
    T_wc = T_wc.copy()
    T_wc[:3, 3] += np.array([0.02, 0.03, -0.03]) * scale
    assert sys_.relocalize_by_pose_2d(T_wc, np.array([0.0, 1.0, 0.0]))
    sys_.feed_monocular_frame(world.render(poses_gt[idx]), 101.0)
    sys_.tracker.finalize_pending()
    assert sys_.tracker.state == "Tracking"
