"""Stereo matching + stereo/RGBD SLAM tests on the synthetic plane world."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory

BASELINE = 0.12


def stereo_cfg(world):
    cam = world.camera_yaml()
    cam["setup"] = "stereo"
    cam["focal_x_baseline"] = world.fx * BASELINE
    return Config.from_dict(
        {
            "Camera": cam,
            "Feature": {"num_levels": 4},
            "Preprocessing": {"min_size": 400},
            "Initializer": {"use_fixed_seed": True},
        }
    )


def render_pair(world, T):
    """Left image at T, right image at T shifted by the baseline."""
    T_r = T.copy()
    # right camera: x_right_cam = x_left - b => t_r = t + R_row? camera-from-
    # world: pose_cw_right = T_b * pose_cw_left with T_b = translate(-b, 0, 0)
    Tb = np.eye(4)
    Tb[0, 3] = -BASELINE
    T_r = Tb @ T
    return world.render(T), world.render(T_r)


def test_stereo_depths_accurate():
    world = PlaneWorld()
    T = np.eye(4)
    imgs = render_pair(world, T)
    slam = System(stereo_cfg(world), inline_mapping=True)
    slam.startup()
    slam.feed_stereo_frame(imgs[0], imgs[1], 0.0)
    slam.tracker.finalize_pending()
    # first frame creates the instant stereo map
    assert slam.map_db.num_keyframes() == 1
    kf = next(iter(slam.map_db.keyframes.values()))
    d = kf.h_depths
    good = d[d > 0]
    assert len(good) > 80, f"only {len(good)} stereo depths"
    # plane at z = world.depth -> depths close to 4.0
    frac_close = (np.abs(good - world.depth) < 0.25).mean()
    assert frac_close > 0.75, f"depth accuracy {frac_close:.2f}"
    assert abs(np.median(good) - world.depth) < 0.05
    slam.shutdown()


@pytest.mark.slow
def test_stereo_slam_tracks_metric_scale():
    world = PlaneWorld()
    n = 25
    poses = lateral_trajectory(n, step=0.03)
    slam = System(stereo_cfg(world), inline_mapping=True)
    slam.startup()
    for i, T in enumerate(poses):
        l, r = render_pair(world, T)
        slam.feed_stereo_frame(l, r, i * 0.05)
    slam.shutdown()
    by_ts = {round(ts / 0.05): pose for (ts, pose, _, _) in slam.frame_poses}
    tracked = [i for i in range(n) if by_ts.get(i) is not None]
    assert len(tracked) >= n - 2, f"tracked {len(tracked)}/{n}"
    # metric scale: estimated translation between first/last tracked frames
    # must match ground truth WITHOUT alignment (stereo gives true scale)
    i0, i1 = tracked[0], tracked[-1]
    c = lambda T: -T[:3, :3].T @ T[:3, 3]
    est = np.linalg.norm(c(by_ts[i1]) - c(by_ts[i0]))
    gt = np.linalg.norm(c(poses[i1]) - c(poses[i0]))
    assert abs(est - gt) / gt < 0.08, f"scale error: est {est:.3f} vs gt {gt:.3f}"


@pytest.mark.slow
def test_rgbd_slam_instant_map():
    world = PlaneWorld()
    cam = world.camera_yaml()
    cam["setup"] = "rgbd"
    cam["focal_x_baseline"] = world.fx * BASELINE
    cfg = Config.from_dict(
        {
            "Camera": cam,
            "Feature": {"num_levels": 4},
            "Preprocessing": {"min_size": 400},
        }
    )
    slam = System(cfg, inline_mapping=True)
    slam.startup()
    depth_map = np.full((world.H, world.W), world.depth, np.float32)
    poses = lateral_trajectory(10, step=0.03)
    for i, T in enumerate(poses):
        slam.feed_RGBD_frame(world.render(T), depth_map, i * 0.05)
    slam.shutdown()
    assert slam.map_db.num_keyframes() >= 1
    assert slam.map_db.num_landmarks() > 80
    tracked = sum(1 for (_, p, _, _) in slam.frame_poses if p is not None)
    assert tracked >= 8


def test_stereo_rectifier_identity_and_distortion():
    """StereoRectifier with identity R and zero distortion is a no-op away
    from borders; with distortion it must move pixels (reference
    util/stereo_rectifier.cc remap tables)."""
    import numpy as np
    from stella_vslam_tpu.camera.base import camera_from_yaml
    from stella_vslam_tpu.util.stereo_rectifier import StereoRectifier

    cam = camera_from_yaml({
        "model": "perspective", "setup": "stereo",
        "fx": 200.0, "fy": 200.0, "cx": 160.0, "cy": 120.0,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "k3": 0.0,
        "cols": 320, "rows": 240, "fps": 30.0,
        "focal_x_baseline": 20.0,
    })
    K = [200.0, 0.0, 160.0, 0.0, 200.0, 120.0, 0.0, 0.0, 1.0]
    R = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    params_id = {
        "K_left": K, "D_left": [0.0] * 5, "R_left": R,
        "K_right": K, "D_right": [0.0] * 5, "R_right": R,
    }
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (240, 320), np.uint8)
    rect = StereoRectifier(cam, params_id)
    out_l, out_r = rect.rectify(img, img)
    inner = (slice(40, 200), slice(40, 280))
    assert np.array_equal(out_l[inner], img[inner])
    assert np.array_equal(out_r[inner], img[inner])

    params_dist = dict(params_id)
    params_dist["D_left"] = [-0.3, 0.1, 0.0, 0.0, 0.0]
    rect2 = StereoRectifier(cam, params_dist)
    out_l2, _ = rect2.rectify(img, img)
    assert not np.array_equal(out_l2[inner], img[inner])


# ---------------------------------------------------------------------------
def _distortion_maps(K, D, R, K_rect, size):
    """Per-distorted-pixel sampling coords into the IDEAL (rectified) image:
    synthesizes what a physical camera with intrinsics K, distortion D and
    mounting rotation R would capture of a scene rendered by the ideal
    pinhole K_rect. Exactly inverts cv2.initUndistortRectifyMap's mapping,
    so the wired StereoRectifier must recover the ideal image."""
    import cv2

    W, H = size
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    pts = np.stack([uu, vv], -1).reshape(-1, 1, 2)
    und = cv2.undistortPoints(pts, np.asarray(K), np.asarray(D),
                              R=np.asarray(R), P=np.asarray(K_rect))
    mapx = und[:, 0, 0].reshape(H, W).astype(np.float32)
    mapy = und[:, 0, 1].reshape(H, W).astype(np.float32)
    return mapx, mapy


def _run_distorted_stereo(with_rectifier: bool):
    """Stereo SLAM over pairs rendered through a known distortion + per-eye
    mounting rotation (reference examples rectify every EuRoC pair before
    feed_stereo_frame). Returns (n_tracked, scale_err)."""
    import cv2

    world = PlaneWorld()
    K = np.array([[world.fx, 0, world.cx], [0, world.fy, world.cy],
                  [0, 0, 1.0]])
    D = np.array([-0.28, 0.07, 0.0, 0.0, 0.0])
    # small opposite mounting rotations about y (vertical) per eye
    def rot_y(deg):
        a = np.radians(deg)
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                         [-np.sin(a), 0, np.cos(a)]])
    R_l, R_r = rot_y(0.8), rot_y(-0.8)
    maps_l = _distortion_maps(K, D, R_l, K, (world.W, world.H))
    maps_r = _distortion_maps(K, D, R_r, K, (world.W, world.H))

    cfg_dict = {
        "Camera": dict(world.camera_yaml(), setup="stereo",
                       focal_x_baseline=world.fx * BASELINE),
        "Feature": {"num_levels": 4},
        "Preprocessing": {"min_size": 400},
        "Initializer": {"use_fixed_seed": True},
    }
    if with_rectifier:
        cfg_dict["StereoRectifier"] = {
            "model": "perspective",
            "K_left": K.reshape(-1).tolist(), "D_left": D.tolist(),
            "R_left": R_l.reshape(-1).tolist(),
            "K_right": K.reshape(-1).tolist(), "D_right": D.tolist(),
            "R_right": R_r.reshape(-1).tolist(),
        }
    n = 25
    poses = lateral_trajectory(n, step=0.03)
    slam = System(Config.from_dict(cfg_dict), inline_mapping=True)
    assert (slam.stereo_rectifier is not None) == with_rectifier
    slam.startup()
    for i, T in enumerate(poses):
        l_ideal, r_ideal = render_pair(world, T)
        l_raw = cv2.remap(l_ideal, *maps_l, cv2.INTER_LINEAR)
        r_raw = cv2.remap(r_ideal, *maps_r, cv2.INTER_LINEAR)
        slam.feed_stereo_frame(l_raw, r_raw, i * 0.05)
    slam.shutdown()
    by_ts = {round(ts / 0.05): pose for (ts, pose, _, _) in slam.frame_poses}
    tracked = [i for i in range(n) if by_ts.get(i) is not None]
    if len(tracked) < 2:
        return len(tracked), float("inf")
    i0, i1 = tracked[0], tracked[-1]
    c = lambda T: -T[:3, :3].T @ T[:3, 3]
    est = np.linalg.norm(c(by_ts[i1]) - c(by_ts[i0]))
    gt = np.linalg.norm(c(poses[i1]) - c(poses[i0]))
    return len(tracked), abs(est - gt) / gt


@pytest.mark.slow
def test_stereo_rectifier_wired_e2e():
    """Distorted+rotated raw input with the StereoRectifier section
    configured tracks at metric scale; the SAME raw input WITHOUT
    rectification must fail the same assertion (the row-epipolar stereo
    matcher sees unaligned rows / wrong disparities), proving the wiring
    is load-bearing."""
    n_rect, err_rect = _run_distorted_stereo(with_rectifier=True)
    assert n_rect >= 23, f"rectified run tracked only {n_rect}/25"
    assert err_rect < 0.08, f"rectified metric scale error {err_rect:.1%}"
    n_raw, err_raw = _run_distorted_stereo(with_rectifier=False)
    assert not (n_raw >= 23 and err_raw < 0.08), (
        f"unrectified control unexpectedly passed (tracked {n_raw}, "
        f"scale err {err_raw:.1%}) — the test has no teeth")
