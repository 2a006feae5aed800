"""ArUco marker detection + world-pose initialization test."""
import cv2
import numpy as np

from stella_vslam_tpu.camera import base as cam_base
from stella_vslam_tpu.marker.marker import Marker, MarkerInitializer
from stella_vslam_tpu.marker.marker_detector import MarkerDetector
from stella_vslam_tpu.marker.marker_model import MarkerModel


def make_camera():
    return cam_base.Camera(
        "t", cam_base.CameraModel.PERSPECTIVE, cam_base.Setup.MONOCULAR,
        cam_base.make_params(fx=400, fy=400, cx=320, cy=240, width=640, height=480),
        width=640, height=480,
    )


def render_marker(world_T_cm, K, width_m=0.2, img_size=(480, 640)):
    """Render a 6x6 ArUco marker at camera-from-marker pose via homography."""
    dic = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_6X6_250)
    mk = cv2.aruco.generateImageMarker(dic, 7, 200)
    mk = cv2.copyMakeBorder(mk, 40, 40, 40, 40, cv2.BORDER_CONSTANT, value=255)
    # marker image coords -> marker plane meters (z=0)
    h = width_m / 2
    src = np.array([[40, 40], [240, 40], [240, 240], [40, 240]], np.float32)
    dst_3d = np.array([[-h, h, 0], [h, h, 0], [h, -h, 0], [-h, -h, 0]])
    R, t = world_T_cm[:3, :3], world_T_cm[:3, 3]
    cam_pts = dst_3d @ R.T + t
    uv = (cam_pts @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    H, _ = cv2.findHomography(src, uv.astype(np.float32))
    out = cv2.warpPerspective(
        mk, H, (img_size[1], img_size[0]),
        flags=cv2.INTER_LINEAR, borderValue=128,
    )
    return out


def test_marker_detection_and_pose():
    camera = make_camera()
    model = MarkerModel(width=0.2)
    det = MarkerDetector(camera, model)
    K = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], float)
    T = np.eye(4)
    T[:3, :3] = np.diag([1.0, -1.0, -1.0])  # marker faces the camera
    T[:3, 3] = [0.05, -0.02, 1.5]
    img = render_marker(T, K)
    out = det.detect(img)
    assert 7 in out, f"marker not detected: {list(out)}"
    m = out[7]
    np.testing.assert_allclose(m.trans_cm, T[:3, 3], atol=0.02)
    # IPPE square poses carry a small planar-flip ambiguity at this range
    np.testing.assert_allclose(m.rot_cm, T[:3, :3], atol=0.25)


def test_marker_initializer_world_pose():
    camera = make_camera()
    model = MarkerModel(width=0.2)
    det = MarkerDetector(camera, model)
    K = np.array([[400, 0, 320], [0, 400, 240], [0, 0, 1]], float)

    class KF:
        def __init__(self, pose_cw):
            self.pose_cw = pose_cw
            self.will_be_erased = False

        @property
        def rot_cw(self):
            return self.pose_cw[:3, :3]

        @property
        def trans_cw(self):
            return self.pose_cw[:3, 3]

    class DB:
        keyframes = {}

    marker_world = np.array([0.1, 0.0, 2.0])
    mk = Marker(7, model)
    db = DB()
    for i in range(3):
        # camera at x = i*0.1 looking forward; marker fixed in world
        pose_cw = np.eye(4)
        pose_cw[:3, 3] = [-i * 0.1, 0, 0]
        db.keyframes[i] = KF(pose_cw)
        T_cm = np.eye(4)
        T_cm[:3, :3] = np.diag([1.0, -1.0, -1.0])
        T_cm[:3, 3] = pose_cw[:3, :3] @ marker_world + pose_cw[:3, 3]
        img = render_marker(T_cm, K)
        out = det.detect(img)
        assert 7 in out
        mk.add_observation(i, out[7])
    init = MarkerInitializer(min_num_views=3)
    assert init.check_marker_initialization(mk, db)
    center = mk.corners_world.mean(axis=0)
    np.testing.assert_allclose(center, marker_world, atol=0.08)


def test_marker_rows_in_ba_assembly():
    """append_marker_rows: initialized markers contribute 4 point rows with
    unit-weight edges; fixed markers get lm_fixed rows."""
    import numpy as np
    from stella_vslam_tpu.marker.marker import append_marker_rows

    model = MarkerModel(width=0.2)

    class M2D:
        def __init__(self, und):
            self.undist_corners_2d = und

    mk1 = Marker(1, model)
    mk1.initialized = True
    mk1.corners_world = np.arange(12, dtype=float).reshape(4, 3)
    mk1.add_observation(10, M2D(np.full((4, 2), 5.0)))
    mk1.add_observation(11, M2D(np.full((4, 2), 7.0)))
    mk2 = Marker(2, model)  # not initialized -> skipped
    mk3 = Marker(3, model)  # fixed
    mk3.keep_fixed = True
    mk3.corners_world = np.ones((4, 3))
    mk3.add_observation(11, M2D(np.full((4, 2), 9.0)))

    class DB:
        markers = {1: mk1, 2: mk2, 3: mk3}

    L, D = 16, 4
    lm_pos = np.zeros((L, 3), np.float32)
    lm_valid = np.zeros(L, bool)
    lm_fixed = np.zeros(L, bool)
    obs_cam = np.zeros((L, D), np.int32)
    obs_uv = np.zeros((L, D, 2), np.float32)
    obs_w = np.ones((L, D), np.float32)
    obs_valid = np.zeros((L, D), bool)
    rows = append_marker_rows(
        DB(), {10: 0, 11: 1}, lm_pos, lm_valid, lm_fixed,
        obs_cam, obs_uv, obs_w, obs_valid, start_row=2,
    )
    assert len(rows) == 8  # mk1 + mk3, 4 corners each
    assert lm_valid[2:10].all() and not lm_valid[10:].any()
    assert not lm_fixed[2:6].any() and lm_fixed[6:10].all()
    np.testing.assert_allclose(lm_pos[2], [0, 1, 2])
    assert obs_valid[2, :2].all() and not obs_valid[2, 2:].any()
    np.testing.assert_allclose(obs_uv[2, 0], [5.0, 5.0])
    np.testing.assert_allclose(obs_uv[2, 1], [7.0, 7.0])
    assert obs_valid[6, 0] and obs_cam[6, 0] == 1  # fixed marker edge to kf 11
