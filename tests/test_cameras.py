"""Camera model tests: distort/undistort roundtrips, bearings, reprojection;
perspective undistortion is cross-checked against cv2.undistortPoints."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from stella_vslam_tpu.camera import base as cam

RNG = np.random.default_rng(1)


def make_perspective():
    return cam.make_params(
        fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
        width=752, height=480,
    )


def make_fisheye():
    return cam.make_params(
        fx=190.978, fy=190.973, cx=254.931, cy=256.897,
        k1=0.003482389402, k2=0.000715034845, k3=-0.002053236141, k4=0.000202936736,
        width=512, height=512,
    )


def interior_points(w, h, n=200):
    return np.stack(
        [RNG.uniform(w * 0.15, w * 0.85, n), RNG.uniform(h * 0.15, h * 0.85, n)],
        axis=-1,
    ).astype(np.float32)


def test_perspective_undistort_matches_cv2():
    p = make_perspective()
    pts = interior_points(752, 480)
    ours = np.asarray(cam.perspective_undistort(p, jnp.asarray(pts)))
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, D, P=K).reshape(-1, 2)
    # cv2's own iterative inversion terminates at ~0.06px; our roundtrip test
    # below is the strict accuracy check.
    np.testing.assert_allclose(ours, ref, atol=0.1)


def test_perspective_distort_roundtrip():
    p = make_perspective()
    pts = jnp.asarray(interior_points(752, 480))
    und = cam.perspective_undistort(p, pts)
    back = cam.perspective_distort(p, und)
    np.testing.assert_allclose(np.array(back), np.array(pts), atol=0.02)


def test_fisheye_roundtrip():
    p = make_fisheye()
    pts = jnp.asarray(interior_points(512, 512))
    und = cam.fisheye_undistort(p, pts)
    back = cam.fisheye_distort(p, und)
    np.testing.assert_allclose(np.array(back), np.array(pts), atol=0.05)


def test_radial_division_roundtrip():
    p = cam.make_params(fx=400.0, fy=400.0, cx=320.0, cy=240.0, k1=-1e-6,
                        width=640, height=480)
    pts = jnp.asarray(interior_points(640, 480))
    und = cam.radial_division_undistort(p, pts)
    back = cam.radial_division_distort(p, und)
    np.testing.assert_allclose(np.array(back), np.array(pts), atol=0.02)


@pytest.mark.parametrize("model,params_fn,w,h", [
    (cam.CameraModel.PERSPECTIVE, make_perspective, 752, 480),
    (cam.CameraModel.EQUIRECTANGULAR,
     lambda: cam.make_params(cx=960, cy=480, width=1920, height=960), 1920, 960),
])
def test_bearing_roundtrip(model, params_fn, w, h):
    p = params_fn()
    pts = jnp.asarray(interior_points(w, h))
    und = cam.undistort_keypoints(model, p, pts)
    b = cam.bearings_from_undistorted(model, p, und)
    np.testing.assert_allclose(
        np.linalg.norm(np.array(b), axis=-1), 1.0, atol=1e-5
    )
    back = cam.undistorted_from_bearings(model, p, b)
    np.testing.assert_allclose(np.array(back), np.array(und), atol=0.02)


def test_reproject_visibility():
    p = make_perspective()
    R = jnp.eye(3)
    t = jnp.zeros(3)
    pts_w = jnp.asarray(
        [[0.0, 0.0, 5.0], [0.0, 0.0, -5.0], [100.0, 0.0, 1.0]], dtype=jnp.float32
    )
    uv, z, vis = cam.reproject_to_image(cam.CameraModel.PERSPECTIVE, p, R, t, pts_w)
    assert bool(vis[0]) and not bool(vis[1]) and not bool(vis[2])
    np.testing.assert_allclose(np.array(uv[0]), [367.215, 248.375], atol=1e-3)


def test_equirect_reproject_all_directions_visible():
    p = cam.make_params(cx=960, cy=480, width=1920, height=960)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    pts = jnp.asarray(RNG.normal(size=(50, 3)) * 5.0, dtype=jnp.float32)
    uv, d, vis = cam.reproject_to_image(cam.CameraModel.EQUIRECTANGULAR, p, R, t, pts)
    assert bool(jnp.all(vis))


def test_camera_host_object_and_yaml():
    node = {
        "name": "EuRoC", "setup": "monocular", "model": "perspective",
        "fx": 458.654, "fy": 457.296, "cx": 367.215, "cy": 248.375,
        "k1": -0.28340811, "k2": 0.07395907, "p1": 0.00019359,
        "p2": 1.76187114e-05, "k3": 0.0, "fps": 20.0, "cols": 752, "rows": 480,
        "color_order": "Gray",
    }
    c = cam.camera_from_yaml(node)
    assert c.model == cam.CameraModel.PERSPECTIVE
    assert c.setup == cam.Setup.MONOCULAR
    assert c.width == 752
    min_x, max_x, min_y, max_y = c.img_bounds
    assert min_x < 0 < max_x and max_x > 752  # barrel distortion expands bounds
    d = c.to_json()
    c2 = cam.Camera.from_json(d)
    assert c2.model == c.model and c2.width == c.width
