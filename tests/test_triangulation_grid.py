"""Triangulation + grid assignment tests against synthetic geometry
(pattern mirrors reference test/helper/landmark.cc generators)."""
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.ops import grid, lie, triangulation

RNG = np.random.default_rng(2)


def synthetic_two_view(n=100):
    pts_w = np.stack(
        [RNG.uniform(-2, 2, n), RNG.uniform(-2, 2, n), RNG.uniform(4, 8, n)], axis=-1
    ).astype(np.float32)
    R1, t1 = np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32)
    xi = np.array([0.5, 0.02, 0.01, 0.02, -0.3, 0.01], dtype=np.float32)
    R2, t2 = lie.se3_exp(jnp.asarray(xi))
    R2, t2 = np.array(R2), np.array(t2)

    def bearings(R, t, pts):
        pc = pts @ R.T + t
        return pc / np.linalg.norm(pc, axis=-1, keepdims=True)

    return pts_w, (R1, t1), (R2, t2), bearings(R1, t1, pts_w), bearings(R2, t2, pts_w)


def test_triangulate_dlt():
    pts_w, (R1, t1), (R2, t2), b1, b2 = synthetic_two_view()
    P1 = np.concatenate([R1, t1[:, None]], axis=1)
    P2 = np.concatenate([R2, t2[:, None]], axis=1)
    out = triangulation.triangulate_dlt(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(P1), jnp.asarray(P2)
    )
    np.testing.assert_allclose(np.array(out), pts_w, atol=1e-2)


def test_triangulate_midpoint():
    pts_w, (R1, t1), (R2, t2), b1, b2 = synthetic_two_view()
    # cam2 <- cam1 transform (cam1 == world here)
    out_c1 = triangulation.triangulate_midpoint(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(R2), jnp.asarray(t2)
    )
    np.testing.assert_allclose(np.array(out_c1), pts_w, atol=1e-2)


def test_triangulate_stereo():
    fx, fy, cx, cy = 400.0, 400.0, 320.0, 240.0
    pts_w, (R1, t1), _, _, _ = synthetic_two_view()
    pc = pts_w  # identity pose
    u = fx * pc[:, 0] / pc[:, 2] + cx
    v = fy * pc[:, 1] / pc[:, 2] + cy
    out = triangulation.triangulate_stereo(
        jnp.asarray(np.stack([u, v], -1)), jnp.asarray(pc[:, 2]),
        fx, fy, cx, cy, jnp.eye(3), jnp.zeros(3),
    )
    np.testing.assert_allclose(np.array(out), pts_w, atol=1e-3)


def test_grid_assignment():
    pts = jnp.asarray([[0.0, 0.0], [751.0, 479.0], [-10.0, 5.0], [375.0, 240.0]])
    valid = jnp.asarray([True, True, True, False])
    cells = grid.assign_keypoints_to_grid(
        pts, valid, 0.0, 0.0, 64.0 / 752.0, 48.0 / 480.0, 64, 48
    )
    c = np.array(cells)
    assert c[0] == 0
    assert c[1] == 48 * 64 - 1
    assert c[2] == -1  # outside
    assert c[3] == -1  # invalid
