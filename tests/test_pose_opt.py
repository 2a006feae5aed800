"""Pose optimizer tests: converges from a perturbed pose, rejects outliers."""
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.optim import pose as pose_opt
from stella_vslam_tpu.ops.optim.residuals import CamScalars

RNG = np.random.default_rng(6)
FX, FY, CX, CY = 450.0, 450.0, 376.0, 240.0
CAM = CamScalars(
    fx=jnp.float32(FX), fy=jnp.float32(FY), cx=jnp.float32(CX), cy=jnp.float32(CY),
    width=jnp.float32(752), height=jnp.float32(480), focal_x_baseline=jnp.float32(0.0),
)


def make_scene(n=150, noise=0.3, outlier_frac=0.2):
    pts_w = np.stack(
        [RNG.uniform(-3, 3, n), RNG.uniform(-2, 2, n), RNG.uniform(4, 10, n)], axis=-1
    ).astype(np.float32)
    xi_gt = np.array([0.3, -0.2, 0.1, 0.08, -0.12, 0.05], dtype=np.float32)
    R_gt, t_gt = lie.se3_exp(jnp.asarray(xi_gt))
    pc = pts_w @ np.array(R_gt).T + np.array(t_gt)
    uv = np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], axis=-1
    )
    uv += RNG.normal(0, noise, uv.shape)
    n_out = int(n * outlier_frac)
    out_idx = RNG.choice(n, n_out, replace=False)
    uv[out_idx] += RNG.uniform(15, 60, (n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
    inlier_gt = np.ones(n, bool)
    inlier_gt[out_idx] = False
    return pts_w, (np.array(R_gt), np.array(t_gt)), uv.astype(np.float32), inlier_gt


def run(pts_w, uv, R0, t0):
    n = len(pts_w)
    return pose_opt.optimize_pose(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts_w), jnp.asarray(uv),
        jnp.full(n, -1.0), jnp.ones(n), jnp.ones(n, bool), CAM,
    )


def pose_error(R_est, t_est, R_gt, t_gt):
    dR = np.array(R_est) @ R_gt.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return ang, np.linalg.norm(np.array(t_est) - t_gt)


def test_pose_opt_converges_with_outliers():
    pts_w, (R_gt, t_gt), uv, inlier_gt = make_scene()
    # perturb init
    dxi = jnp.asarray([0.05, -0.04, 0.03, 0.02, 0.015, -0.02], dtype=jnp.float32)
    dR, dt = lie.se3_exp(dxi)
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_gt), jnp.asarray(t_gt))
    res = run(pts_w, uv, R0, t0)
    ang, terr = pose_error(res.R_cw, res.t_cw, R_gt, t_gt)
    assert ang < 0.002, f"rot err {ang}"
    assert terr < 0.02, f"trans err {terr}"
    inl = np.array(res.is_inlier)
    # outliers detected
    assert inl[inlier_gt].mean() > 0.95
    assert inl[~inlier_gt].mean() < 0.1


def test_pose_opt_noise_free_exact():
    pts_w, (R_gt, t_gt), uv, _ = make_scene(noise=0.0, outlier_frac=0.0)
    res = run(pts_w, uv, R_gt + 0.0, t_gt + np.array([0.1, -0.05, 0.08], np.float32))
    ang, terr = pose_error(res.R_cw, res.t_cw, R_gt, t_gt)
    assert ang < 1e-4 and terr < 1e-3


def test_pose_opt_stereo_observations():
    pts_w, (R_gt, t_gt), uv, _ = make_scene(noise=0.1, outlier_frac=0.0)
    cam = CAM._replace(focal_x_baseline=jnp.float32(FX * 0.1))
    pc = pts_w @ R_gt.T + t_gt
    x_right = (
        FX * pc[:, 0] / pc[:, 2] + CX - FX * 0.1 / pc[:, 2]
    ).astype(np.float32)
    n = len(pts_w)
    res = pose_opt.optimize_pose(
        jnp.asarray(R_gt), jnp.asarray(t_gt + np.array([0.1, 0, 0], np.float32)),
        jnp.asarray(pts_w), jnp.asarray(uv), jnp.asarray(x_right),
        jnp.ones(n), jnp.ones(n, bool), cam,
    )
    ang, terr = pose_error(res.R_cw, res.t_cw, R_gt, t_gt)
    assert ang < 0.002 and terr < 0.01


def test_pose_opt_equirectangular():
    n = 120
    pts_w = RNG.normal(0, 3, (n, 3)).astype(np.float32)  # all around
    xi_gt = np.array([0.2, 0.1, -0.1, 0.1, -0.08, 0.12], dtype=np.float32)
    R_gt, t_gt = map(np.array, lie.se3_exp(jnp.asarray(xi_gt)))
    pc = pts_w @ R_gt.T + t_gt
    W, H = 1920.0, 960.0
    lon = np.arctan2(pc[:, 0], pc[:, 2])
    lat = np.arcsin(np.clip(pc[:, 1] / np.linalg.norm(pc, axis=-1), -1, 1))
    uv = np.stack([W / 2 + lon * W / (2 * np.pi), H / 2 + lat * H / np.pi], axis=-1).astype(np.float32)
    cam = CamScalars(
        fx=jnp.float32(0), fy=jnp.float32(0), cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
        width=jnp.float32(W), height=jnp.float32(H), focal_x_baseline=jnp.float32(0),
    )
    res = pose_opt.optimize_pose(
        jnp.asarray(R_gt), jnp.asarray(t_gt + np.array([0.1, -0.05, 0.02], np.float32)),
        jnp.asarray(pts_w), jnp.asarray(uv), jnp.full(n, -1.0),
        jnp.ones(n), jnp.ones(n, bool), cam, model="equirectangular",
    )
    ang, terr = pose_error(res.R_cw, res.t_cw, R_gt, t_gt)
    assert ang < 0.005 and terr < 0.02
