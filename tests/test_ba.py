"""Bundle adjustment tests: synthetic multi-view problems with noise,
outliers, fixed cameras, and padded invalid slots."""
import jax.numpy as jnp
import numpy as np
import pytest

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.optim import ba
from stella_vslam_tpu.ops.optim.residuals import CamScalars

RNG = np.random.default_rng(7)
FX, FY, CX, CY = 450.0, 450.0, 376.0, 240.0
CAM = CamScalars(
    fx=jnp.float32(FX), fy=jnp.float32(FY), cx=jnp.float32(CX), cy=jnp.float32(CY),
    width=jnp.float32(752), height=jnp.float32(480), focal_x_baseline=jnp.float32(0.0),
)


def build_problem(K=6, L=64, D=6, noise=0.3, pose_pert=0.02, point_pert=0.05,
                  n_fixed=2, Lpad=None, Kpad=None, rng=None):
    """K cameras on an arc looking at a cloud of L points; each point observed
    by D random cameras."""
    RNG = rng if rng is not None else globals()["RNG"]
    Kpad = Kpad or K
    Lpad = Lpad or L
    pts = np.stack(
        [RNG.uniform(-3, 3, L), RNG.uniform(-2, 2, L), RNG.uniform(6, 10, L)], axis=-1
    ).astype(np.float32)
    poses = []
    for k in range(K):
        xi = np.array([0.4 * k, 0.05 * k, 0.0, 0.0, -0.05 * k, 0.0], dtype=np.float32)
        R, t = map(np.array, lie.se3_exp(jnp.asarray(xi)))
        poses.append((R, t))

    obs_cam = np.zeros((Lpad, D), np.int32)
    obs_uv = np.zeros((Lpad, D, 2), np.float32)
    obs_valid = np.zeros((Lpad, D), bool)
    for l in range(L):
        cams = RNG.choice(K, size=min(D, K), replace=False)
        for d, k in enumerate(cams):
            R, t = poses[k]
            pc = pts[l] @ R.T + t
            if pc[2] < 0.1:
                continue
            uv = [FX * pc[0] / pc[2] + CX, FY * pc[1] / pc[2] + CY]
            obs_cam[l, d] = k
            obs_uv[l, d] = uv + RNG.normal(0, noise, 2)
            obs_valid[l, d] = True

    # perturb initial estimates (except fixed cameras)
    cam_R = np.zeros((Kpad, 3, 3), np.float32)
    cam_R[:] = np.eye(3)
    cam_t = np.zeros((Kpad, 3), np.float32)
    for k in range(K):
        R, t = poses[k]
        if k >= n_fixed:
            dxi = RNG.normal(0, pose_pert, 6).astype(np.float32)
            dR, dt = map(np.array, lie.se3_exp(jnp.asarray(dxi)))
            R = dR @ R
            t = dR @ t + dt
        cam_R[k], cam_t[k] = R, t
    lm0 = np.zeros((Lpad, 3), np.float32)
    lm0[:L] = pts + RNG.normal(0, point_pert, (L, 3))

    prob = ba.BAProblem(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=jnp.asarray(np.arange(Kpad) < n_fixed),
        cam_valid=jnp.asarray(np.arange(Kpad) < K),
        lm_pos=jnp.asarray(lm0),
        lm_valid=jnp.asarray(np.arange(Lpad) < L),
        obs_cam=jnp.asarray(obs_cam), obs_uv=jnp.asarray(obs_uv),
        obs_x_right=jnp.full((Lpad, D), -1.0),
        obs_inv_sigma_sq=jnp.ones((Lpad, D)),
        obs_valid=jnp.asarray(obs_valid),
    )
    return prob, poses, pts, L, K


def reproj_rmse(res, poses, pts, obs_valid, obs_cam, obs_uv, L):
    errs = []
    camR, camt, lm = map(np.array, (res.cam_R, res.cam_t, res.lm_pos))
    for l in range(L):
        for d in range(obs_valid.shape[1]):
            if not obs_valid[l, d]:
                continue
            k = obs_cam[l, d]
            pc = lm[l] @ camR[k].T + camt[k]
            uv = [FX * pc[0] / pc[2] + CX, FY * pc[1] / pc[2] + CY]
            errs.append(np.linalg.norm(np.array(uv) - obs_uv[l, d]))
    return np.sqrt(np.mean(np.square(errs)))


def test_ba_converges():
    prob, poses, pts, L, K = build_problem()
    res = ba.bundle_adjust(prob, CAM)
    rmse = reproj_rmse(
        res, poses, pts, np.array(prob.obs_valid), np.array(prob.obs_cam),
        np.array(prob.obs_uv), L,
    )
    assert rmse < 0.6, f"reprojection RMSE {rmse}"
    # fixed cameras unchanged
    np.testing.assert_allclose(np.array(res.cam_R[0]), np.array(prob.cam_R[0]), atol=1e-6)
    np.testing.assert_allclose(np.array(res.cam_t[1]), np.array(prob.cam_t[1]), atol=1e-6)
    # landmark positions close to ground truth (gauge fixed by 2 cameras)
    lm_err = np.linalg.norm(np.array(res.lm_pos[:L]) - pts, axis=-1)
    assert np.median(lm_err) < 0.05, f"median landmark err {np.median(lm_err)}"


def test_ba_flags_outliers():
    prob, poses, pts, L, K = build_problem(noise=0.2)
    # corrupt some observations
    uv = np.array(prob.obs_uv)
    bad = [(3, 1), (10, 0), (20, 2), (33, 3)]
    for (l, d) in bad:
        uv[l, d] += [40.0, -35.0]
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = ba.bundle_adjust(prob, CAM)
    out = np.array(res.obs_is_outlier)
    for (l, d) in bad:
        assert out[l, d], f"outlier ({l},{d}) not flagged"
    assert out.sum() <= len(bad) + 8


def test_ba_padded_slots_inert():
    """Padding (invalid cams/landmarks/obs) must not affect results."""
    global RNG
    saved = RNG
    RNG = np.random.default_rng(42)
    prob1, poses, pts, L, K = build_problem(Lpad=64, Kpad=6)
    RNG = np.random.default_rng(42)
    prob2, _, _, _, _ = build_problem(Lpad=96, Kpad=8)
    RNG = saved
    res1 = ba.bundle_adjust(prob1, CAM)
    res2 = ba.bundle_adjust(prob2, CAM)
    np.testing.assert_allclose(
        np.array(res1.cam_t[:6]), np.array(res2.cam_t[:6]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.array(res1.lm_pos[:64]), np.array(res2.lm_pos[:64]), atol=2e-3
    )


def test_ba_stereo():
    prob, poses, pts, L, K = build_problem(noise=0.1)
    cam = CAM._replace(focal_x_baseline=jnp.float32(FX * 0.11))
    # synthesize x_right for valid obs
    obs_cam = np.array(prob.obs_cam)
    obs_valid = np.array(prob.obs_valid)
    xr = np.full(obs_cam.shape, -1.0, np.float32)
    for l in range(L):
        for d in range(obs_cam.shape[1]):
            if obs_valid[l, d]:
                R, t = poses[obs_cam[l, d]]
                pc = pts[l] @ R.T + t
                xr[l, d] = FX * pc[0] / pc[2] + CX - FX * 0.11 / pc[2]
    prob = prob._replace(obs_x_right=jnp.asarray(xr))
    res = ba.bundle_adjust(prob, cam)
    lm_err = np.linalg.norm(np.array(res.lm_pos[:L]) - pts, axis=-1)
    assert np.median(lm_err) < 0.05


def test_ba_fixed_landmarks_anchor():
    """lm_fixed points (marker corners of keep_fixed markers) must stay put
    while still constraining the cameras."""
    prob, poses, pts, L, K = build_problem(noise=0.1, point_pert=0.0)
    fixed = np.zeros(prob.lm_pos.shape[0], bool)
    fixed[:8] = True
    prob = prob._replace(lm_fixed=jnp.asarray(fixed))
    res = ba.bundle_adjust(prob, CAM)
    # fixed points exactly unchanged
    np.testing.assert_allclose(
        np.array(res.lm_pos[:8]), np.array(prob.lm_pos[:8]), atol=0.0
    )
    # free points still converge near ground truth
    lm_err = np.linalg.norm(np.array(res.lm_pos[8:L]) - pts[8:L], axis=-1)
    assert np.median(lm_err) < 0.05
    # cameras still well-estimated (fixed points participated as anchors)
    rmse = reproj_rmse(
        res, poses, pts, np.array(prob.obs_valid), np.array(prob.obs_cam),
        np.array(prob.obs_uv), L,
    )
    assert rmse < 0.6


def _pack(prob, K, L, D):
    """Flatten a BAProblem into the packed f32 upload buffer."""
    segs = []
    for name, n, shape in ba._packed_layout(K, L, D):
        v = getattr(prob, name)
        if v is None:
            v = np.zeros(shape, np.float32)
        segs.append(np.asarray(v, np.float32).ravel())
    return jnp.asarray(np.concatenate(segs))


@pytest.mark.slow  # compiles 5 extra program variants (~25 s on the CPU mesh)
def test_ba_stepped_matches_monolithic():
    """The chunked per-iteration driver (bundle_adjust_packed_stepped) must
    be numerically equivalent to the fused program — same LM body, same
    lambda schedule, same gain termination."""
    # own RNG: the module RNG's state depends on which tests ran before, and
    # a borderline gain-termination can flip on a different random problem
    prob, poses, pts, L, K = build_problem(
        K=6, L=64, D=6, Kpad=8, Lpad=64, rng=np.random.default_rng(11))
    D = 6
    buf = _pack(prob, 8, 64, D)
    r1 = ba.bundle_adjust_packed(buf, CAM, K=8, L=64, D=D,
                                 num_first=3, num_second=6)
    r2 = ba.bundle_adjust_packed_stepped(buf, CAM, K=8, L=64, D=D,
                                         num_first=3, num_second=6,
                                         pace_s=0.0)
    # parity = "same optimum", not bit-identical arithmetic: f32 drift across
    # differently-fused programs can flip the gain-termination one iteration
    # apart, so compare solution quality (reprojection RMSE) plus state
    # within an LM-step-sized tolerance
    rm1 = reproj_rmse(r1, poses, pts, np.array(prob.obs_valid),
                      np.array(prob.obs_cam), np.array(prob.obs_uv), L)
    rm2 = reproj_rmse(r2, poses, pts, np.array(prob.obs_valid),
                      np.array(prob.obs_cam), np.array(prob.obs_uv), L)
    assert abs(rm1 - rm2) < 0.05 * max(rm1, 1e-3), (rm1, rm2)
    np.testing.assert_allclose(np.array(r1.cam_R), np.array(r2.cam_R),
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.array(r1.cam_t), np.array(r2.cam_t),
                               rtol=0, atol=1e-2)
    agree = (np.array(r1.obs_is_outlier) == np.array(r2.obs_is_outlier))
    assert agree.mean() > 0.98, f"outlier flags agree {agree.mean():.3f}"
