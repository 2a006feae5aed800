"""Sim3 transform + pose-graph optimizer tests on synthetic loops."""
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.optim import sim3 as sim3_opt

RNG = np.random.default_rng(8)
FX, FY, CX, CY = 450.0, 450.0, 376.0, 240.0


def test_transform_optimizer_recovers_sim3():
    n = 80
    # landmarks in kf2 camera frame
    pts2 = np.stack(
        [RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n), RNG.uniform(4, 8, n)],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.3, -0.1, 0.2, 0.05, -0.1, 0.08, 0.15], dtype=np.float32)
    s_gt, R_gt, t_gt = lie.sim3_exp(jnp.asarray(xi))
    pts1 = np.array(lie.sim3_apply(jnp.asarray(s_gt)[None], R_gt, t_gt, jnp.asarray(pts2)))

    def proj(p):
        return np.stack(
            [FX * p[:, 0] / p[:, 2] + CX, FY * p[:, 1] / p[:, 2] + CY], axis=-1
        ).astype(np.float32)

    obs1, obs2 = proj(pts1), proj(pts2)
    # start from a perturbed estimate
    dxi = np.array([0.05, 0.02, -0.04, 0.01, 0.02, -0.02, -0.05], dtype=np.float32)
    ds, dR, dt = lie.sim3_exp(jnp.asarray(dxi))
    s0, R0, t0 = lie.sim3_compose(ds, dR, dt, s_gt, R_gt, t_gt)
    res = sim3_opt.optimize_transform(
        s0, R0, t0, jnp.asarray(pts1), jnp.asarray(pts2),
        jnp.asarray(obs1), jnp.asarray(obs2),
        jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
        FX, FY, CX, CY, chi_sq=9.966,
    )
    assert float(jnp.abs(res.s_12 - s_gt)) < 1e-3
    dRm = np.array(res.R_12) @ np.array(R_gt).T
    ang = np.arccos(np.clip((np.trace(dRm) - 1) / 2, -1, 1))
    assert ang < 1e-3
    assert np.linalg.norm(np.array(res.t_12) - np.array(t_gt)) < 5e-3
    assert int(res.num_inliers) >= n * 0.95


def test_pose_graph_closes_loop():
    """Circle of K keyframes with odometry drift; one loop edge fixes it."""
    K = 24
    # ground-truth poses on a circle (cam-from-world)
    gt = []
    for k in range(K):
        th = 2 * np.pi * k / K
        xi = np.array([np.cos(th), np.sin(th), 0.0, 0.0, 0.0, th], dtype=np.float32)
        R, t = map(np.array, lie.se3_exp(jnp.asarray(xi)))
        gt.append((R, t))

    # odometry edges with accumulated drift in the estimates
    est_s = np.ones(K, np.float32)
    est_R = np.zeros((K, 3, 3), np.float32)
    est_t = np.zeros((K, 3), np.float32)
    est_R[0], est_t[0] = gt[0]
    drift = np.array([0.01, -0.008, 0.004, 0.002, 0.003, -0.004], dtype=np.float32)
    for k in range(1, K):
        R_rel = gt[k][0] @ gt[k - 1][0].T
        t_rel = gt[k][1] - R_rel @ gt[k - 1][1]
        dR, dt = map(np.array, lie.se3_exp(jnp.asarray(drift)))
        R_d = dR @ R_rel
        t_d = dR @ t_rel + dt * 0.1
        est_R[k] = R_d @ est_R[k - 1]
        est_t[k] = R_d @ est_t[k - 1] + t_d

    # edges: consecutive odometry (measured at estimates = relative estimate),
    # plus one loop edge (K-1 -> 0) measured from ground truth
    ei, ej, es, eR, et = [], [], [], [], []
    for k in range(1, K):
        # measurement S_ij = S_i S_j^-1 at the current estimates (odometry)
        R_ij = est_R[k] @ est_R[k - 1].T
        t_ij = est_t[k] - R_ij @ est_t[k - 1]
        ei.append(k); ej.append(k - 1)
        es.append(1.0); eR.append(R_ij); et.append(t_ij)
    # loop edge with TRUE relative pose
    R_loop = gt[K - 1][0] @ gt[0][0].T
    t_loop = gt[K - 1][1] - R_loop @ gt[0][1]
    ei.append(K - 1); ej.append(0)
    es.append(1.0); eR.append(R_loop); et.append(t_loop)

    res = sim3_opt.optimize_pose_graph(
        jnp.asarray(est_s), jnp.asarray(est_R), jnp.asarray(est_t),
        jnp.asarray(np.arange(K) == 0), jnp.ones(K, bool),
        jnp.asarray(np.array(ei, np.int32)), jnp.asarray(np.array(ej, np.int32)),
        jnp.asarray(np.array(es, np.float32)),
        jnp.asarray(np.stack(eR)), jnp.asarray(np.stack(et)),
        jnp.ones(len(ei), bool),
    )
    # the loop-closure error at the last keyframe must shrink vs the drifted init
    def pose_err(R_est, t_est, Rg, tg):
        dR = np.array(R_est) @ Rg.T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        return ang + np.linalg.norm(np.array(t_est) / np.array(s) - tg) if False else ang + np.linalg.norm(np.array(t_est) - tg)

    err_init = pose_err(est_R[K - 1], est_t[K - 1], *gt[K - 1])
    s = np.array(res.s_cw)
    t_rec = np.array(res.t_cw) / s[:, None]  # SE3 recovery (divide by scale)
    err_opt = pose_err(np.array(res.R_cw[K - 1]), t_rec[K - 1], *gt[K - 1])
    assert err_opt < err_init * 0.35, f"init {err_init}, opt {err_opt}"
    # scales stay near 1 in a pure SE3 problem
    assert np.abs(s - 1).max() < 0.1
