"""Minimal-solver RANSAC tests on synthetic geometry with outliers
(pattern mirrors reference test/stella_vslam/solve/*_solver.cc + helpers)."""
import jax
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.solve import essential, fundamental, homography, pnp

RNG = np.random.default_rng(5)
KEY = jax.random.PRNGKey(0)

FX, FY, CX, CY = 450.0, 450.0, 376.0, 240.0


def project(pts_c):
    return np.stack(
        [FX * pts_c[:, 0] / pts_c[:, 2] + CX, FY * pts_c[:, 1] / pts_c[:, 2] + CY],
        axis=-1,
    )


def make_two_view(n=120, planar=False, outlier_frac=0.25):
    if planar:
        pts_w = np.stack(
            [RNG.uniform(-2, 2, n), RNG.uniform(-2, 2, n), np.full(n, 6.0)], axis=-1
        ).astype(np.float32)
    else:
        pts_w = np.stack(
            [RNG.uniform(-2, 2, n), RNG.uniform(-2, 2, n), RNG.uniform(4, 9, n)],
            axis=-1,
        ).astype(np.float32)
    xi = np.array([0.6, 0.1, 0.05, 0.04, -0.15, 0.02], dtype=np.float32)
    R2, t2 = lie.se3_exp(jnp.asarray(xi))
    R2, t2 = np.array(R2), np.array(t2)
    p1 = pts_w
    p2 = pts_w @ R2.T + t2
    uv1, uv2 = project(p1), project(p2)
    # inject outliers
    n_out = int(n * outlier_frac)
    out_idx = RNG.choice(n, n_out, replace=False)
    uv2_noisy = uv2.copy()
    uv2_noisy[out_idx] += RNG.uniform(30, 200, (n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
    inlier_gt = np.ones(n, bool)
    inlier_gt[out_idx] = False
    return pts_w, (R2, t2), uv1, uv2_noisy, inlier_gt


def bearings(uv):
    v = np.stack(
        [(uv[:, 0] - CX) / FX, (uv[:, 1] - CY) / FY, np.ones(len(uv))], axis=-1
    )
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_homography_ransac_planar():
    pts_w, (R2, t2), uv1, uv2, inlier_gt = make_two_view(planar=True)
    res = homography.find_via_ransac(
        KEY, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool)
    )
    assert bool(res.valid)
    got = np.array(res.is_inlier)
    assert (got & inlier_gt).sum() >= inlier_gt.sum() * 0.9
    assert (got & ~inlier_gt).sum() <= 3


def test_homography_decompose_recovers_motion():
    pts_w, (R2, t2), uv1, uv2, _ = make_two_view(planar=True, outlier_frac=0.0)
    res = homography.find_via_ransac(
        KEY, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool)
    )
    # homography in pixel coords -> normalized H for decomposition
    K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], dtype=jnp.float32)
    Hn = jnp.linalg.inv(K) @ res.H_21 @ K
    R8, t8, n8, ok8 = homography.decompose(Hn)
    # one of the 8 must match (R2, t2/||t2||)
    t2n = t2 / np.linalg.norm(t2)
    errs = []
    for i in range(8):
        dR = np.array(R8[i]) @ R2.T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        terr = min(
            np.linalg.norm(np.array(t8[i]) - t2n), np.linalg.norm(np.array(t8[i]) + t2n)
        )
        errs.append(ang + terr)
    assert min(errs) < 0.05, f"best decomposition err {min(errs)}"


def test_fundamental_ransac():
    pts_w, (R2, t2), uv1, uv2, inlier_gt = make_two_view()
    res = fundamental.find_via_ransac(
        KEY, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool)
    )
    assert bool(res.valid)
    got = np.array(res.is_inlier)
    assert (got & inlier_gt).sum() >= inlier_gt.sum() * 0.9
    assert (got & ~inlier_gt).sum() <= 3
    # epipolar constraint holds for ground-truth pairs
    F = np.array(res.F_21)
    ones = np.ones((inlier_gt.sum(), 1))
    p1 = np.concatenate([uv1[inlier_gt], ones], axis=1)
    p2 = np.concatenate([uv2[inlier_gt], ones], axis=1)
    resid = np.abs(np.einsum("ni,ij,nj->n", p2, F, p1))
    scale = np.abs(F).max()
    assert np.median(resid) / scale < 5.0


def test_essential_ransac_and_decompose():
    pts_w, (R2, t2), uv1, uv2, inlier_gt = make_two_view()
    b1, b2 = bearings(uv1), bearings(uv2)
    res = essential.find_via_ransac(
        KEY, jnp.asarray(b1), jnp.asarray(b2), jnp.ones(len(b1), bool)
    )
    assert bool(res.valid)
    got = np.array(res.is_inlier)
    assert (got & inlier_gt).sum() >= inlier_gt.sum() * 0.85
    R4, t4 = essential.decompose(res.E_21)
    t2n = t2 / np.linalg.norm(t2)
    errs = []
    for i in range(4):
        dR = np.array(R4[i]) @ R2.T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        terr = np.linalg.norm(np.array(t4[i]) - t2n)
        errs.append(ang + terr)
    assert min(errs) < 0.05


def test_create_E_21_consistency():
    """E built from poses annihilates bearing pairs (mapping module usage)."""
    pts_w, (R2, t2), uv1, uv2, _ = make_two_view(outlier_frac=0.0)
    b1, b2 = bearings(uv1), bearings(uv2)
    E = essential.create_E_21(jnp.eye(3), jnp.zeros(3), jnp.asarray(R2), jnp.asarray(t2))
    resid = np.abs(np.einsum("ni,ij,nj->n", b2, np.array(E), b1))
    assert np.max(resid) < 1e-4


def test_pnp_ransac():
    n = 100
    pts_w = np.stack(
        [RNG.uniform(-2, 2, n), RNG.uniform(-2, 2, n), RNG.uniform(4, 9, n)], axis=-1
    ).astype(np.float32)
    xi = np.array([0.2, -0.1, 0.05, 0.1, 0.2, -0.05], dtype=np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    R, t = np.array(R), np.array(t)
    pc = pts_w @ R.T + t
    b = (pc / np.linalg.norm(pc, axis=-1, keepdims=True)).astype(np.float32)
    # outliers: wrong bearings
    out_idx = RNG.choice(n, 25, replace=False)
    b[out_idx] = bearings(RNG.uniform(0, [752, 480], (25, 2)))
    scale_factors = jnp.asarray([1.2**i for i in range(8)], dtype=jnp.float32)
    res = pnp.find_via_ransac(
        KEY, jnp.asarray(b), jnp.asarray(pts_w), jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool), scale_factors=scale_factors,
    )
    assert bool(res.valid)
    dR = np.array(res.R_cw) @ R.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.01, f"rotation error {ang}"
    assert np.linalg.norm(np.array(res.t_cw) - t) < 0.05
    inl = np.array(res.is_inlier)
    assert not inl[out_idx].any() or inl[out_idx].mean() < 0.15


def test_pnp_dlt_exact():
    """Noise-free DLT recovers the exact pose (non-RANSAC path)."""
    n = 20
    pts_w = np.stack(
        [RNG.uniform(-2, 2, n), RNG.uniform(-2, 2, n), RNG.uniform(4, 9, n)], axis=-1
    ).astype(np.float32)
    xi = np.array([0.3, 0.1, -0.2, 0.15, -0.1, 0.08], dtype=np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    pc = pts_w @ np.array(R).T + np.array(t)
    b = jnp.asarray(pc / np.linalg.norm(pc, axis=-1, keepdims=True))
    R_est, t_est = pnp.compute_pose_dlt(b, jnp.asarray(pts_w))
    np.testing.assert_allclose(np.array(R_est), np.array(R), atol=1e-3)
    np.testing.assert_allclose(np.array(t_est), np.array(t), atol=1e-2)


def test_smallest_eigvec_ones_orthogonal():
    """Regression: the power-iteration nullspace extractor must not vanish
    when the target eigenvector is orthogonal to the all-ones vector (the old
    M @ ones readout collapsed, yielding a near-zero DLT matrix that RANSAC
    scored as a perfect all-inlier model)."""
    from stella_vslam_tpu.ops.linalg import smallest_eigvec_spd

    rng = np.random.default_rng(3)
    # eigenvector with zero element-sum -> orthogonal to ones
    v = np.array([1.0, -1.0, 0.5, -0.5, 0.25, -0.25, 2.0, -2.0, 0.0])
    v = v / np.linalg.norm(v)
    # complete an orthonormal basis
    Q, _ = np.linalg.qr(np.concatenate([v[:, None], rng.normal(size=(9, 8))], axis=1))
    # Q[:,0] == +-v; assign the SMALLEST eigenvalue to it
    eigvals = np.array([1e-6, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0])
    A = (Q * eigvals) @ Q.T
    got = np.asarray(smallest_eigvec_spd(jnp.asarray(A[None], dtype=jnp.float32)))[0]
    dot = abs(float(got @ Q[:, 0]))
    assert dot > 0.999, f"nullspace extractor lost the eigenvector: |cos|={dot:.4f}"
    # batched: many random SPD with a planted near-null direction
    B = 64
    As = []
    for _ in range(B):
        M = rng.normal(size=(9, 9)).astype(np.float32)
        Qb, _ = np.linalg.qr(M)
        ev = np.sort(rng.uniform(0.5, 10.0, 9)).astype(np.float32)
        ev[0] = 1e-6
        As.append((Qb * ev) @ Qb.T)
    As = np.stack(As)
    got = np.asarray(smallest_eigvec_spd(jnp.asarray(As)))
    for i in range(B):
        w, U = np.linalg.eigh(As[i])
        dot = abs(float(got[i] @ U[:, 0]))
        assert dot > 0.99, f"batch {i}: |cos|={dot:.4f}"
