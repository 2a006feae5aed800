"""Batched PnP RANSAC on bearing vectors.

Reference: src/stella_vslam/solve/pnp_solver.{h,cc} — EPnP minimal sets (4 pts)
+ RANSAC with a scale-aware angular inlier test (1 deg * scale_factor[octave],
pnp_solver.cc:26-33,126-153), Gauss-Newton refinement, min inlier gate.

TPU-native formulation: minimal hypotheses are P3P (Grunert's three-point
depth system) solved fully batched — the quartic's real roots found by
multi-start Newton (elementwise ops only; no eigendecomposition, which TPU
lacks for nonsymmetric matrices), depths recovered per root, and (R, t)
extracted by exact two-triad alignment. Three-point sets keep the all-inlier
sampling probability high AND stay well-posed on planar scenes, where a
6-point DLT resection is structurally degenerate (the reference's EPnP
covers planarity with its 3-control-point case, pnp_solver.h:94-118).
A nonminimal 6-point-DLT recompute on the consensus set polishes the winner
when the scene has depth relief; final polish happens in the GN pose
optimizer (optimize/pose.py) exactly as the reference refines with g2o.
"""
from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.solve import ransac

MIN_SET_SIZE = 3
# Newton starts for the P3P quartic: v = s3/s1 depth ratio; log-spaced over
# the range practical scenes reach. Every start converges to SOME root (or a
# clamped fixed point); duplicates/garbage just become hypotheses that score
# zero inliers.
_P3P_STARTS = (0.2, 0.4, 0.7, 1.0, 1.4, 2.0, 3.2, 5.0)
_P3P_NEWTON_ITERS = 24


def _triad(x1, x2, x3):
    """Orthonormal frame [..., 3, 3] (columns) spanned by three points."""
    e1 = x2 - x1
    e1 = e1 / (jnp.linalg.norm(e1, axis=-1, keepdims=True) + 1e-12)
    e3 = jnp.cross(e1, x3 - x1)
    e3 = e3 / (jnp.linalg.norm(e3, axis=-1, keepdims=True) + 1e-12)
    e2 = jnp.cross(e3, e1)
    return jnp.stack([e1, e2, e3], axis=-1)


def p3p_grunert(f, P):
    """Batched P3P: [..., 3, 3] unit bearings (rows) + world points (rows)
    -> (R [..., S, 3, 3], t [..., S, 3], valid [..., S]) over S Newton
    starts, with X_cam = R @ X_world + t.

    Grunert's depth system (s_i = depth along bearing f_i; side lengths
    a,b,c opposite the same-index vertex):
        s2^2 + s3^2 - 2 s2 s3 cos(alpha) = a^2
        s1^2 + s3^2 - 2 s1 s3 cos(beta)  = b^2
        s1^2 + s2^2 - 2 s1 s2 cos(gamma) = c^2
    With u = s2/s1, v = s3/s1, A = a^2/b^2, C = c^2/b^2, eliminating u
    gives u = N(v)/D(v) and a quartic Q(v) = N^2 - 2 cos(gamma) N D +
    D^2 (1 - C q) with q(v) = 1 + v^2 - 2 v cos(beta)."""
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    P1, P2, P3 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)
    ca = jnp.sum(f2 * f3, axis=-1)[..., None]
    cb = jnp.sum(f1 * f3, axis=-1)[..., None]
    cg = jnp.sum(f1 * f2, axis=-1)[..., None]
    A = (a2 / (b2 + 1e-20))[..., None]
    C = (c2 / (b2 + 1e-20))[..., None]
    AC = A - C

    def terms(v):
        q = 1.0 + v * v - 2.0 * v * cb
        N = 1.0 - v * v + AC * q
        D = 2.0 * (cg - v * ca)
        E = 1.0 - C * q
        Q = N * N - 2.0 * cg * N * D + D * D * E
        return q, N, D, E, Q

    v = jnp.broadcast_to(
        jnp.asarray(_P3P_STARTS, f.dtype), (*a2.shape, len(_P3P_STARTS)))
    for _ in range(_P3P_NEWTON_ITERS):
        q, N, D, E, Q = terms(v)
        qp = 2.0 * v - 2.0 * cb
        Np = -2.0 * v + AC * qp
        Dp = -2.0 * ca
        Ep = -C * qp
        Qp = (2.0 * N * Np - 2.0 * cg * (Np * D + N * Dp)
              + 2.0 * D * Dp * E + D * D * Ep)
        Qp = jnp.where(jnp.abs(Qp) < 1e-8, 1e-8, Qp)
        v = jnp.clip(v - Q / Qp, 1e-4, 50.0)

    q, N, D, E, Q = terms(v)
    u = N / jnp.where(jnp.abs(D) < 1e-9, 1e-9, D)
    s1 = jnp.sqrt(b2[..., None] / jnp.maximum(q, 1e-12))
    s2 = u * s1
    s3 = v * s1
    # validity: positive depths and the eliminated equation E_a actually
    # satisfied (relative to the depth scale: a non-converged Newton start
    # leaves a large residual; a wrong-but-converged root only wastes one
    # scoring slot)
    res_a = s2 * s2 + s3 * s3 - 2.0 * s2 * s3 * ca - a2[..., None]
    res_scale = s1 * s1 + s2 * s2 + s3 * s3 + a2[..., None] + 1e-20
    valid = (u > 0) & (q > 1e-12) & (jnp.abs(res_a) < 1e-3 * res_scale)
    valid = valid & jnp.isfinite(s1) & jnp.isfinite(s2) & jnp.isfinite(s3)

    X1 = s1[..., None] * f1[..., None, :]
    X2 = s2[..., None] * f2[..., None, :]
    X3 = s3[..., None] * f3[..., None, :]
    Rc = _triad(X1, X2, X3)                       # [..., S, 3, 3]
    Rw = _triad(P1, P2, P3)[..., None, :, :]      # [..., 1, 3, 3]
    R = Rc @ jnp.swapaxes(jnp.broadcast_to(Rw, Rc.shape), -1, -2)
    t = X1 - jnp.einsum("...ij,...j->...i", R,
                        jnp.broadcast_to(P1[..., None, :], X1.shape))
    R = jnp.where(valid[..., None, None], R, jnp.eye(3, dtype=f.dtype))
    t = jnp.where(valid[..., None], t, 0.0)
    return R, t, valid


class PnPResult(NamedTuple):
    R_cw: jnp.ndarray  # [3,3]
    t_cw: jnp.ndarray  # [3]
    is_inlier: jnp.ndarray  # [N]
    num_inliers: jnp.ndarray
    valid: jnp.ndarray


def compute_pose_dlt(bearings: jnp.ndarray, pos_w: jnp.ndarray, valid=None):
    """[..., k, 3] bearings + [..., k, 3] world points -> (R_cw, t_cw), batched.

    Linear camera resection: bearing x (R p + t) = 0 gives 3 equations per
    point (2 independent) in the 12 unknowns of P = [R | t]."""
    bx = lie.hat(bearings)  # [..., k, 3, 3]
    # rows: bx @ [p^T kron I | I] . vec(P) with vec(P) = [r1 r2 r3 t]
    p = pos_w
    ones = jnp.ones_like(p[..., :1])
    # A_row(i, j) for equation row j of point i: kron structure
    # [bx] @ (R p + t) = 0  ->  for each of 3 rows c of bx:
    #   sum_d bx[c,d] * (row_d(R) . p + t_d) = 0
    # unknown layout: [R00 R01 R02 R10 R11 R12 R20 R21 R22 t0 t1 t2]
    ph = jnp.concatenate([p, ones], axis=-1)  # [..., k, 4]
    # build [..., k, 3, 12]: A[c, d*? ] = bx[c,d] * [p, 1] placed at block d
    A = jnp.einsum("...kcd,...ke->...kcde", bx, ph)  # [..., k, 3, 3, 4]
    # reorder blocks: unknowns = [R_d=0 row (3), R_d=1, R_d=2, t(3)]
    AR = A[..., :3].reshape(*A.shape[:-2], 9)  # rotation part [..., k, 3, 9]
    At = A[..., 3]  # translation part [..., k, 3, 3]
    Afull = jnp.concatenate([AR, At], axis=-1)  # [..., k, 3, 12]
    if valid is not None:
        Afull = Afull * valid[..., None, None].astype(Afull.dtype)
    Aflat = Afull.reshape(*Afull.shape[:-3], -1, 12)
    AtA = jnp.einsum("...ki,...kj->...ij", Aflat, Aflat)
    v = ransac.smallest_eigvec_sym(AtA)  # [..., 12]
    Rraw = v[..., :9].reshape(*v.shape[:-1], 3, 3)
    traw = v[..., 9:]
    # fix scale & orthogonality: R = proj(Rraw / s), t = traw / s
    s = jnp.cbrt(jnp.abs(jnp.linalg.det(Rraw)) + 1e-20)
    Rn = Rraw / s[..., None, None]
    tn = traw / s[..., None]
    Rproj = lie.rotation_project_fast(Rn)
    # sign: points should be in front (positive projection along bearings)
    pc = jnp.einsum("...ij,...kj->...ki", Rproj, pos_w) + tn[..., None, :]
    frontness = jnp.sum(jnp.sum(pc * bearings, axis=-1), axis=-1)
    flip = frontness < 0
    Rproj = jnp.where(flip[..., None, None], -Rproj, Rproj)
    # -R is not a rotation (det=-1); recover via projection again
    Rproj = lie.rotation_project_fast(Rproj)
    tn = jnp.where(flip[..., None], -tn, tn)
    return Rproj, tn


def check_inliers(R_cw, t_cw, bearings, pos_w, max_cos_errors):
    """reference pnp_solver::check_inliers — cosine similarity between the
    observed bearing and the reprojected point direction."""
    pc = jnp.einsum("...ij,...nj->...ni", R_cw, pos_w) + t_cw[..., None, :]
    cos_angle = jnp.sum(pc * bearings, axis=-1) / (
        jnp.linalg.norm(pc, axis=-1) + 1e-12
    )
    inlier = cos_angle > max_cos_errors
    cost = jnp.where(inlier, 1.0 - cos_angle, 1.0 - max_cos_errors)
    return inlier, cost


@partial(jax.jit, static_argnames=("num_hypotheses", "min_num_inliers"))
def find_via_ransac(
    key: jax.Array,
    bearings: jnp.ndarray,  # [N,3]
    pos_w: jnp.ndarray,  # [N,3]
    octaves: jnp.ndarray,  # [N] i32
    match_valid: jnp.ndarray,  # [N]
    *,
    scale_factors: jnp.ndarray,
    num_hypotheses: int = 256,
    min_num_inliers: int = 10,
) -> PnPResult:
    from stella_vslam_tpu.match import hamming as H

    max_rad = 1.0 * jnp.pi / 180.0
    max_cos = jnp.cos(H.take_small_table(scale_factors, octaves) * max_rad)  # [N]

    idx = ransac.sample_minimal_sets(key, match_valid, num_hypotheses, MIN_SET_SIZE)
    sb = ransac.gather_sets(bearings, idx)
    sp = ransac.gather_sets(pos_w, idx)
    R, t, hyp_ok = p3p_grunert(sb, sp)  # [B,S,3,3], [B,S,3], [B,S]
    R = R.reshape(-1, 3, 3)
    t = t.reshape(-1, 3)
    hyp_ok = hyp_ok.reshape(-1)

    inlier, cost = check_inliers(R, t, bearings[None], pos_w[None], max_cos[None])
    inlier = inlier & match_valid[None, :] & hyp_ok[:, None]
    cost = jnp.where(inlier, cost, 1.0 - max_cos[None])
    cost = jnp.where(match_valid[None, :], cost, 0.0)
    num_in = jnp.sum(inlier, axis=-1)
    total = jnp.sum(cost, axis=-1)
    best, ok = ransac.select_best(total, num_in, 2 * MIN_SET_SIZE)

    R_b, t_b, inl = R[best], t[best], inlier[best]
    # nonminimal recompute on inliers (reference recomputes EPnP on inliers)
    R_re, t_re = compute_pose_dlt(bearings, pos_w, valid=inl & match_valid)
    in_re, _ = check_inliers(R_re, t_re, bearings, pos_w, max_cos)
    in_re = in_re & match_valid
    better = jnp.sum(in_re) >= jnp.sum(inl)
    R_b = jnp.where(better, R_re, R_b)
    t_b = jnp.where(better, t_re, t_b)
    inl = jnp.where(better, in_re, inl)

    ok = ok & (jnp.sum(inl) >= min_num_inliers)
    return PnPResult(R_b, t_b, inl, jnp.sum(inl), ok)
