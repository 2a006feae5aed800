"""Batched 4-point DLT homography RANSAC + Faugeras decomposition.

Reference: src/stella_vslam/solve/homography_solver.{h,cc} — 4-point minimal
DLT, symmetric-transfer-error scoring with chi2(0.05, 2dof) = 5.991 capping
(homography_solver.cc:253-301), best = min cost with > 4 inliers, optional
nonminimal recompute on inliers; 8-hypothesis Faugeras decomposition for
monocular initialization (homography_solver.cc decompose).
"""
from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops.solve import ransac

CHI_SQ_2D = 5.991


class HomographyResult(NamedTuple):
    H_21: jnp.ndarray  # [3,3]
    is_inlier: jnp.ndarray  # [N] bool
    cost: jnp.ndarray  # scalar
    num_inliers: jnp.ndarray  # scalar i32
    valid: jnp.ndarray  # scalar bool


def _normalize(pts: jnp.ndarray, valid=None):
    """Hartley normalization (reference solve/common.cc normalize)."""
    if valid is None:
        mean = jnp.mean(pts, axis=-2, keepdims=True)
        dev = jnp.mean(jnp.abs(pts - mean), axis=-2, keepdims=True) + 1e-12
    else:
        w = valid[..., None].astype(pts.dtype)
        cnt = jnp.sum(w, axis=-2, keepdims=True) + 1e-12
        mean = jnp.sum(pts * w, axis=-2, keepdims=True) / cnt
        dev = jnp.sum(jnp.abs(pts - mean) * w, axis=-2, keepdims=True) / cnt + 1e-12
    normed = (pts - mean) / dev
    # transform matrix T with normed_h = T @ pt_h
    sx = 1.0 / dev[..., 0, 0]
    sy = 1.0 / dev[..., 0, 1]
    tx = -mean[..., 0, 0] * sx
    ty = -mean[..., 0, 1] * sy
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    T = jnp.stack(
        [
            jnp.stack([sx, zeros, tx], axis=-1),
            jnp.stack([zeros, sy, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return normed, T


def compute_H_21(pts1: jnp.ndarray, pts2: jnp.ndarray, valid=None) -> jnp.ndarray:
    """DLT from [..., k, 2] correspondences (k >= 4) with normalization.
    Batched over leading dims. Invalid rows (mask) contribute zero equations."""
    n1, T1 = _normalize(pts1, valid)
    n2, T2 = _normalize(pts2, valid)
    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    zeros = jnp.zeros_like(x1)
    ones = jnp.ones_like(x1)
    rows_a = jnp.stack(
        [zeros, zeros, zeros, -x1, -y1, -ones, y2 * x1, y2 * y1, y2], axis=-1
    )
    rows_b = jnp.stack(
        [x1, y1, ones, zeros, zeros, zeros, -x2 * x1, -x2 * y1, -x2], axis=-1
    )
    A = jnp.concatenate([rows_a, rows_b], axis=-2)  # [..., 2k, 9]
    if valid is not None:
        w = jnp.concatenate([valid, valid], axis=-1)[..., None].astype(A.dtype)
        A = A * w
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    h = ransac.smallest_eigvec_sym(AtA)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # denormalize: H = T2^-1 Hn T1
    T2_inv = jnp.linalg.inv(T2)
    return T2_inv @ Hn @ T1


def _symmetric_transfer_cost(H_21, pts1, pts2, sigma: float):
    """[..., N] residual test: reference homography_solver::check_inliers."""
    H_12 = jnp.linalg.inv(H_21)

    def transfer(H, p):
        x = H[..., 0, 0] * p[..., 0] + H[..., 0, 1] * p[..., 1] + H[..., 0, 2]
        y = H[..., 1, 0] * p[..., 0] + H[..., 1, 1] * p[..., 1] + H[..., 1, 2]
        w = H[..., 2, 0] * p[..., 0] + H[..., 2, 1] * p[..., 1] + H[..., 2, 2]
        w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        return jnp.stack([x / w, y / w], axis=-1)

    d1 = jnp.sum((transfer(H_21[..., None, :, :], pts1) - pts2) ** 2, axis=-1)
    d2 = jnp.sum((transfer(H_12[..., None, :, :], pts2) - pts1) ** 2, axis=-1)
    dist_sq = jnp.maximum(d1, d2)
    thr = CHI_SQ_2D * sigma * sigma
    inlier = dist_sq < thr
    cost = jnp.where(inlier, dist_sq, thr)
    return inlier, cost


def _find_core(key, pts1, pts2, match_valid, num_hypotheses: int,
               sigma: float, lo_rounds: int) -> HomographyResult:
    idx = ransac.sample_minimal_sets(key, match_valid, num_hypotheses, 4)
    s1 = ransac.gather_sets(pts1, idx)  # [B,4,2]
    s2 = ransac.gather_sets(pts2, idx)
    H = compute_H_21(s1, s2)  # [B,3,3]

    inlier, cost = _symmetric_transfer_cost(H, pts1[None], pts2[None], sigma)
    inlier = inlier & match_valid[None, :]
    cost = jnp.where(match_valid[None, :], cost, 0.0)
    num_in = jnp.sum(inlier, axis=-1)
    total = jnp.sum(cost, axis=-1)
    best, ok = ransac.select_best(total, num_in, 4)

    H_best = H[best]
    inl = inlier[best]
    # LO-RANSAC refit rounds: nonminimal re-estimate on the inliers of the
    # current model, kept when its consensus does not shrink
    for _ in range(lo_rounds):
        H_re = compute_H_21(pts1, pts2, valid=inl)
        in_re, _cost_re = _symmetric_transfer_cost(H_re, pts1, pts2, sigma)
        in_re = in_re & match_valid
        better = jnp.sum(in_re) >= jnp.sum(inl)
        H_best = jnp.where(better, H_re, H_best)
        inl = jnp.where(better, in_re, inl)
    total_b = jnp.where(ok, total[best], jnp.float32(3.0e38))
    return HomographyResult(H_best, inl, total_b, jnp.sum(inl), ok)


@partial(jax.jit, static_argnames=("num_hypotheses", "recompute"))
def find_via_ransac(
    key: jax.Array,
    pts1: jnp.ndarray,  # [N,2] undistorted keypoints (frame 1)
    pts2: jnp.ndarray,  # [N,2] matched keypoints (frame 2)
    match_valid: jnp.ndarray,  # [N] bool
    *,
    num_hypotheses: int = 256,
    sigma: float = 1.0,
    recompute: bool = True,
) -> HomographyResult:
    return _find_core(key, pts1, pts2, match_valid, num_hypotheses, sigma,
                      1 if recompute else 0)


@partial(jax.jit, static_argnames=("num_hypotheses", "num_chunks", "lo_rounds"))
def find_via_ransac_escalated(
    key: jax.Array, pts1, pts2, match_valid, *, num_hypotheses: int = 4096,
    num_chunks: int = 8, sigma: float = 1.0, lo_rounds: int = 3,
) -> HomographyResult:
    """Low-inlier fallback (see ransac.escalate_scan and the initializer)."""
    return ransac.escalate_scan(
        lambda k: _find_core(k, pts1, pts2, match_valid, num_hypotheses,
                             sigma, lo_rounds),
        key, num_chunks)


def decompose(H_21: jnp.ndarray):
    """Faugeras SVD-based decomposition into 8 motion hypotheses
    (reference homography_solver::decompose). Returns (R [8,3,3], t [8,3],
    n [8,3], valid [8])."""
    U, S, Vt = jnp.linalg.svd(H_21)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    # degenerate when singular values are not distinct
    ok = (d1 / jnp.maximum(d2, 1e-12) > 1.0001) & (d2 / jnp.maximum(d3, 1e-12) > 1.0001)

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux_sin = jnp.sqrt(
        jnp.maximum(
            (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0
        )
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_theta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)

    aux_sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_phi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)

    Rs, ts, ns = [], [], []
    for e1 in (1.0, -1.0):
        for e2 in (1.0, -1.0):
            # d' = +d2 case (rotation about y)
            st = e1 * e2 * aux_sin
            ct = cos_theta
            Rp = jnp.array(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
            )
            Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st).at[2, 0].set(st).at[2, 2].set(ct)
            tp = jnp.stack([e1 * aux1, 0.0 * d1, -e2 * aux3]) * (d1 - d3)
            npl = jnp.stack([e1 * aux1, 0.0 * d1, e2 * aux3])
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
            ns.append(Vt.T @ npl)
    for e1 in (1.0, -1.0):
        for e2 in (1.0, -1.0):
            # d' = -d2 case (rotation about y by pi-phi + reflection)
            sp = e1 * e2 * aux_sin_p
            cp = cos_phi
            Rp = jnp.array(
                [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]]
            )
            Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sp).at[2, 0].set(sp).at[2, 2].set(-cp)
            tp = jnp.stack([e1 * aux1, 0.0 * d1, e2 * aux3]) * (d1 + d3)
            npl = jnp.stack([e1 * aux1, 0.0 * d1, e2 * aux3])
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
            ns.append(Vt.T @ npl)
    R = jnp.stack(Rs)
    t = jnp.stack(ts)
    n = jnp.stack(ns)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    return R, t, n, jnp.broadcast_to(ok, (8,))
