"""Batched 8-point fundamental-matrix RANSAC.

Reference: src/stella_vslam/solve/fundamental_solver.{h,cc} — 8-point minimal
with Hartley normalization, rank-2 projection, symmetric epipolar-distance
scoring with chi2 = 5.991 capping (fundamental_solver.cc:147-200), best =
min cost with > 8 inliers, nonminimal recompute, decomposition via the
essential matrix (F -> E with K).
"""
from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops.solve import ransac
from stella_vslam_tpu.ops.solve.homography import _normalize

CHI_SQ = 5.991


class FundamentalResult(NamedTuple):
    F_21: jnp.ndarray
    is_inlier: jnp.ndarray
    cost: jnp.ndarray
    num_inliers: jnp.ndarray
    valid: jnp.ndarray


def compute_F_21(pts1: jnp.ndarray, pts2: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Normalized 8-point algorithm on [..., k, 2] pairs, batched."""
    n1, T1 = _normalize(pts1, valid)
    n2, T2 = _normalize(pts2, valid)
    x1, y1 = n1[..., 0], n1[..., 1]
    x2, y2 = n2[..., 0], n2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # [..., k, 9]
    if valid is not None:
        A = A * valid[..., None].astype(A.dtype)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    f = ransac.smallest_eigvec_sym(AtA)
    Fn = f.reshape(f.shape[:-1] + (3, 3))
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(Fn)
    S = S.at[..., 2].set(0.0)
    Fn = U @ (S[..., :, None] * Vt)
    return jnp.swapaxes(T2, -1, -2) @ Fn @ T1


def _epipolar_cost(F_21, pts1, pts2, sigma: float):
    """Symmetric point-epiline distances (reference check_inliers)."""
    ones = jnp.ones_like(pts1[..., :1])
    p1 = jnp.concatenate([pts1, ones], axis=-1)
    p2 = jnp.concatenate([pts2, ones], axis=-1)
    l2 = jnp.einsum("...ij,...nj->...ni", F_21, p1)  # epiline in img2
    l1 = jnp.einsum("...ji,...nj->...ni", F_21, p2)  # epiline in img1
    d2 = jnp.einsum("...ni,...ni->...n", p2, l2) ** 2 / (
        l2[..., 0] ** 2 + l2[..., 1] ** 2 + 1e-12
    )
    d1 = jnp.einsum("...ni,...ni->...n", p1, l1) ** 2 / (
        l1[..., 0] ** 2 + l1[..., 1] ** 2 + 1e-12
    )
    dist_sq = jnp.maximum(d1, d2)
    thr = CHI_SQ * sigma * sigma
    inlier = dist_sq < thr
    return inlier, jnp.where(inlier, dist_sq, thr)


def _find_core(key, pts1, pts2, match_valid, num_hypotheses: int,
               sigma: float, lo_rounds: int) -> FundamentalResult:
    idx = ransac.sample_minimal_sets(key, match_valid, num_hypotheses, 8)
    s1 = ransac.gather_sets(pts1, idx)
    s2 = ransac.gather_sets(pts2, idx)
    F = compute_F_21(s1, s2)

    inlier, cost = _epipolar_cost(F, pts1[None], pts2[None], sigma)
    inlier = inlier & match_valid[None, :]
    cost = jnp.where(match_valid[None, :], cost, 0.0)
    num_in = jnp.sum(inlier, axis=-1)
    total = jnp.sum(cost, axis=-1)
    best, ok = ransac.select_best(total, num_in, 8)

    F_best = F[best]
    inl = inlier[best]
    # LO-RANSAC refit rounds (see essential._find_core)
    for _ in range(lo_rounds):
        F_re = compute_F_21(pts1, pts2, valid=inl)
        in_re, _ = _epipolar_cost(F_re, pts1, pts2, sigma)
        in_re = in_re & match_valid
        better = jnp.sum(in_re) >= jnp.sum(inl)
        F_best = jnp.where(better, F_re, F_best)
        inl = jnp.where(better, in_re, inl)
    total_b = jnp.where(ok, total[best], jnp.float32(3.0e38))
    return FundamentalResult(F_best, inl, total_b, jnp.sum(inl), ok)


@partial(jax.jit, static_argnames=("num_hypotheses", "recompute"))
def find_via_ransac(
    key: jax.Array,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    match_valid: jnp.ndarray,
    *,
    num_hypotheses: int = 256,
    sigma: float = 1.0,
    recompute: bool = True,
) -> FundamentalResult:
    return _find_core(key, pts1, pts2, match_valid, num_hypotheses, sigma,
                      1 if recompute else 0)


@partial(jax.jit, static_argnames=("num_hypotheses", "num_chunks", "lo_rounds"))
def find_via_ransac_escalated(
    key: jax.Array, pts1, pts2, match_valid, *, num_hypotheses: int = 4096,
    num_chunks: int = 8, sigma: float = 1.0, lo_rounds: int = 3,
) -> FundamentalResult:
    """Low-inlier fallback: chunked 32k-hypothesis sweep with LO refits
    (see ransac.escalate_scan); used by the initializer when the standard
    batch's consensus ratio lands below the measured 8-point crossover."""
    return ransac.escalate_scan(
        lambda k: _find_core(k, pts1, pts2, match_valid, num_hypotheses,
                             sigma, lo_rounds),
        key, num_chunks)


def essential_from_fundamental(F_21: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray):
    """E = K2^T F K1 (reference fundamental_solver decompose path)."""
    return K2.T @ F_21 @ K1
