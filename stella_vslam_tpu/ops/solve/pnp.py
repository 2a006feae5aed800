"""Batched PnP RANSAC on bearing vectors.

Reference: src/stella_vslam/solve/pnp_solver.{h,cc} — EPnP minimal sets (4 pts)
+ RANSAC with a scale-aware angular inlier test (1 deg * scale_factor[octave],
pnp_solver.cc:26-33,126-153), Gauss-Newton refinement, min inlier gate.

TPU-native formulation: hypotheses solved with a calibrated DLT (6-point) —
batched 12x12 symmetric eigendecompositions, then orthogonal Procrustes to
extract (R, t). EPnP's control-point parametrization exists to make the
per-hypothesis cost O(n) on a CPU; on TPU the batched DLT is one fused eigh
over all hypotheses, and final polish happens in the GN pose optimizer
(optimize/pose.py) exactly as the reference refines with g2o afterwards.
"""
from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.solve import ransac

MIN_SET_SIZE = 6


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
    R, t = compute_pose_dlt(sb, sp)  # [B,3,3], [B,3]

    inlier, cost = check_inliers(R, t, bearings[None], pos_w[None], max_cos[None])
    inlier = inlier & match_valid[None, :]
    cost = jnp.where(match_valid[None, :], cost, 0.0)
    num_in = jnp.sum(inlier, axis=-1)
    total = jnp.sum(cost, axis=-1)
    best, ok = ransac.select_best(total, num_in, MIN_SET_SIZE)

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
