"""Sim(3) optimizers: two-view transform refinement and pose-graph optimization.

References:
* src/stella_vslam/optimize/transform_optimizer.{h,cc} — Sim3 (or SE3 when
  fix_scale) between two keyframes with mutual forward/backward reprojection
  edges, Huber(sqrt(chi_sq)), outlier pruning + second pass; used during loop
  validation.
* src/stella_vslam/optimize/graph_optimizer.{h,cc} — Sim3 pose-graph over the
  essential graph (spanning tree + loop edges + high-weight covisibilities);
  measurement for edge (1,2) is Sim3_21 = Sim3_2w * Sim3_w1
  (graph_optimizer.cc:119); after optimization SE3 poses are recovered by
  dividing translation by scale (graph_optimizer.cc tail).

TPU-native design: residual Jacobians come from jax.jacfwd of the exact Sim3
log-residual at zero left-perturbation — batched with vmap over edges — and
the normal equations are assembled by segment-sum into a dense [7K, 7K]
system solved on the MXU. The pose graph runs once per loop closure; density
at SLAM scales (K <= ~1k) is cheaper than sparse CPU Cholesky.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops import linalg as linalg_small

CHI_SQ_2D = 9.210  # reference loop validation uses chi_sq=10 for Sim3 edges;
# transform_optimizer is called with chi_sq passed by the caller.


# ---------------------------------------------------------------------------
# Sim3 transform optimizer (two keyframes)
# ---------------------------------------------------------------------------


class TransformResult(NamedTuple):
    s_12: jnp.ndarray
    R_12: jnp.ndarray
    t_12: jnp.ndarray
    is_inlier: jnp.ndarray  # [N]
    num_inliers: jnp.ndarray


def _project_pixel(Xc, fx, fy, cx, cy):
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-6, 1e-6, Xc[..., 2])
    return jnp.stack(
        [fx * Xc[..., 0] / z + cx, fy * Xc[..., 1] / z + cy], axis=-1
    )


@partial(jax.jit, static_argnames=("fix_scale", "num_iter"))
def optimize_transform(
    s12_init: jnp.ndarray,
    R12_init: jnp.ndarray,
    t12_init: jnp.ndarray,
    pts_in_1: jnp.ndarray,  # [N,3] landmark positions in keyframe-1 camera frame
    pts_in_2: jnp.ndarray,  # [N,3] matched landmark positions in kf-2 camera frame
    obs_1: jnp.ndarray,  # [N,2] undistorted pixel observation in kf 1
    obs_2: jnp.ndarray,  # [N,2] undistorted pixel observation in kf 2
    inv_sigma_sq_1: jnp.ndarray,  # [N]
    inv_sigma_sq_2: jnp.ndarray,  # [N]
    valid: jnp.ndarray,  # [N]
    fx, fy, cx, cy,
    *,
    chi_sq: float = 9.966,  # reference loop_detector calls with 10*... see caller
    fix_scale: bool = False,
    num_iter: int = 10,
):
    """Mutual-reprojection Sim3 refinement (reference transform_optimizer).
    State xi in sim3 tangent (7; scale component frozen when fix_scale)."""

    def unpack(xi, s, R, t):
        ds, dR, dt = lie.sim3_exp(xi)
        if fix_scale:
            ds = jnp.ones_like(ds)
        return lie.sim3_compose(ds, dR, dt, s, R, t)

    def residuals(s, R, t):
        # forward: point in 2 -> frame 1 via S_12, project into 1
        p1 = lie.sim3_apply(s[None], R, t, pts_in_2)
        r1 = _project_pixel(p1, fx, fy, cx, cy) - obs_1
        # backward: point in 1 -> frame 2 via S_21
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        p2 = lie.sim3_apply(si[None], Ri, ti, pts_in_1)
        r2 = _project_pixel(p2, fx, fy, cx, cy) - obs_2
        return r1, r2, p1[..., 2] > 1e-4, p2[..., 2] > 1e-4

    def chi2_of(s, R, t):
        r1, r2, ok1, ok2 = residuals(s, R, t)
        c1 = jnp.sum(r1 * r1, axis=-1) * inv_sigma_sq_1
        c2 = jnp.sum(r2 * r2, axis=-1) * inv_sigma_sq_2
        return c1, c2, ok1 & ok2

    def step(carry, _):
        s, R, t, inlier = carry

        def cost_vec(xi):
            s2, R2, t2 = unpack(xi, s, R, t)
            r1, r2, _, _ = residuals(s2, R2, t2)
            w1 = jnp.sqrt(inv_sigma_sq_1 * inlier)
            w2 = jnp.sqrt(inv_sigma_sq_2 * inlier)
            return jnp.concatenate(
                [(r1 * w1[:, None]).reshape(-1), (r2 * w2[:, None]).reshape(-1)]
            )

        xi0 = jnp.zeros(7)
        J = jax.jacfwd(cost_vec)(xi0)  # [2N*2, 7]
        r = cost_vec(xi0)
        H = J.T @ J + 1e-6 * jnp.eye(7)
        b = J.T @ r
        dx = -linalg_small.solve_spd_unrolled(H, b)
        s2, R2, t2 = unpack(dx, s, R, t)
        # accept if cost decreases
        better = jnp.sum(cost_vec(dx) ** 2) <= jnp.sum(r * r)
        s = jnp.where(better, s2, s)
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        c1, c2, ok = chi2_of(s, R, t)
        inlier = valid.astype(jnp.float32) * (
            (c1 <= chi_sq) & (c2 <= chi_sq) & ok
        ).astype(jnp.float32)
        return (s, R, t, inlier), None

    inl0 = valid.astype(jnp.float32)
    (s, R, t, inlier), _ = jax.lax.scan(
        step, (s12_init, R12_init, t12_init, inl0), None, length=num_iter
    )
    return TransformResult(
        s_12=s, R_12=R, t_12=t,
        is_inlier=inlier > 0.5, num_inliers=jnp.sum(inlier > 0.5),
    )


# ---------------------------------------------------------------------------
# Sim3 pose-graph optimizer
# ---------------------------------------------------------------------------


class PoseGraphResult(NamedTuple):
    s_cw: jnp.ndarray  # [K]
    R_cw: jnp.ndarray  # [K,3,3]
    t_cw: jnp.ndarray  # [K,3]


def _edge_residual(xi_i, xi_j, s_i, R_i, t_i, s_j, R_j, t_j, sm, Rm, tm):
    """r = log_sim3( S_meas^-1 o S_i o S_j^-1 ) with S_k <- Exp(xi_k) S_k.

    Measurement convention: S_meas = S_i_cw o S_j_cw^-1 ("i from j"), computed
    by the caller at the non-corrected relative pose (graph_optimizer.cc:119
    builds the same relative Sim3, transposed naming)."""
    ds_i, dR_i, dt_i = lie.sim3_exp(xi_i)
    ds_j, dR_j, dt_j = lie.sim3_exp(xi_j)
    si, Ri, ti = lie.sim3_compose(ds_i, dR_i, dt_i, s_i, R_i, t_i)
    sj, Rj, tj = lie.sim3_compose(ds_j, dR_j, dt_j, s_j, R_j, t_j)
    sij, Rij, tij = lie.sim3_compose(si, Ri, ti, *lie.sim3_inverse(sj, Rj, tj))
    se, Re, te = lie.sim3_compose(*lie.sim3_inverse(sm, Rm, tm), sij, Rij, tij)
    return lie.sim3_log(se, Re, te)


@partial(jax.jit, static_argnames=("num_iter",))
def optimize_pose_graph(
    s_cw: jnp.ndarray,  # [K] initial scales (1 for uncorrected)
    R_cw: jnp.ndarray,  # [K,3,3]
    t_cw: jnp.ndarray,  # [K,3]
    fixed: jnp.ndarray,  # [K] bool (gauge: origin keyframe)
    valid: jnp.ndarray,  # [K] bool
    edge_i: jnp.ndarray,  # [E] i32
    edge_j: jnp.ndarray,  # [E] i32
    edge_s: jnp.ndarray,  # [E] measured S_ij = S_i_cw o S_j_cw^-1 scale
    edge_R: jnp.ndarray,  # [E,3,3]
    edge_t: jnp.ndarray,  # [E,3]
    edge_valid: jnp.ndarray,  # [E] bool
    *,
    num_iter: int = 20,
):
    """Gauss-Newton over the essential graph (reference graph_optimizer.cc).
    Measurement convention: S_ij such that r = log(S_ij o S_j o S_i^-1) -> 0,
    i.e. S_ij = S_i_cw o S_j_cw^-1 at the (non-corrected) input estimates."""
    K = s_cw.shape[0]
    E = edge_i.shape[0]

    def res_and_jac(s_i, R_i, t_i, s_j, R_j, t_j, sm, Rm, tm):
        def f(xi_ij):
            return _edge_residual(
                xi_ij[:7], xi_ij[7:], s_i, R_i, t_i, s_j, R_j, t_j, sm, Rm, tm
            )

        xi0 = jnp.zeros(14)
        return f(xi0), jax.jacfwd(f)(xi0)

    batched_rj = jax.vmap(res_and_jac)

    def gn_step(carry, _):
        s_cur, R_cur, t_cur = carry
        ik = jax.lax.broadcasted_iota(jnp.int32, (E, K), 1)
        oh_i = (edge_i[:, None] == ik).astype(jnp.float32)
        oh_j = (edge_j[:, None] == ik).astype(jnp.float32)
        s_i = oh_i @ s_cur
        R_i = jnp.einsum("ek,kab->eab", oh_i, R_cur)
        t_i = oh_i @ t_cur
        s_j = oh_j @ s_cur
        R_j = jnp.einsum("ek,kab->eab", oh_j, R_cur)
        t_j = oh_j @ t_cur

        r, J = batched_rj(s_i, R_i, t_i, s_j, R_j, t_j, edge_s, edge_R, edge_t)
        w = edge_valid.astype(jnp.float32)
        r = r * w[:, None]
        J = J * w[:, None, None]
        J_i, J_j = J[:, :, :7], J[:, :, 7:]  # [E,7,7] each

        # assemble H [K,K,7,7] and b [K,7] by segment-sum over edges
        seg_ii = edge_i * K + edge_i
        seg_ij = edge_i * K + edge_j
        seg_jj = edge_j * K + edge_j
        blocks = jnp.concatenate(
            [
                jnp.einsum("epi,epj->eij", J_i, J_i).reshape(E, 49),
                jnp.einsum("epi,epj->eij", J_i, J_j).reshape(E, 49),
                jnp.einsum("epi,epj->eij", J_j, J_j).reshape(E, 49),
            ],
            axis=0,
        )
        segs = jnp.concatenate([seg_ii, seg_ij, seg_jj], axis=0)
        Hflat = jax.ops.segment_sum(blocks, segs, num_segments=K * K)
        H = Hflat.reshape(K, K, 7, 7)
        # we accumulated (i,i), (i,j), (j,j); mirror (i,j) -> (j,i) without
        # double-counting the diagonal blocks (which are symmetric JtJ)
        eyeK_b = jnp.eye(K)[:, :, None, None]
        HT = jnp.transpose(H, (1, 0, 3, 2))
        H = H + HT - H * eyeK_b

        b_blocks = jnp.concatenate(
            [
                jnp.einsum("epi,ep->ei", J_i, r),
                jnp.einsum("epi,ep->ei", J_j, r),
            ],
            axis=0,
        )
        b_segs = jnp.concatenate([edge_i, edge_j], axis=0)
        b = jax.ops.segment_sum(b_blocks, b_segs, num_segments=K)

        free = (valid & ~fixed).astype(jnp.float32)
        eyeK = jnp.eye(K)[:, :, None, None]
        eye7 = jnp.eye(7)[None, None]
        H = H * free[:, None, None, None] * free[None, :, None, None]
        H = H + eyeK * ((1.0 - free)[:, None, None, None] * eye7)
        H = H + eyeK * (1e-6 * eye7)
        b = b * free[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        dx = -linalg_small.solve_spd_blocked(Hd, b.reshape(-1)).reshape(K, 7)
        dx = dx * free[:, None]

        ds, dR, dt = lie.sim3_exp(dx)
        s_new, R_new, t_new = lie.sim3_compose(ds, dR, dt, s_cur, R_cur, t_cur)
        return (s_new, R_new, t_new), jnp.sum(r * r)

    (s_f, R_f, t_f), _ = jax.lax.scan(
        gn_step, (s_cw, R_cw, t_cw), None, length=num_iter
    )
    return PoseGraphResult(s_cw=s_f, R_cw=R_f, t_cw=t_f)
