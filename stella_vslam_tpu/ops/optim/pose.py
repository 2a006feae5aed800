"""Motion-only pose optimization (the reference's pose_optimizer) in JAX.

Reference: src/stella_vslam/optimize/pose_optimizer_g2o.cc:23-178 —
(num_trials_robust + num_trials) rounds x num_each_iter LM iterations
(defaults 2, 2, 10); per-round chi-square inlier reclassification at
chi2(0.05) 5.991 (2 dof) / 7.815 (3 dof); Huber kernel (delta = sqrt(chi2))
active only during the robust rounds.

TPU-native form: the whole schedule is ONE jitted fixed-shape program —
lax.fori_loop over rounds and LM iterations, 6x6 normal equations from batched
residual/Jacobian evaluation (ops/optim/residuals.py), branch-free outlier
masks. No dynamic edge sets: all N observation slots flow through with weights.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.optim import residuals as res_mod
from stella_vslam_tpu.ops import linalg as linalg_small

CHI_SQ_2D = 5.991
CHI_SQ_3D = 7.815


class PoseOptResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    is_inlier: jnp.ndarray  # [N] bool (final chi-square classification)
    num_inliers: jnp.ndarray  # scalar i32
    chi_sq: jnp.ndarray  # [N] final per-obs chi-square


@partial(jax.jit, static_argnames=("model", "num_rounds", "num_robust_rounds", "num_each_iter"))
def optimize_pose(
    R_init: jnp.ndarray,
    t_init: jnp.ndarray,
    pos_w: jnp.ndarray,  # [N,3] associated landmark positions
    obs_uv: jnp.ndarray,  # [N,2] undistorted observations
    obs_x_right: jnp.ndarray,  # [N] stereo x_right (<0 mono)
    inv_sigma_sq: jnp.ndarray,  # [N] information scale per obs (1/sigma^2)
    valid: jnp.ndarray,  # [N] bool: slot has an association
    cam: res_mod.CamScalars,
    *,
    model: str = "perspective",
    num_rounds: int = 4,
    num_robust_rounds: int = 2,
    num_each_iter: int = 10,
) -> PoseOptResult:
    res_fn = res_mod.RESIDUAL_FNS[model]
    is_stereo_obs = obs_x_right > 0
    chi_thr = jnp.where(is_stereo_obs, CHI_SQ_3D, CHI_SQ_2D)
    sqrt_chi = jnp.sqrt(chi_thr)

    def chi2_of(R, t):
        r, _, _, dof, depth_ok = res_fn(R, t, pos_w, obs_uv, obs_x_right, cam)
        chi2 = jnp.sum(r * r * dof, axis=-1) * inv_sigma_sq
        return chi2, depth_ok

    def lm_round(carry, round_idx):
        R, t, inlier = carry
        use_huber = round_idx < num_robust_rounds

        def lm_iter(carry2, _):
            R, t, lam = carry2
            r, J, _, dof, depth_ok = res_fn(R, t, pos_w, obs_uv, obs_x_right, cam)
            w_obs = (valid & inlier & depth_ok).astype(jnp.float32) * inv_sigma_sq
            chi = jnp.sqrt(jnp.maximum(jnp.sum(r * r * dof, axis=-1) * inv_sigma_sq, 1e-12))
            huber_w = jnp.where(
                use_huber & (chi > sqrt_chi), sqrt_chi / chi, 1.0
            )
            w = w_obs * huber_w  # [N]
            Jw = J * (dof * w[:, None])[:, :, None]  # weight rows
            H = jnp.einsum("nki,nkj->ij", Jw, J)
            b = jnp.einsum("nki,nk->i", Jw, r)
            cost0 = jnp.sum(w * jnp.sum(r * r * dof, axis=-1))

            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            dx = -linalg_small.solve_spd_unrolled(Hd, b)
            R_new, t_new = lie.se3_update_left(R, t, dx)
            r2, _, _, dof2, dok2 = res_fn(R_new, t_new, pos_w, obs_uv, obs_x_right, cam)
            chi_n = jnp.sqrt(jnp.maximum(jnp.sum(r2 * r2 * dof2, axis=-1) * inv_sigma_sq, 1e-12))
            hub_n = jnp.where(use_huber & (chi_n > sqrt_chi), sqrt_chi / chi_n, 1.0)
            w_n = (valid & inlier & dok2).astype(jnp.float32) * inv_sigma_sq * hub_n
            cost1 = jnp.sum(w_n * jnp.sum(r2 * r2 * dof2, axis=-1))
            improved = cost1 < cost0
            R = jnp.where(improved, R_new, R)
            t = jnp.where(improved, t_new, t)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-9, 1e6)
            return (R, t, lam), None

        (R, t, _), _ = jax.lax.scan(
            lm_iter, (R, t, jnp.float32(1e-4)), None, length=num_each_iter
        )
        # re-classify inliers for the next round (pose_optimizer_g2o.cc:136-147)
        chi2, depth_ok = chi2_of(R, t)
        inlier = valid & depth_ok & (chi2 <= chi_thr)
        return (R, t, inlier), None

    inlier0 = valid
    (R, t, inlier), _ = jax.lax.scan(
        lm_round, (R_init, t_init, inlier0), jnp.arange(num_rounds), length=num_rounds
    )
    chi2, _ = chi2_of(R, t)
    return PoseOptResult(
        R_cw=R, t_cw=t, is_inlier=inlier,
        num_inliers=jnp.sum(inlier), chi_sq=chi2,
    )
