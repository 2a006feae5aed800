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

        def eval_state(Rc, tc):
            """ONE residual+Jacobian evaluation -> (cost, H, b)."""
            r, J, _, dof, depth_ok = res_fn(Rc, tc, pos_w, obs_uv, obs_x_right, cam)
            w_obs = (valid & inlier & depth_ok).astype(jnp.float32) * inv_sigma_sq
            chi = jnp.sqrt(
                jnp.maximum(jnp.sum(r * r * dof, axis=-1) * inv_sigma_sq, 1e-12)
            )
            huber_w = jnp.where(use_huber & (chi > sqrt_chi), sqrt_chi / chi, 1.0)
            w = w_obs * huber_w  # [N]
            Jw = J * (dof * w[:, None])[:, :, None]  # weight rows
            H = jnp.einsum("nki,nkj->ij", Jw, J)
            b = jnp.einsum("nki,nk->i", Jw, r)
            cost = jnp.sum(w * jnp.sum(r * r * dof, axis=-1))
            return cost, H, b

        def lm_iter(carry2, _):
            """Deferred-acceptance LM: ONE residual/Jacobian evaluation per
            iteration — evaluating the trial pose doubles as the
            accept/reject test for the previous step (g2o's LM evaluates the
            new chi2 to accept; this fuses that with the next
            linearization), halving the per-iteration cost."""
            (R_b, t_b, cost_b, H_b, b_b, lam, R_try, t_try) = carry2
            cost_t, H_t, b_t = eval_state(R_try, t_try)
            accept = cost_t < cost_b
            R_b = jnp.where(accept, R_try, R_b)
            t_b = jnp.where(accept, t_try, t_b)
            H_b = jnp.where(accept, H_t, H_b)
            b_b = jnp.where(accept, b_t, b_b)
            cost_b = jnp.where(accept, cost_t, cost_b)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            Hd = H_b + lam * jnp.diag(jnp.diag(H_b)) + 1e-9 * jnp.eye(6)
            dx = -linalg_small.solve_spd_unrolled(Hd, b_b)
            R_n, t_n = lie.se3_update_left(R_b, t_b, dx)
            return (R_b, t_b, cost_b, H_b, b_b, lam, R_n, t_n), None

        cost0, H0, b0 = eval_state(R, t)
        Hd0 = H0 + 1e-4 * jnp.diag(jnp.diag(H0)) + 1e-9 * jnp.eye(6)
        dx0 = -linalg_small.solve_spd_unrolled(Hd0, b0)
        R1, t1 = lie.se3_update_left(R, t, dx0)
        (R, t, _, _, _, _, _, _), _ = jax.lax.scan(
            lm_iter,
            (R, t, cost0, H0, b0, jnp.float32(1e-4), R1, t1),
            None, length=num_each_iter,
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
