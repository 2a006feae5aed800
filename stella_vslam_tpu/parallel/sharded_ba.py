"""Multi-chip bundle adjustment: observation-sharded GN over a device mesh.

The reference is single-process shared-memory (SURVEY.md 2.10 — no distributed
runtime). The TPU-native scaling story for the heaviest computation (global /
large local BA) is data parallelism over the landmark-major observation
table: each device owns a shard of landmarks (and all their observations),
computes its partial reduced-camera system (Schur complement pieces), and a
psum over the mesh assembles the full [K*6, K*6] system, solved replicated;
landmark back-substitution stays local to each shard. Camera poses are
replicated (small), landmark state is sharded — the same layout scaling-book
recipe as data-parallel training with replicated parameters.

Communication per GN iteration: one psum of [K,K,6,6] + [K,6] (a few MB at
K<=256) over ICI — independent of the number of landmarks.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops import linalg as linalg_small
from stella_vslam_tpu.ops.optim import ba as ba_mod
from stella_vslam_tpu.ops.optim.residuals import CamScalars


# ---------------------------------------------------------------------------
# Production path: the FULL bundle_adjust schedule (robust LM + outlier
# reclassification) sharded over the mesh via GSPMD — shard the landmark-major
# inputs, replicate the camera state, and let XLA's SPMD partitioner insert
# the all-reduces for every cross-shard contraction (Hcc / b_c / S_red
# assembly inside ops/optim/ba.py). Same program, same numerics (up to
# partial-sum order), N-chip scaling. global_optimization_module routes its
# global / loop BA through this whenever more than one device is visible.
# ---------------------------------------------------------------------------

def default_mesh() -> Optional[Mesh]:
    """1-D 'data' mesh over all visible devices; None when single-device."""
    devs = jax.devices()
    if len(devs) < 2:
        return None
    return Mesh(np.array(devs), axis_names=("data",))


def sharded_bundle_adjust(
    prob: ba_mod.BAProblem,
    cam: CamScalars,
    *,
    model: str = "perspective",
    num_first: int = 5,
    num_second: int = 10,
    mesh: Optional[Mesh] = None,
) -> ba_mod.BAResult:
    """bundle_adjust over a device mesh: landmark rows sharded on axis
    'data', cameras replicated. Falls back to the single-device program when
    no mesh is available. Rows are padded to a multiple of the mesh size and
    the result is sliced back."""
    if mesh is None:
        mesh = default_mesh()
    if mesh is None:
        return ba_mod.bundle_adjust(
            prob, cam, model=model, num_first=num_first, num_second=num_second)
    n = mesh.devices.size
    L = prob.lm_pos.shape[0]
    pad = (-L) % n
    if pad:
        def pad_rows(x):
            if x is None:
                return None
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        prob = prob._replace(
            lm_pos=pad_rows(prob.lm_pos), lm_valid=pad_rows(prob.lm_valid),
            obs_cam=pad_rows(prob.obs_cam), obs_uv=pad_rows(prob.obs_uv),
            obs_x_right=pad_rows(prob.obs_x_right),
            obs_inv_sigma_sq=pad_rows(prob.obs_inv_sigma_sq),
            obs_valid=pad_rows(prob.obs_valid),
            lm_fixed=pad_rows(prob.lm_fixed),
            lm_keep_inlier=pad_rows(prob.lm_keep_inlier),
        )
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        return None if x is None else jax.device_put(x, sh)

    prob_sh = ba_mod.BAProblem(
        cam_R=put(prob.cam_R, rep), cam_t=put(prob.cam_t, rep),
        cam_fixed=put(prob.cam_fixed, rep), cam_valid=put(prob.cam_valid, rep),
        lm_pos=put(prob.lm_pos, data), lm_valid=put(prob.lm_valid, data),
        obs_cam=put(prob.obs_cam, data), obs_uv=put(prob.obs_uv, data),
        obs_x_right=put(prob.obs_x_right, data),
        obs_inv_sigma_sq=put(prob.obs_inv_sigma_sq, data),
        obs_valid=put(prob.obs_valid, data),
        lm_fixed=put(prob.lm_fixed, data),
        lm_keep_inlier=put(prob.lm_keep_inlier, data),
    )
    cam_sh = jax.tree.map(lambda x: jax.device_put(x, rep), cam)
    res = ba_mod.bundle_adjust(
        prob_sh, cam_sh, model=model, num_first=num_first,
        num_second=num_second)
    if pad:
        res = res._replace(lm_pos=res.lm_pos[:L],
                           obs_is_outlier=res.obs_is_outlier[:L])
    return res


def make_sharded_ba_step(mesh: Mesh, cam: CamScalars, model: str = "perspective"):
    """Returns a jitted function (prob: BAProblem) -> BAProblem with one GN
    step applied; landmark-major arrays sharded over mesh axis 'data'."""

    data_spec = P("data")
    rep = P()

    def shard_fn(
        cam_R, cam_t, cam_fixed, cam_valid,
        lm_pos, lm_valid, obs_cam, obs_uv, obs_xr, obs_w, obs_valid,
    ):
        prob = ba_mod.BAProblem(
            cam_R=cam_R, cam_t=cam_t, cam_fixed=cam_fixed, cam_valid=cam_valid,
            lm_pos=lm_pos, lm_valid=lm_valid, obs_cam=obs_cam, obs_uv=obs_uv,
            obs_x_right=obs_xr, obs_inv_sigma_sq=obs_w, obs_valid=obs_valid,
        )
        K = cam_R.shape[0]
        r, Jc, Jp, dof, depth_ok, oh = ba_mod._residuals(
            prob, cam_R, cam_t, lm_pos, cam, model
        )
        w = (
            obs_valid & depth_ok & lm_valid[:, None]
        ).astype(jnp.float32) * obs_w
        Jc_w = Jc * (dof * w[..., None])[..., None]
        Jp_w = Jp * (dof * w[..., None])[..., None]

        Hpp = jnp.einsum("ldki,ldkj->lij", Jp_w, Jp)
        b_p = jnp.einsum("ldki,ldk->li", Jp_w, r)
        Hcc = jnp.einsum("ldk,ldri,ldrj->kij", oh, Jc_w, Jc)
        b_c = jnp.einsum("ldk,ldri,ldr->ki", oh, Jc_w, r)
        Wm = jnp.einsum("ldri,ldrj->ldij", Jc_w, Jp)

        lam = jnp.float32(1e-4)
        eye3 = jnp.eye(3)
        Hpp_d = Hpp + (lam * jnp.maximum(
            jnp.trace(Hpp, axis1=-2, axis2=-1) / 3.0, 1e-6
        )[:, None, None] + 1e-7) * eye3
        Hpp_inv = linalg_small.inv3x3(Hpp_d)
        V = jnp.einsum("ldij,ljk->ldik", Wm, Hpp_inv)
        Vk = jnp.einsum("ldk,ldij->lkij", oh, V)
        Wk = jnp.einsum("ldk,ldij->lkij", oh, Wm)
        S_red = jnp.einsum("lkia,lmja->kmij", Vk, Wk)
        rhs_red = jnp.einsum("lkij,lj->ki", Vk, b_p)

        # ---- cross-shard assembly: one psum each ----
        Hcc = jax.lax.psum(Hcc, "data")
        b_c = jax.lax.psum(b_c, "data")
        S_red = jax.lax.psum(S_red, "data")
        rhs_red = jax.lax.psum(rhs_red, "data")

        eye6 = jnp.eye(6)
        diag = lam * jnp.maximum(jnp.trace(Hcc, axis1=-2, axis2=-1) / 6.0, 1e-6)
        Hcc_d = Hcc + (diag[:, None, None] + 1e-7) * eye6
        eyeK = (
            jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        ).astype(jnp.float32)[:, :, None, None]
        S = -S_red + eyeK * Hcc_d[:, None, :, :]
        rhs = b_c - rhs_red

        free = (cam_valid & ~cam_fixed).astype(jnp.float32)
        S = S * free[:, None, None, None] * free[None, :, None, None]
        S = S + eyeK * ((1.0 - free)[:, None, None, None] * eye6[None])
        rhs = rhs * free[:, None]

        Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        dx = -linalg_small.solve_spd_blocked(Sd, rhs.reshape(-1)).reshape(K, 6)
        dx = dx * free[:, None]

        # local landmark back-substitution on this shard
        dx_o = jnp.einsum("ldk,ki->ldi", oh, dx)
        wtd = jnp.einsum("ldij,ldi->lj", Wm, dx_o)
        dp = -jnp.einsum("lij,lj->li", Hpp_inv, b_p + wtd)
        dp = dp * (lm_valid & (jnp.sum(w, axis=1) > 0))[:, None].astype(dp.dtype)

        dR, dt = lie.se3_exp(dx)
        cam_R_new, cam_t_new = lie.se3_compose(dR, dt, cam_R, cam_t)
        return cam_R_new, cam_t_new, lm_pos + dp

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, data_spec, data_spec, data_spec,
                  data_spec, data_spec, data_spec, data_spec),
        out_specs=(rep, rep, data_spec),
        check_vma=False,
    )

    @jax.jit
    def step(prob: ba_mod.BAProblem):
        cam_R, cam_t, lm_pos = sharded(
            prob.cam_R, prob.cam_t, prob.cam_fixed, prob.cam_valid,
            prob.lm_pos, prob.lm_valid, prob.obs_cam, prob.obs_uv,
            prob.obs_x_right, prob.obs_inv_sigma_sq, prob.obs_valid,
        )
        return prob._replace(cam_R=cam_R, cam_t=cam_t, lm_pos=lm_pos)

    return step
