"""Reprojection residuals + analytic Jacobians for the GN/LM engines.

Replaces the reference's hand-derived g2o edge types
(src/stella_vslam/optimize/internal/se3/perspective_reproj_edge.h,
perspective_pose_opt_edge.h, equirectangular_*). Residual convention:

* perspective mono: r = [u, v] observed-undistorted - projected, 2 dof
* perspective stereo: r = [u, v, u_right], u_right = u - fx*baseline/z, 3 dof
* equirectangular: r = [u, v] in equirect pixel coords, 2 dof

Pose tangent layout xi = [rho(3), phi(3)] with LEFT-multiplicative updates
Exp(xi) * T_cw, matching ops/lie.se3_update_left. Jacobians are with respect
to xi (pose) and to the world point.

Everything is batched over observations: inputs [N, ...] -> residual [N, 3]
(third row zeroed for 2-dof), J_pose [N, 3, 6], J_point [N, 3, 3].
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from stella_vslam_tpu.ops import lie


class CamScalars(NamedTuple):
    """Static-ish camera scalars used by residuals (subset of CameraParams)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    focal_x_baseline: jnp.ndarray


def _dXc_dxi(Xc: jnp.ndarray) -> jnp.ndarray:
    """d(Xc)/d(xi) for Xc = Exp(xi) (R Xw + t): [N, 3, 6] = [I | -hat(Xc)]."""
    N = Xc.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), (N, 3, 3))
    return jnp.concatenate([eye, -lie.hat(Xc)], axis=-1)


def perspective_residual(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    pos_w: jnp.ndarray,  # [N,3]
    obs_uv: jnp.ndarray,  # [N,2] undistorted pixels
    obs_x_right: jnp.ndarray,  # [N] (<0 -> mono observation)
    cam: CamScalars,
):
    """Returns (r [N,3], J_pose [N,3,6], J_point [N,3,3], dof_mask [N,3],
    depth_ok [N])."""
    Xc = jnp.einsum("ij,nj->ni", R_cw, pos_w) + t_cw
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    u_r = u - cam.focal_x_baseline * iz

    has_stereo = obs_x_right > 0
    r = jnp.stack(
        [u - obs_uv[:, 0], v - obs_uv[:, 1],
         jnp.where(has_stereo, u_r - obs_x_right, 0.0)],
        axis=-1,
    )

    # d(pi)/d(Xc): [N,3,3]
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    row_r = jnp.stack(
        [cam.fx * iz, zero, -cam.fx * x * iz2 + cam.focal_x_baseline * iz2], axis=-1
    )
    dpi = jnp.stack([row_u, row_v, row_r], axis=-2)  # [N,3,3]

    J_pose = dpi @ _dXc_dxi(Xc)  # [N,3,6]
    J_point = dpi @ jnp.broadcast_to(R_cw, (Xc.shape[0], 3, 3))  # [N,3,3]

    dof = jnp.stack(
        [jnp.ones_like(z), jnp.ones_like(z), has_stereo.astype(z.dtype)], axis=-1
    )
    depth_ok = z > 1e-4
    return r, J_pose, J_point, dof, depth_ok


def equirectangular_residual(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    pos_w: jnp.ndarray,
    obs_uv: jnp.ndarray,  # [N,2] equirect pixel coords
    obs_x_right: jnp.ndarray,  # ignored (mono only)
    cam: CamScalars,
):
    """Equirectangular reprojection residual in pixel units with longitude
    wraparound (reference equirectangular_reproj_edge.h)."""
    Xc = jnp.einsum("ij,nj->ni", R_cw, pos_w) + t_cw
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    L = jnp.linalg.norm(Xc, axis=-1)
    L = jnp.where(L < 1e-8, 1e-8, L)
    xz2 = x * x + z * z
    xz2 = jnp.where(xz2 < 1e-12, 1e-12, xz2)

    ku = cam.width / (2.0 * jnp.pi)
    kv = cam.height / jnp.pi
    u = cam.cx + ku * jnp.arctan2(x, z)
    v = cam.cy + kv * jnp.arcsin(jnp.clip(y / L, -1.0, 1.0))

    du = u - obs_uv[:, 0]
    # longitude wraparound
    du = jnp.mod(du + cam.width / 2.0, cam.width) - cam.width / 2.0
    dv = v - obs_uv[:, 1]
    r = jnp.stack([du, dv, jnp.zeros_like(du)], axis=-1)

    zero = jnp.zeros_like(x)
    row_u = jnp.stack([ku * z / xz2, zero, -ku * x / xz2], axis=-1)
    L2 = L * L
    denom = L2 * jnp.sqrt(xz2)
    row_v = jnp.stack(
        [-kv * x * y / denom, kv * jnp.sqrt(xz2) / L2, -kv * z * y / denom], axis=-1
    )
    dpi = jnp.stack([row_u, row_v, jnp.zeros_like(row_u)], axis=-2)

    J_pose = dpi @ _dXc_dxi(Xc)
    J_point = dpi @ jnp.broadcast_to(R_cw, (Xc.shape[0], 3, 3))
    dof = jnp.stack([jnp.ones_like(z), jnp.ones_like(z), zero], axis=-1)
    depth_ok = L > 1e-6  # every direction is observable
    return r, J_pose, J_point, dof, depth_ok


RESIDUAL_FNS = {
    "perspective": perspective_residual,
    "fisheye": perspective_residual,  # on undistorted coords (reference
    # reuses perspective edges for fisheye/radial division,
    # se3/reproj_edge_wrapper.h)
    "radial_division": perspective_residual,
    "equirectangular": equirectangular_residual,
}
