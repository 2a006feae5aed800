"""SO(3) / SE(3) / Sim(3) Lie-group operations as pure JAX functions.

TPU-native replacement for the reference's Eigen/g2o pose algebra
(reference: src/stella_vslam/util/converter.{h,cc}, g2o SE3Quat / Sim3 types used in
optimize/internal/*). Everything here is branch-free, fixed-shape, f32, and safe
under jit/vmap/grad: small-angle cases are handled with Taylor switches via
jnp.where on a safe denominator, never Python control flow.

Conventions
-----------
* Rotations are 3x3 matrices, poses are (R, t) pairs; camera-from-world ("cw")
  unless stated otherwise, matching the reference's pose_cw convention
  (reference: src/stella_vslam/data/frame.h:36-206).
* se3 tangent vector xi = [rho(3), phi(3)] (translation first, rotation second).
* sim3 tangent vector = [rho(3), phi(3), sigma(1)] with scale s = exp(sigma).
* exp uses the LEFT Jacobian convention: Exp(xi) = (exp(phi), J_l(phi) rho).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [3] -> [3,3] skew-symmetric (batched over leading dims)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_project(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize a near-rotation matrix onto SO(3) via Gram-Schmidt
    (batched over leading dims). Needed wherever rotations chain across many
    f32 matrix products (e.g. the on-device pose chain): using R^T as the
    inverse of a slightly off-manifold R AMPLIFIES the error each step —
    measured ~3x/frame, i.e. exponential divergence of the tracked pose —
    so chained rotations must be projected back once per step."""
    r0 = R[..., 0, :]
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0, axis=-1, keepdims=True), 1e-12)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r0 * r1, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-12)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3]. Stable up to theta < pi - eps."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta[..., None] < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta[..., None] ** 2 / 12.0,
        theta[..., None] / (2.0 * jnp.sin(theta[..., None])),
    )
    return factor * w


def _so3_left_jacobian_terms(phi: jnp.ndarray):
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # J_l = I + b K + c K^2 ; b = (1-cos)/t^2, c = (t - sin t)/t^3
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    return b, c


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    b, c = _so3_left_jacobian_terms(phi)
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * (K @ K)


def so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    half = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / theta2,
    )
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_term * (K @ K)


def se3_exp(xi: jnp.ndarray):
    """[..., 6] (rho, phi) -> (R [...,3,3], t [...,3])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    J = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    phi = so3_log(R)
    Jinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): apply b then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, p):
    """Transform points p [..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_matrix(R, t):
    """(R,t) -> 4x4 homogeneous matrix."""
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


def se3_update_left(R, t, xi):
    """Left-multiplicative update Exp(xi) * (R, t) — the GN/LM retraction."""
    dR, dt = se3_exp(xi)
    return se3_compose(dR, dt, R, t)


# ---------------------------------------------------------------------------
# Sim(3): (s, R, t); action p -> s R p + t
# Reference semantics: g2o::Sim3 used for loop correction
# (reference: src/stella_vslam/optimize/internal/sim3/*, global_optimization_module.cc:212-312)
# ---------------------------------------------------------------------------


def sim3_apply(s, R, t, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) * (sb,Rb,tb)."""
    return sa * sb, Ra @ Rb, sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def _sim3_W(sigma: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) translation Jacobian W with exp([[sigma I + hat(phi), rho],[0,0]])
    = [[e^sigma R, W rho],[0,1]].  W = A I + B hat(phi) + C hat(phi)^2
    (Strasdat's thesis, eq. for Sim(3) exponential). Branch-free Taylor switches."""
    s = jnp.exp(sigma)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    sig2 = sigma * sigma
    small_sig = jnp.abs(sigma) < 1e-4
    small_th = theta2 < 1e-8
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_sig2 = jnp.where(small_sig, 1.0, sig2)
    safe_th2 = jnp.where(small_th, 1.0, theta2)
    c = theta2 + sig2
    safe_c = jnp.where(c < _EPS, 1.0, c)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    A = jnp.where(small_sig, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / safe_sig)
    B_gen = (sigma * s * sin_t + (1.0 - s * cos_t) * theta) / (theta * safe_c)
    B_th0 = jnp.where(small_sig, 0.5 + sigma / 3.0, ((sigma - 1.0) * s + 1.0) / safe_sig2)
    B_sig0 = (1.0 - cos_t) / safe_th2
    B = jnp.where(small_th, B_th0, jnp.where(small_sig, B_sig0, B_gen))
    C_gen = (A - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / safe_c) / safe_th2
    C_th0 = jnp.where(
        small_sig, 1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sig2 - sigma + 1.0) - 1.0) / (safe_sig2 * safe_sig),
    )
    C_sig0 = (theta - sin_t) / (safe_th2 * jnp.where(small_th, 1.0, theta))
    C = jnp.where(small_th, C_th0, jnp.where(small_sig, C_sig0, C_gen))

    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return A[..., None, None] * eye + B[..., None, None] * K + C[..., None, None] * (K @ K)


def sim3_exp(xi: jnp.ndarray):
    """[..., 7] (rho, phi, sigma) -> (s, R, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    W = _sim3_W(sigma, phi)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return s, R, t


def sim3_log(s, R, t) -> jnp.ndarray:
    """Inverse of sim3_exp via solving W rho = t (exact 3x3 solve)."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(sigma, phi)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def rotation_project(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize a near-rotation matrix via SVD (batched).
    Exact polar projection; prefer rotation_project_fast in batched hot paths
    (TPU lowers batched small SVDs to slow iterative loops)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype)
    D = D.at[..., 2].set(det)
    return U @ (D[..., :, None] * Vt)


def rotation_project_fast(R: jnp.ndarray, num_iter: int = 8) -> jnp.ndarray:
    """Nearest-rotation projection via scaled Newton-Schulz polar iteration —
    pure batched matmuls (MXU-friendly), converges for inputs within ~unit
    distance of O(3). Sign is corrected to det=+1 first."""
    det = jnp.linalg.det(R)
    R = R * jnp.sign(det)[..., None, None]
    # pre-scale so singular values are <= ~1
    norm = jnp.sqrt(jnp.sum(R * R, axis=(-2, -1), keepdims=True) / 3.0 + 1e-12)
    X = R / norm
    eye = jnp.eye(3, dtype=R.dtype)
    for _ in range(num_iter):
        X = 1.5 * X - 0.5 * X @ jnp.swapaxes(X, -1, -2) @ X
    return X
