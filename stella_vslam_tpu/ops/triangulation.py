"""Two-view triangulation as batched closed-form JAX ops.

Reference: src/stella_vslam/solve/triangulator.h:12-60 (three overloads: DLT on
image points with projection matrices, bearing-based linear solve, and midpoint).
Here each variant is a pure batched function [N,...] -> [N,3]; the DLT null-space
is found with a 4x4 symmetric eigendecomposition (batched eigh vectorizes cleanly
on TPU; no per-point SVD).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(
    b1: jnp.ndarray,  # [N,3] bearings in cam1
    b2: jnp.ndarray,  # [N,3] bearings in cam2
    P1: jnp.ndarray,  # [3,4] pose cam1<-world (R|t)
    P2: jnp.ndarray,  # [3,4] pose cam2<-world
) -> jnp.ndarray:
    """Classic DLT from bearing rays and two camera poses -> world points [N,3]."""
    # rows: x * P[2] - z * P[0], y * P[2] - z * P[1] (homogeneous cross-product)
    def rows(b, P):
        r0 = b[..., 0:1] * P[2] - b[..., 2:3] * P[0]
        r1 = b[..., 1:2] * P[2] - b[..., 2:3] * P[1]
        return r0, r1

    r0, r1 = rows(b1, P1)
    r2, r3 = rows(b2, P2)
    A = jnp.stack([r0, r1, r2, r3], axis=-2)  # [N,4,4]
    # Row-normalize for conditioning, then solve the *inhomogeneous* system
    # B X = -c with A = [B | c] (fixes the homogeneous scale w=1; valid for all
    # finite points and far better conditioned in f32 on the MXU than a 4x4
    # eigendecomposition of A^T A).
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    B, cvec = A[..., :3], A[..., 3]
    BtB = jnp.einsum(
        "...ki,...kj->...ij", B, B, precision=jax.lax.Precision.HIGHEST
    )
    Btc = jnp.einsum("...ki,...k->...i", B, cvec, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(3, dtype=B.dtype) * 1e-9
    # closed-form 3x3 solve: jnp.linalg.solve on batched tiny matrices lowers
    # to a LAPACK-shaped LU path that costs ~13 ms at [5,2872] on-chip; the
    # adjugate inverse is pure lane arithmetic (<0.1 ms) and the system is
    # SPD + row-normalized, so f32 Cramer is well-conditioned here
    from stella_vslam_tpu.ops.linalg import inv3x3

    return -jnp.einsum("...ij,...j->...i", inv3x3(BtB + eye), Btc)


def triangulate_midpoint(
    b1: jnp.ndarray,  # [N,3] bearings in cam1 frame
    b2: jnp.ndarray,  # [N,3] bearings in cam2 frame
    R_21: jnp.ndarray,  # rotation cam2<-cam1
    t_21: jnp.ndarray,  # translation cam2<-cam1
) -> jnp.ndarray:
    """Midpoint triangulation, returns points in cam1 frame [N,3]
    (reference triangulator.h midpoint overload semantics)."""
    # rays: p = s1 * b1 (cam1);  p = R_12 (s2 * b2) + t_12 in cam1 frame
    R_12 = R_21.T
    t_12 = -R_21.T @ t_21
    d1 = b1
    d2 = jnp.einsum("ij,...j->...i", R_12, b2)
    o2 = t_12
    # solve [d1 -d2] [s1 s2]^T = o2 in least squares
    a11 = jnp.sum(d1 * d1, axis=-1)
    a12 = -jnp.sum(d1 * d2, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    c1 = jnp.sum(d1 * o2, axis=-1)
    c2 = -jnp.sum(d2 * o2, axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s1 = (a22 * c1 - a12 * c2) / det
    s2 = (a11 * c2 - a12 * c1) / det
    p1 = s1[..., None] * d1
    p2 = o2 + s2[..., None] * d2
    return 0.5 * (p1 + p2)


def triangulate_stereo(
    und_pts: jnp.ndarray,  # [N,2] undistorted left keypoints
    depths: jnp.ndarray,  # [N]
    fx: jnp.ndarray, fy: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
    R_wc: jnp.ndarray, t_wc: jnp.ndarray,
) -> jnp.ndarray:
    """Back-project stereo/RGBD keypoints with known depth to world
    (reference: data/frame.cc triangulate_stereo)."""
    x = (und_pts[..., 0] - cx) * depths / fx
    y = (und_pts[..., 1] - cy) * depths / fy
    pc = jnp.stack([x, y, depths], axis=-1)
    return jnp.einsum("ij,...j->...i", R_wc, pc) + t_wc


def rays_parallax_cos(b1_w: jnp.ndarray, b2_w: jnp.ndarray) -> jnp.ndarray:
    """Cosine of parallax angle between world-frame rays [N,3]."""
    return jnp.sum(b1_w * b2_w, axis=-1) / (
        jnp.linalg.norm(b1_w, axis=-1) * jnp.linalg.norm(b2_w, axis=-1) + 1e-12
    )
