"""Small-matrix linear algebra unrolled into batched elementwise ops.

On the target TPU stack, every LAPACK-shaped primitive (eigh, cholesky,
triangular_solve, lu, svd) lowers to a serialized per-matrix loop: a batched
[256, 12, 12] cholesky measured 29 ms (532 s compile), while the same
factorization unrolled into ~300 fused VPU ops runs in <4 ms with a 1 s
compile; even a single 6x6 jnp.linalg.solve costs 1.6 ms. Every small dense
solve in the tracking/mapping hot paths therefore goes through this module.

All functions are batched over leading dimensions and jit/vmap-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_unrolled(A: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Batched Cholesky of SPD [..., D, D], unrolled over the (static) D."""
    D = A.shape[-1]
    L = [[None] * D for _ in range(D)]
    zero = jnp.zeros_like(A[..., 0, 0])
    for j in range(D):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        s = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = s
        inv = 1.0 / s
        for i in range(j + 1, D):
            v = A[..., i, j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(D)], axis=-1)
        for i in range(D)
    ]
    return jnp.stack(rows, axis=-2)


def solve_lower_unrolled(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """L y = b with lower-triangular L [..., D, D], b [..., D]."""
    D = L.shape[-1]
    y = [None] * D
    for i in range(D):
        v = b[..., i]
        for k in range(i):
            v = v - L[..., i, k] * y[k]
        y[i] = v / L[..., i, i]
    return jnp.stack(y, axis=-1)


def solve_upper_from_lower_unrolled(L: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """L^T x = y."""
    D = L.shape[-1]
    x = [None] * D
    for i in reversed(range(D)):
        v = y[..., i]
        for k in range(i + 1, D):
            v = v - L[..., k, i] * x[k]
        x[i] = v / L[..., i, i]
    return jnp.stack(x, axis=-1)


def solve_spd_unrolled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve A x = b via unrolled Cholesky (D <= ~16)."""
    L = cholesky_unrolled(A)
    return solve_upper_from_lower_unrolled(L, solve_lower_unrolled(L, b))


def smallest_eigvec_spd(A: jnp.ndarray, num_squarings: int = 18) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of batched symmetric PSD
    [..., D, D] — the DLT null-space extractor for the RANSAC solvers.

    Power iteration on the spectral complement M = sigma*I - A (sigma =
    Gershgorin row-sum bound >= lambda_max), accelerated by REPEATED MATRIX
    SQUARING: M^(2^18) aligns every column with the dominant eigenvector of M
    (== smallest of A) at the cost of 18 batched matmuls. This keeps the op
    count tiny — on the target TPU stack per-op dispatch overhead (~10us)
    dwarfs the FLOPs of any small-matrix method, so thousands-of-ops unrolled
    factorizations and LAPACK-style iterative primitives both lose to a
    handful of batched matmuls."""
    D = A.shape[-1]
    sigma = jnp.max(jnp.sum(jnp.abs(A), axis=-1), axis=-1)[..., None, None]
    M = sigma * jnp.eye(D, dtype=A.dtype) - A
    M = M / (sigma + 1e-30)
    for _ in range(num_squarings):
        M = M @ M
        norm = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True)) + 1e-30
        M = M / norm
    # extract the dominant direction as the LARGEST COLUMN of the converged
    # (rank-1, ~v v^T) matrix — NOT M @ ones, which vanishes whenever the
    # target eigenvector happens to be near-orthogonal to the all-ones vector
    # (the resulting ~0 vector then yields a near-zero DLT matrix whose
    # residuals are all "perfect", and RANSAC selects the degenerate model)
    col_sq = jnp.sum(M * M, axis=-2)
    pick = jax.nn.one_hot(jnp.argmax(col_sq, axis=-1), M.shape[-1], dtype=M.dtype)
    v = jnp.einsum("...ij,...j->...i", M, pick)
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / determinant)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]
