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


def solve_spd_blocked(S: jnp.ndarray, rhs: jnp.ndarray,
                      block: int = 8) -> jnp.ndarray:
    """SPD solve S x = rhs for a single [n,n] system, n a multiple of
    `block` — the mid-size regime between the unrolled small solves above
    and anything LAPACK-shaped. jnp.linalg.solve at [384,384] costs 27 ms
    on-chip (serialized LU); this blocked right-looking Cholesky runs
    n/block fori_loop steps, each an unrolled block factorization + ONE
    [n,block]@[block,n] MXU trailing update, in the low single-digit ms.
    Used by every reduced-camera Schur solve (ops/optim/ba._solve_schur:
    [6K,6K] with K a pow2 camera bucket) and the Sim3 pose-graph solve
    ([7K,7K]). Sizes that are not a multiple of `block` are padded with an
    identity diagonal (zero coupling), which leaves the solution exact."""
    n0 = S.shape[-1]
    B = block
    pad = (-n0) % B
    if pad:
        S = jnp.pad(S, ((0, pad), (0, pad)))
        idx = jnp.arange(n0 + pad)
        S = jnp.where((idx[:, None] == idx[None, :]) & (idx[:, None] >= n0),
                      jnp.asarray(1.0, S.dtype), S)
        rhs = jnp.pad(rhs, (0, pad))
    n = n0 + pad
    nb = n // B
    dtype = S.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def fac_body(j, carry):
        A, L = carry
        r = j * B
        Ajj = jax.lax.dynamic_slice(A, (r, r), (B, B))
        Ljj = cholesky_unrolled(Ajj)
        colA = jax.lax.dynamic_slice(A, (0, r), (n, B))  # [n,B]
        # P[k] = inv(Ljj) @ colA[k] == (colA @ inv(Ljj)^T)[k], batched over k
        P = solve_lower_unrolled(Ljj, colA)
        trail = (rows >= r + B).astype(dtype)
        P_tr = P * trail  # rows above/in the current block column: zero
        A = A - jnp.dot(P_tr, P_tr.T, preferred_element_type=dtype)
        colL = jax.lax.dynamic_update_slice(P_tr, Ljj, (r, 0))
        L = jax.lax.dynamic_update_slice(L, colL, (0, r))
        return A, L

    _, L = jax.lax.fori_loop(0, nb, fac_body, (S, jnp.zeros_like(S)))

    # forward substitution L y = rhs: y[m >= current block] is still zero,
    # and L is strictly block-lower + lower-triangular diagonal blocks, so
    # the full-row matvec picks up exactly the already-solved prefix
    def fwd_body(j, y):
        r = j * B
        Lrow = jax.lax.dynamic_slice(L, (r, 0), (B, n))
        s = jnp.dot(Lrow, y, preferred_element_type=dtype)
        Ljj = jax.lax.dynamic_slice(L, (r, r), (B, B))
        bj = jax.lax.dynamic_slice(rhs, (r,), (B,))
        yj = solve_lower_unrolled(Ljj, bj - s)
        return jax.lax.dynamic_update_slice(y, yj, (r,))

    y = jax.lax.fori_loop(0, nb, fwd_body, jnp.zeros_like(rhs))

    # backward substitution L^T x = y, from the last block up
    def bwd_body(i, x):
        r = (nb - 1 - i) * B
        Lcol = jax.lax.dynamic_slice(L, (0, r), (n, B))
        s = jnp.dot(Lcol.T, x, preferred_element_type=dtype)
        Ljj = jax.lax.dynamic_slice(L, (r, r), (B, B))
        yj = jax.lax.dynamic_slice(y, (r,), (B,))
        xj = solve_upper_from_lower_unrolled(Ljj, yj - s)
        return jax.lax.dynamic_update_slice(x, xj, (r,))

    x = jax.lax.fori_loop(0, nb, bwd_body, jnp.zeros_like(rhs))
    return x[:n0] if pad else x


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
