"""Five-point minimal essential solver, TPU-native.

Reference: src/stella_vslam/solve/essential_5pt.h (Stewenius Gröbner
action-matrix method, requiring a nonsymmetric 10x10 eigendecomposition that
XLA does not provide on TPU; essential_solver.h:46-58 wires it into RANSAC).
This implementation reaches the same minimal-set capability a different way —
the classical hidden-variable resultant, built from TPU-friendly pieces:

* the 4D null space of the 5x9 epipolar constraint matrix comes from the
  orthogonal projector I - A^T (A A^T)^-1 A (batched unrolled 5x5 SPD solve),
  orthonormalized against a fixed probe matrix;
* E(x,y,z) = x E1 + y E2 + z E3 + E4 must satisfy det(E) = 0 and the nine
  trace constraints 2 E E^T E - tr(E E^T) E = 0: ten cubics in (x,y,z);
* grouped over the ten x,y-monomials {x^3, x^2 y, .., 1}, the system reads
  M(z) m = 0 with M(z) = M0 + z M1 + z^2 M2 + z^3 M3 (10x10); solutions
  exist exactly where f(z) = det M(z) = 0 — a degree-10 polynomial whose
  real roots are isolated by SIGN evaluation on a tan-substituted grid plus
  fixed-depth bisection. The sign of det comes from pivot-normalized
  unrolled Gaussian elimination (row scaling by positive factors preserves
  it), so there is no eigensolve and no overflow anywhere;
* per root, (x, y) are read off the null vector of M(z*) (repeated-squaring
  smallest-eigenvector of M^T M), and all (up to 10 per set) candidate E's
  are scored by the shared angular-cost RANSAC selector in essential.py.

All stages are fixed-shape and batched over the hypothesis axis.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops import linalg as linalg_small
from stella_vslam_tpu.ops.solve import ransac

# ---------------------------------------------------------------------------
# polynomial bookkeeping (host side, unrolled at trace time)
# ---------------------------------------------------------------------------

# x,y-monomial columns of M(z), Nister's hidden-variable grouping
_XY_MONOS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
             (1, 0), (0, 1), (0, 0)]
_COL_X = _XY_MONOS.index((1, 0))
_COL_Y = _XY_MONOS.index((0, 1))
_COL_1 = _XY_MONOS.index((0, 0))


def _pmul(p, q):
    """Product of two polynomials in (x, y, z) represented as dicts
    {(a,b,c): coeff array}; runs at trace time."""
    out = {}
    for ea, ca in p.items():
        for eb, cb in q.items():
            e = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
            t = ca * cb
            out[e] = out[e] + t if e in out else t
    return out


def _padd(p, q, s=1.0):
    out = dict(p)
    for e, c in q.items():
        out[e] = out[e] + s * c if e in out else s * c
    return out


def _lin_forms(basis):
    """basis [B,4,3,3] -> 3x3 grid of linear-form dicts over (x,y,z,1)."""
    E = {}
    for i in range(3):
        for j in range(3):
            E[(i, j)] = {
                (1, 0, 0): basis[:, 0, i, j],
                (0, 1, 0): basis[:, 1, i, j],
                (0, 0, 1): basis[:, 2, i, j],
                (0, 0, 0): basis[:, 3, i, j],
            }
    return E


def _ten_cubics(E):
    """det(E) and the nine trace constraints as polynomial dicts."""
    def m(i, j):
        return E[(i, j)]

    det = _padd(
        _padd(
            _pmul(m(0, 0), _padd(_pmul(m(1, 1), m(2, 2)),
                                 _pmul(m(1, 2), m(2, 1)), -1.0)),
            _pmul(m(0, 1), _padd(_pmul(m(1, 0), m(2, 2)),
                                 _pmul(m(1, 2), m(2, 0)), -1.0)), -1.0),
        _pmul(m(0, 2), _padd(_pmul(m(1, 0), m(2, 1)),
                             _pmul(m(1, 1), m(2, 0)), -1.0)))

    # T = E E^T (symmetric, degree 2)
    T = {}
    for i in range(3):
        for k in range(i, 3):
            acc = _pmul(m(i, 0), m(k, 0))
            acc = _padd(acc, _pmul(m(i, 1), m(k, 1)))
            acc = _padd(acc, _pmul(m(i, 2), m(k, 2)))
            T[(i, k)] = acc
            T[(k, i)] = acc
    tr = _padd(_padd(T[(0, 0)], T[(1, 1)]), T[(2, 2)])

    eqs = [det]
    for i in range(3):
        for l in range(3):
            acc = _pmul(T[(i, 0)], m(0, l))
            acc = _padd(acc, _pmul(T[(i, 1)], m(1, l)))
            acc = _padd(acc, _pmul(T[(i, 2)], m(2, l)))
            # 2 (E E^T E) - tr(E E^T) E
            acc = {e: 2.0 * c for e, c in acc.items()}
            acc = _padd(acc, _pmul(tr, m(i, l)), -1.0)
            eqs.append(acc)
    return eqs


def _assemble_Mk(eqs, B):
    """[B,10,10] coefficient matrices M0..M3 of M(z) from the ten cubics."""
    zero = jnp.zeros((B,), jnp.float32)
    Mk = [[[zero] * 10 for _ in range(10)] for _ in range(4)]
    for r, eq in enumerate(eqs):
        for (a, b, c), coeff in eq.items():
            col = _XY_MONOS.index((a, b))
            Mk[c][r][col] = Mk[c][r][col] + coeff
    return [jnp.stack([jnp.stack(row, axis=-1) for row in Mk[c]], axis=-2)
            for c in range(4)]


# ---------------------------------------------------------------------------
# determinant sign via pivot-normalized unrolled Gaussian elimination
# ---------------------------------------------------------------------------

def _det_sign_10(M):
    """sign(det M) for [..., 10, 10], batched. Rows are rescaled by positive
    factors during elimination, which preserves the sign and avoids both
    overflow and LAPACK lowering."""
    A = M
    sign = jnp.ones(M.shape[:-2], M.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (10,), 0)
    for k in range(10):
        col = jnp.abs(A[..., :, k])
        col = jnp.where(iota >= k, col, -1.0)  # exclude eliminated rows
        p = jnp.argmax(col, axis=-1)  # [...]
        swap = (p != k)
        sign = sign * jnp.where(swap, -1.0, 1.0)
        oh_p = (iota == p[..., None]).astype(A.dtype)  # [...,10]
        oh_k = (iota == k).astype(A.dtype)
        row_p = jnp.einsum("...r,...rc->...c", oh_p, A)
        row_k = jnp.einsum("...r,...rc->...c", oh_k, A)
        # swap rows k and p
        A = (A
             + (oh_k[..., :, None] * (row_p - row_k)[..., None, :])
             + (oh_p[..., :, None] * (row_k - row_p)[..., None, :]))
        piv = A[..., k, k]
        sign = sign * jnp.sign(piv)
        # normalize the pivot row to |piv| = 1 (a positive scale: sign
        # preserved, magnitudes bounded)
        inv = jnp.where(jnp.abs(piv) > 1e-30, 1.0 / jnp.abs(piv), 0.0)
        rowk_n = row_p * inv[..., None]
        A = jnp.where(oh_k[..., :, None] > 0, rowk_n[..., None, :], A)
        # eliminate below the pivot (pivot row now has entry sign(piv) at k)
        below = (iota > k).astype(A.dtype)
        mult = A[..., :, k] * below * jnp.sign(piv)[..., None]
        A = A - mult[..., :, None] * rowk_n[..., None, :]
    return sign


def _eval_M(Mks, z):
    """M(z) for z [...]: broadcast the batch of coefficient matrices."""
    M0, M1, M2, M3 = Mks
    zz = z[..., None, None]
    return M0 + zz * M1 + (zz * zz) * M2 + (zz * zz * zz) * M3


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------

# pure host constant (a jnp expression here would dispatch at import time
# and can leak a tracer when the module is first imported during a trace)
_PROBE = np.random.default_rng(7).normal(size=(9, 4)).astype(np.float32)

_GRID_N = 256
_BISECT_ITERS = 28
_MAX_ROOTS = 10


def _null_basis(A):
    """Orthonormal basis of the 4D null space of A [B,5,9] via the projector
    I - A^T (A A^T)^-1 A and Gram-Schmidt against a fixed probe."""
    AAt = jnp.einsum("bik,bjk->bij", A, A)
    AAt = AAt + 1e-8 * jnp.trace(AAt, axis1=-2, axis2=-1)[..., None, None] \
        * jnp.eye(5)
    L = linalg_small.cholesky_unrolled(AAt)
    # X = (A A^T)^-1 A column-wise: batch the 9 columns of A as rhs vectors
    rhs = jnp.swapaxes(A, -1, -2)  # [B,9,5]
    y = linalg_small.solve_lower_unrolled(L[:, None], rhs)
    X = linalg_small.solve_upper_from_lower_unrolled(L[:, None], y)  # [B,9,5]
    # P = I - A^T (AA^T)^-1 A:  P_ij = I_ij - sum_k A_ki X_jk
    P = jnp.eye(9) - jnp.einsum("bki,bjk->bij", A, X)
    Y = jnp.einsum("bij,jm->bim", P, jnp.asarray(_PROBE))  # [B,9,4]
    # modified Gram-Schmidt, 4 columns
    cols = []
    for c in range(4):
        v = Y[..., c]
        for u in cols:
            v = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-20)
        cols.append(v)
    return jnp.stack(cols, axis=1)  # [B,4,9]


def solve_minimal_sets(b1_sets: jnp.ndarray, b2_sets: jnp.ndarray):
    """[B,5,3] bearing pairs -> (E [B,10,3,3], valid [B,10]) — up to ten
    essential-matrix candidates per minimal set."""
    B = b1_sets.shape[0]
    A = jnp.concatenate(
        [b2_sets[..., 0:1] * b1_sets,
         b2_sets[..., 1:2] * b1_sets,
         b2_sets[..., 2:3] * b1_sets], axis=-1)  # [B,5,9]
    basis = _null_basis(A).reshape(B, 4, 3, 3)
    eqs = _ten_cubics(_lin_forms(basis))
    Mks = _assemble_Mk(eqs, B)
    # normalize equations (rows) to unit max |coeff| for conditioning
    row_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.stack([M for M in Mks], 0)), axis=(0, -1)),
        1e-20)[..., None]  # [B,10,1]
    Mks = [M / row_max for M in Mks]

    # ---- sign grid over z = tan(theta)
    theta = jnp.linspace(-0.5 * jnp.pi * (1 - 1.0 / _GRID_N),
                         0.5 * jnp.pi * (1 - 1.0 / _GRID_N), _GRID_N + 1)
    zg = jnp.tan(theta)  # [G+1]
    Mg = _eval_M([M[:, None] for M in Mks], zg[None, :])  # [B,G+1,10,10]
    sg = _det_sign_10(Mg)  # [B,G+1]
    change = (sg[:, :-1] * sg[:, 1:]) < 0  # [B,G]
    # pack up to _MAX_ROOTS change intervals into fixed slots
    slot = jnp.cumsum(change.astype(jnp.int32), axis=-1) - 1  # [B,G]
    gi = jax.lax.broadcasted_iota(jnp.int32, change.shape, 1)
    root_slots = jax.lax.broadcasted_iota(
        jnp.int32, (B, _MAX_ROOTS), 1)
    # interval start index per slot (or -1)
    sel = (slot[:, None, :] == root_slots[..., None]) & change[:, None, :]
    has_root = jnp.any(sel, axis=-1)  # [B,R]
    start = jnp.sum(jnp.where(sel, gi[:, None, :], 0), axis=-1)  # [B,R]

    lo = theta[start]
    hi = theta[start + 1]
    s_lo = jnp.take_along_axis(sg, start, axis=-1)

    def bisect_body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        Mm = _eval_M([M[:, None] for M in Mks], jnp.tan(mid))
        sm = _det_sign_10(Mm)
        same = (sm * s_lo) >= 0
        lo = jnp.where(same, mid, lo)
        hi = jnp.where(same, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bisect_body, (lo, hi))
    z_root = jnp.tan(0.5 * (lo + hi))  # [B,R]

    # ---- null vector of M(z*): smallest eigvec of M^T M
    Mr = _eval_M([M[:, None] for M in Mks], z_root)  # [B,R,10,10]
    MtM = jnp.einsum("brki,brkj->brij", Mr, Mr)
    v = ransac.smallest_eigvec_sym(MtM)  # [B,R,10]
    denom = v[..., _COL_1]
    ok_xy = jnp.abs(denom) > 1e-5 * jnp.linalg.norm(v, axis=-1)
    safe = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    x = jnp.where(ok_xy, v[..., _COL_X] / safe, 0.0)
    y = jnp.where(ok_xy, v[..., _COL_Y] / safe, 0.0)

    E = (x[..., None, None] * basis[:, None, 0]
         + y[..., None, None] * basis[:, None, 1]
         + z_root[..., None, None] * basis[:, None, 2]
         + basis[:, None, 3])  # [B,R,3,3]
    E = E / (jnp.linalg.norm(E.reshape(B, _MAX_ROOTS, 9), axis=-1)
             [..., None, None] + 1e-20)
    valid = has_root & ok_xy & jnp.isfinite(z_root)
    return E, valid
