"""Bundle adjustment with Schur complement as a fixed-shape JAX program.

Replaces the reference's g2o/SuiteSparse stack
(src/stella_vslam/optimize/local_bundle_adjuster_g2o.cc:36-415,
global_bundle_adjuster.cc) with a TPU-native sparse Gauss-Newton /
Levenberg-Marquardt engine:

* observations live in LANDMARK-MAJOR layout [L, D] (D = max observers per
  landmark inside the problem, padded slots masked) — so landmark positions
  broadcast with zero gathers, and the Schur complement factorizes exactly:

      S[k,m] = Hcc[k] - sum_l  Vk[l,k] @ Wk[l,m]^T
      Vk[l,k] = sum_d onehot(cam[l,d]=k) * (W[l,d] @ Hpp_inv[l])
      Wk[l,k] = sum_d onehot(cam[l,d]=k) * W[l,d]

* LANE-MAJOR inner layout: every per-observation quantity is a [L,D] f32
  array with the small tensor indices (3 residual rows, 6 pose dims, 3 point
  dims) unrolled in Python. A TPU vector tile is (8,128); the einsum
  formulation ([L,D,3,6] batched tiny matmuls) padded each 3x6 block to a
  tile and measured ~8 ms per LM iteration at L=4096 — the unrolled form
  keeps 1024 observations per tile and runs the same iteration in <1 ms.
  The only MXU work is the K-contraction (camera-block assembly via one
  [N,K] one-hot matmul) and the [6K,3L]@[3L,6K] Schur product.
* the reduced camera system (6K x 6K, K <= 64 local / ~256 global buckets) is
  solved densely — at SLAM scales a dense MXU solve beats sparse CPU Cholesky.
* schedule mirrors the reference local BA: 5 robust (Huber) iterations,
  chi-square outlier reclassification, 10 plain iterations, final outlier
  report (local_bundle_adjuster_g2o.cc:306-348).

Fixed keyframes (the reference's 'fixed' set, cc:108-133) are masked: their
rows/cols of S are replaced by identity so their update is exactly zero.

GSPMD note: sharded_bundle_adjust runs this same program with the [L,D]
arrays sharded on a 'data' mesh axis — every cross-shard contraction here is
a matmul over the flattened L*D axis, so the SPMD partitioner inserts exactly
one all-reduce per assembled camera-side block.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops import linalg as linalg_small

CHI_SQ_2D = 5.991
CHI_SQ_3D = 7.815

# Above this many elements, [L,K]/[N,K] dense cross tensors (the one-hot
# camera scatters and the Schur-product operands) are no longer materialized
# whole: the Schur product chunks over the landmark axis with lax.scan and
# the back-substitution gathers instead of one-hot-matmuls. 2^22 elements =
# 16 MB per f32 array, and the dense Schur product keeps ~40 of them live —
# at K=512 / L=65536 that formulation was measured to exceed single-chip HBM
# (a [K,6,L,3] transpose alone tiled to 48 GB). Small problems (every
# tracking-path local BA bucket) stay on the dense single-matmul program.
_DENSE_CROSS_ELEMS = 1 << 22


def _cross_chunk(L: int, K: int) -> int:
    """Pow2 chunk of the landmark/observation axis keeping chunk*K near 2^20
    elements (4 MB per [C,K] f32 operand)."""
    c = max(256, (1 << 20) // max(K, 1))
    while c > 1 and (c > L or L % c):
        c //= 2
    return max(c, 1)


class BAProblem(NamedTuple):
    """Padded fixed-shape BA problem. K cameras, L landmarks, D obs/landmark."""

    cam_R: jnp.ndarray  # [K,3,3] camera-from-world rotations
    cam_t: jnp.ndarray  # [K,3]
    cam_fixed: jnp.ndarray  # [K] bool — pose held constant
    cam_valid: jnp.ndarray  # [K] bool — slot used
    lm_pos: jnp.ndarray  # [L,3]
    lm_valid: jnp.ndarray  # [L] bool
    obs_cam: jnp.ndarray  # [L,D] i32 camera slot of each observation
    obs_uv: jnp.ndarray  # [L,D,2] undistorted observation
    obs_x_right: jnp.ndarray  # [L,D] stereo x_right (<0 mono)
    obs_inv_sigma_sq: jnp.ndarray  # [L,D]
    obs_valid: jnp.ndarray  # [L,D] bool
    # optional [L] bool: point held constant — its observations still
    # constrain the cameras, but the point gets no update and contributes no
    # Schur marginalization (the reference's fixed marker-corner vertices,
    # local_bundle_adjuster_g2o.cc:272 create_vertices(mkr, keep_fixed_))
    lm_fixed: jnp.ndarray = None
    # optional [L] bool: rows exempt from the mid-schedule chi-square outlier
    # reclassification (the reference only reclassifies landmark reprojection
    # edges, never marker-corner edges — cc:306-329 iterates reproj_edge_wraps)
    lm_keep_inlier: jnp.ndarray = None


class BAResult(NamedTuple):
    cam_R: jnp.ndarray
    cam_t: jnp.ndarray
    lm_pos: jnp.ndarray
    obs_is_outlier: jnp.ndarray  # [L,D] bool (chi-square gated, final poses)
    cost: jnp.ndarray  # final total robust cost


# ---------------------------------------------------------------------------
# packed single-buffer problem upload: the mapper assembles the problem on
# host as ONE flat f32 array (ints/bools are exact small values in f32) so a
# keyframe event costs ONE host->device transfer instead of thirteen — each
# transfer on the tunneled runtime carries per-op latency that stacks up to
# 10-35 ms of the event (measured), and every one of them contends with the
# tracker's in-flight fetches
# ---------------------------------------------------------------------------

def _packed_layout(K: int, L: int, D: int):
    """(name, numel, shape) segments of the flat f32 problem buffer."""
    return (
        ("cam_R", K * 9, (K, 3, 3)),
        ("cam_t", K * 3, (K, 3)),
        ("cam_fixed", K, (K,)),
        ("cam_valid", K, (K,)),
        ("lm_pos", L * 3, (L, 3)),
        ("lm_valid", L, (L,)),
        ("obs_cam", L * D, (L, D)),
        ("obs_uv", L * D * 2, (L, D, 2)),
        ("obs_x_right", L * D, (L, D)),
        ("obs_inv_sigma_sq", L * D, (L, D)),
        ("obs_valid", L * D, (L, D)),
        ("lm_fixed", L, (L,)),
        ("lm_keep_inlier", L, (L,)),
    )


def packed_size(K: int, L: int, D: int) -> int:
    return sum(n for _, n, _ in _packed_layout(K, L, D))


def unpack_problem(buf: jnp.ndarray, K: int, L: int, D: int) -> BAProblem:
    """Slice the flat f32 buffer back into a BAProblem (inside jit — the
    slices are static, XLA fuses them into the consumers)."""
    fields = {}
    off = 0
    for name, n, shape in _packed_layout(K, L, D):
        fields[name] = jax.lax.slice(buf, (off,), (off + n,)).reshape(shape)
        off += n
    for b in ("cam_fixed", "cam_valid", "lm_valid", "obs_valid", "lm_fixed",
              "lm_keep_inlier"):
        fields[b] = fields[b] != 0
    fields["obs_cam"] = fields["obs_cam"].astype(jnp.int32)
    return BAProblem(**fields)


@partial(jax.jit, static_argnames=("K", "L", "D", "model", "num_first",
                                   "num_second"))
def bundle_adjust_packed(buf, cam, *, K: int, L: int, D: int,
                         model: str = "perspective", num_first: int = 5,
                         num_second: int = 10) -> BAResult:
    prob = unpack_problem(buf, K, L, D)
    return bundle_adjust(prob, cam, model=model, num_first=num_first,
                         num_second=num_second)


# ---------------------------------------------------------------------------
# chunked (per-iteration) local BA: on one chip the mapper's BA program
# serializes with the tracker's per-frame programs, and a monolithic
# full-schedule program (~110-150 ms at K=32/L=2048) stalls a whole fetch
# batch of tracking frames behind it once per keyframe event — the dominant
# frame-time tail on the bench. Dispatching ONE Levenberg-Marquardt iteration
# per device program (~10-15 ms) and fetching only the scalar done-flag
# between steps lets tracking programs interleave after every iteration; the
# done-flag round trip both paces the queue and applies the reference's
# gain < 1e-3 early termination on host (optimize/terminate_action.cc wired
# at local_bundle_adjuster_g2o.cc:157-159). Total BA wall grows (it is
# asynchronous — the writeback lands at the next idle tick) but the tracker's
# worst queue wait drops from the full schedule to one iteration.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("K", "L", "D"))
def ba_init_packed(buf, *, K: int, L: int, D: int):
    """Initial optimization state straight from the uploaded problem buffer."""
    prob = unpack_problem(buf, K, L, D)
    return prob.cam_R, prob.cam_t, prob.lm_pos


@partial(jax.jit, static_argnames=("K", "L", "D", "model", "use_huber"))
def ba_step_packed(buf, cam_R, cam_t, lm_pos, lam, inlier, cam, *,
                   K: int, L: int, D: int, model: str, use_huber: bool):
    """One LM iteration — the body of bundle_adjust's while_loop as a
    standalone program over explicit device-resident state."""
    prob = unpack_problem(buf, K, L, D)
    cost0, blocks = _linearize(
        prob, cam_R, cam_t, lm_pos, inlier, cam, model, use_huber)
    Rn, tn, pn = _solve_schur(prob, cam_R, cam_t, lm_pos, blocks, lam)
    cost1, _, _ = _total_cost(prob, Rn, tn, pn, inlier, cam, model, use_huber)
    improved = cost1 < cost0
    gain = (cost0 - cost1) / jnp.maximum(cost0, 1e-12)
    done = improved & (gain < 1e-3)
    cam_R = jnp.where(improved, Rn, cam_R)
    cam_t = jnp.where(improved, tn, cam_t)
    lm_pos = jnp.where(improved, pn, lm_pos)
    lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0), 1e-8, 1e4)
    return cam_R, cam_t, lm_pos, lam, done, cost1


@partial(jax.jit, static_argnames=("K", "L", "D", "model"))
def ba_reclassify_packed(buf, cam_R, cam_t, lm_pos, cam, *,
                         K: int, L: int, D: int, model: str):
    """Between-stage outlier reclassification
    (local_bundle_adjuster_g2o.cc:306-329)."""
    prob = unpack_problem(buf, K, L, D)
    inlier0 = jnp.ones_like(prob.obs_valid)
    _, chi2_mid, depth_ok_mid = _total_cost(
        prob, cam_R, cam_t, lm_pos, inlier0, cam, model, False)
    chi_thr = jnp.where(prob.obs_x_right > 0, CHI_SQ_3D, CHI_SQ_2D)
    inlier1 = (chi2_mid <= chi_thr) & depth_ok_mid
    if prob.lm_keep_inlier is not None:
        inlier1 = inlier1 | prob.lm_keep_inlier[:, None]
    return inlier1


@partial(jax.jit, static_argnames=("K", "L", "D", "model"))
def ba_finalize_packed(buf, cam_R, cam_t, lm_pos, inlier, cam, *,
                       K: int, L: int, D: int, model: str):
    """Final chi-square outlier flags at the optimized poses."""
    prob = unpack_problem(buf, K, L, D)
    _, chi2_fin, depth_ok_fin = _total_cost(
        prob, cam_R, cam_t, lm_pos, inlier, cam, model, False)
    chi_thr = jnp.where(prob.obs_x_right > 0, CHI_SQ_3D, CHI_SQ_2D)
    return prob.obs_valid & ((chi2_fin > chi_thr) | ~depth_ok_fin)


def bundle_adjust_packed_stepped(buf, cam, *, K: int, L: int, D: int,
                                 model: str = "perspective",
                                 num_first: int = 5,
                                 num_second: int = 10,
                                 pace_s: float = 0.008,
                                 term_chunk: int = 3) -> BAResult:
    """Host-driven per-iteration schedule, numerically identical to
    bundle_adjust_packed (same body, same lam schedule, same gain-based
    termination up to `term_chunk` granularity) but one device program per
    iteration. Pacing: a short wall-clock sleep after each enqueue gives
    the tracker's concurrently-dispatched frames queue slots between
    iterations; the done flag is fetched only every `term_chunk` steps
    (a per-step scalar round trip costs ~30-40 ms on the tunneled runtime
    — measured: it quadrupled BA wall time and starved the event cadence).
    Call from a worker thread."""
    import time as _t
    cam_R, cam_t, lm_pos = ba_init_packed(buf, K=K, L=L, D=D)
    inlier = jnp.ones((L, D), bool)
    cost = jnp.float32(jnp.inf)
    for use_huber, iters in ((True, num_first), (False, num_second)):
        lam = jnp.float32(1e-4)
        since_check = 0
        for it in range(iters):
            cam_R, cam_t, lm_pos, lam, done, cost = ba_step_packed(
                buf, cam_R, cam_t, lm_pos, lam, inlier, cam,
                K=K, L=L, D=D, model=model, use_huber=use_huber)
            since_check += 1
            if since_check >= term_chunk and it < iters - 1:
                since_check = 0
                if bool(done):  # blocks; also drains the queue for trackers
                    break
            elif pace_s > 0:
                _t.sleep(pace_s)
        if use_huber:
            inlier = ba_reclassify_packed(
                buf, cam_R, cam_t, lm_pos, cam, K=K, L=L, D=D, model=model)
    outlier = ba_finalize_packed(
        buf, cam_R, cam_t, lm_pos, inlier, cam, K=K, L=L, D=D, model=model)
    return BAResult(cam_R=cam_R, cam_t=cam_t, lm_pos=lm_pos,
                    obs_is_outlier=outlier, cost=cost)


# ---------------------------------------------------------------------------
# lane-major helpers: structural zeros are represented as None so the unrolled
# small-dim arithmetic skips them entirely
# ---------------------------------------------------------------------------

def _madd(acc, a, b):
    """acc + a*b with None as structural zero."""
    if a is None or b is None:
        return acc
    t = a * b
    return t if acc is None else acc + t


def _scale(a, s):
    return None if a is None else a * s


def _as0(a, like):
    return jnp.zeros_like(like) if a is None else a


def _pose_rows(prob: BAProblem, cam_R, cam_t, lm_pos, cam, model: str):
    """Per-observation residual rows + Jacobian rows, all as [L,D] arrays.

    Returns (rows, Jc, Jp, depth_ok) where
      rows[r]      residual of row r                       ([L,D] or None)
      Jc[r][c]     d row_r / d pose twist component c      (6 cols)
      Jp[r][j]     d row_r / d point_j                     (3 cols)
    Row 2 is the stereo disparity row (perspective only); its weight must be
    multiplied by has_stereo by the caller.
    """
    L, D = prob.obs_cam.shape
    K = cam_R.shape[0]
    N = L * D
    # per-obs camera pose via ONE one-hot matmul: [N,K] @ [K,12]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
    ohf = (prob.obs_cam.reshape(N, 1) == iota_k).astype(jnp.float32)
    cam_flat = jnp.concatenate(
        [cam_R.reshape(K, 9), cam_t.reshape(K, 3)], axis=1)
    pose_o = jnp.dot(ohf, cam_flat, preferred_element_type=jnp.float32)
    R = [pose_o[:, i].reshape(L, D) for i in range(9)]  # row-major 3x3
    t = [pose_o[:, 9 + i].reshape(L, D) for i in range(3)]
    p = [lm_pos[:, j:j + 1] for j in range(3)]  # [L,1] broadcasts over D
    Xc = [
        R[3 * i + 0] * p[0] + R[3 * i + 1] * p[1] + R[3 * i + 2] * p[2] + t[i]
        for i in range(3)
    ]
    x, y, z = Xc

    if model == "equirectangular":
        Ln2 = x * x + y * y + z * z
        Ln = jnp.sqrt(jnp.maximum(Ln2, 1e-16))
        xz2 = jnp.maximum(x * x + z * z, 1e-12)
        ku = cam.width / (2.0 * jnp.pi)
        kv = cam.height / jnp.pi
        u = cam.cx + ku * jnp.arctan2(x, z)
        v = cam.cy + kv * jnp.arcsin(jnp.clip(y / Ln, -1.0, 1.0))
        du = jnp.mod(
            u - prob.obs_uv[..., 0] + cam.width / 2.0, cam.width
        ) - cam.width / 2.0
        dv = v - prob.obs_uv[..., 1]
        rows = [du, dv, None]
        L2 = jnp.maximum(Ln2, 1e-16)
        denom = L2 * jnp.sqrt(xz2)
        dpi = [
            [ku * z / xz2, None, -ku * x / xz2],
            [-kv * x * y / denom, kv * jnp.sqrt(xz2) / L2, -kv * z * y / denom],
            None,
        ]
        depth_ok = Ln > 1e-6
    else:
        z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        iz = 1.0 / z_safe
        iz2 = iz * iz
        u = cam.fx * x * iz + cam.cx
        v = cam.fy * y * iz + cam.cy
        u_r = u - cam.focal_x_baseline * iz
        rows = [
            u - prob.obs_uv[..., 0],
            v - prob.obs_uv[..., 1],
            u_r - prob.obs_x_right,  # weight gated by has_stereo
        ]
        dpi = [
            [cam.fx * iz, None, -cam.fx * x * iz2],
            [None, cam.fy * iz, -cam.fy * y * iz2],
            [cam.fx * iz, None,
             -cam.fx * x * iz2 + cam.focal_x_baseline * iz2],
        ]
        depth_ok = z > 1e-4

    # hat(Xc): h[i][j], structural zeros on the diagonal
    h = [[None, -z, y], [z, None, -x], [-y, x, None]]
    Jc, Jp = [], []
    for r in range(3):
        if dpi[r] is None:
            Jc.append(None)
            Jp.append(None)
            continue
        d0, d1, d2 = dpi[r]
        # translation block = dpi row; rotation block = -dpi @ hat(Xc)
        rot = []
        for j in range(3):
            acc = None
            acc = _madd(acc, d0, h[0][j])
            acc = _madd(acc, d1, h[1][j])
            acc = _madd(acc, d2, h[2][j])
            rot.append(_scale(acc, -1.0))
        Jc.append([d0, d1, d2] + rot)
        # point block = dpi @ R
        Jp.append([
            _madd(_madd(_madd(None, d0, R[0 + j]), d1, R[3 + j]), d2, R[6 + j])
            for j in range(3)
        ])
    return rows, Jc, Jp, depth_ok


def _row_weights(prob: BAProblem, rows, depth_ok, inlier, use_huber,
                 model: str):
    """Per-row weights wr[r] = validity * inv_sigma_sq * huber * dof_r, plus
    the total robust cost (same formulas as the reference chi2 gating)."""
    w_base = (
        prob.obs_valid & inlier & depth_ok & prob.lm_valid[:, None]
    ).astype(jnp.float32) * prob.obs_inv_sigma_sq  # [L,D]
    has_stereo = (prob.obs_x_right > 0).astype(jnp.float32)
    dof = [None, None, None]  # None = weight 1
    if model == "equirectangular":
        sq = rows[0] * rows[0] + rows[1] * rows[1]
    else:
        r2s = rows[2] * rows[2] * has_stereo
        sq = rows[0] * rows[0] + rows[1] * rows[1] + r2s
        dof[2] = has_stereo
    chi2 = sq * prob.obs_inv_sigma_sq
    is_stereo = prob.obs_x_right > 0
    chi_thr = jnp.where(is_stereo, CHI_SQ_3D, CHI_SQ_2D)
    chi = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    sqrt_thr = jnp.sqrt(chi_thr)
    huber_w = jnp.where(use_huber & (chi > sqrt_thr), sqrt_thr / chi, 1.0)
    w = w_base * huber_w
    cost = jnp.sum(w * sq)
    wr = [w if dof[r] is None else w * dof[r] for r in range(3)]
    return wr, w_base, cost, chi2, chi_thr


def _linearize(prob: BAProblem, cam_R, cam_t, lm_pos, inlier, cam, model,
               use_huber):
    """ONE residual/Jacobian evaluation at a state -> (cost, lam-independent
    normal-equation blocks). The solve (lam-dependent) lives in _solve_schur
    so the damping can change without re-linearizing."""
    L, D = prob.obs_cam.shape
    K = cam_R.shape[0]
    N = L * D
    rows, Jc, Jp, depth_ok = _pose_rows(prob, cam_R, cam_t, lm_pos, cam, model)
    wr, w_base, cost, _, _ = _row_weights(
        prob, rows, depth_ok, inlier, use_huber, model)

    active = [r for r in range(3) if Jc[r] is not None]

    # camera-side blocks: per-obs entries stacked to [N, 27] and contracted
    # against the one-hot with ONE MXU matmul -> Hcc [K,6,6] + b_c [K,6]
    ij_pairs = [(i, j) for i in range(6) for j in range(i, 6)]  # 21
    per_obs = []
    for (i, j) in ij_pairs:
        acc = None
        for r in active:
            if Jc[r][i] is not None and Jc[r][j] is not None:
                t = wr[r] * Jc[r][i] * Jc[r][j]
                acc = t if acc is None else acc + t
        per_obs.append(_as0(acc, wr[0]))
    for i in range(6):
        acc = None
        for r in active:
            if Jc[r][i] is not None:
                t = wr[r] * Jc[r][i] * rows[r]
                acc = t if acc is None else acc + t
        per_obs.append(_as0(acc, wr[0]))
    M = jnp.stack([a.reshape(N) for a in per_obs], axis=1)  # [N,27]
    if N * K >= _DENSE_CROSS_ELEMS:
        # chunk the one-hot contraction over the observation axis: the full
        # [N,K] scatter is the memory hog at global-BA scale
        C = _cross_chunk(N, K)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)

        def _acc_blocks(acc, inp):
            m_c, oc = inp
            oh = (oc[:, None] == iota_c).astype(jnp.float32)
            return acc + jnp.dot(
                m_c.T, oh, preferred_element_type=jnp.float32), None

        cam_blocks, _ = jax.lax.scan(
            _acc_blocks, jnp.zeros((27, K), jnp.float32),
            (M.reshape(N // C, C, 27), prob.obs_cam.reshape(N // C, C)))
    else:
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        ohf = (prob.obs_cam.reshape(N, 1) == iota_k).astype(jnp.float32)
        cam_blocks = jnp.dot(M.T, ohf, preferred_element_type=jnp.float32)  # [27,K]
    sym_idx = {}
    for n, (i, j) in enumerate(ij_pairs):
        sym_idx[(i, j)] = n
        sym_idx[(j, i)] = n
    Hcc = jnp.stack(
        [cam_blocks[sym_idx[(i, j)]] for i in range(6) for j in range(6)],
        axis=1,
    ).reshape(K, 6, 6)
    b_c = cam_blocks[21:27].T  # [K,6]

    # landmark-side blocks (symmetric 3x3 + rhs), reduced over D -> [L]
    Hpp = {}
    for i in range(3):
        for j in range(i, 3):
            acc = None
            for r in active:
                if Jp[r][i] is not None and Jp[r][j] is not None:
                    t = wr[r] * Jp[r][i] * Jp[r][j]
                    acc = t if acc is None else acc + t
            Hpp[(i, j)] = jnp.sum(_as0(acc, wr[0]), axis=1)
    b_p = []
    for i in range(3):
        acc = None
        for r in active:
            if Jp[r][i] is not None:
                t = wr[r] * Jp[r][i] * rows[r]
                acc = t if acc is None else acc + t
        b_p.append(jnp.sum(_as0(acc, wr[0]), axis=1))

    # W blocks kept per-observation for the Schur product: Wm[(i,a)] [L,D]
    Wm = {}
    for i in range(6):
        for a in range(3):
            acc = None
            for r in active:
                if Jc[r][i] is not None and Jp[r][a] is not None:
                    t = wr[r] * Jc[r][i] * Jp[r][a]
                    acc = t if acc is None else acc + t
            Wm[(i, a)] = _as0(acc, wr[0])

    has_obs = jnp.sum(w_base, axis=1) > 0  # [L]
    return cost, (Hpp, b_p, Hcc, b_c, Wm, has_obs)


def _sym3_inv(H, lam):
    """Damped symmetric 3x3 inverse on [L] arrays via the adjugate (batched
    jnp.linalg.inv lowers to a slow per-matrix loop on TPU). Returns the 6
    unique entries of the symmetric inverse."""
    tr = H[(0, 0)] + H[(1, 1)] + H[(2, 2)]
    damp = lam * jnp.maximum(tr / 3.0, 1e-6) + 1e-7
    a = H[(0, 0)] + damp
    b = H[(0, 1)]
    c = H[(0, 2)]
    d = H[(1, 1)] + damp
    e = H[(1, 2)]
    f = H[(2, 2)] + damp
    A00 = d * f - e * e
    A01 = c * e - b * f
    A02 = b * e - c * d
    A11 = a * f - c * c
    A12 = b * c - a * e
    A22 = a * d - b * b
    det = a * A00 + b * A01 + c * A02
    idet = jnp.where(jnp.abs(det) < 1e-18, 0.0, 1.0 / jnp.where(
        jnp.abs(det) < 1e-18, 1.0, det))
    return {
        (0, 0): A00 * idet, (0, 1): A01 * idet, (0, 2): A02 * idet,
        (1, 1): A11 * idet, (1, 2): A12 * idet, (2, 2): A22 * idet,
    }


def _sym_get(H, i, j):
    return H[(i, j)] if (i, j) in H else H[(j, i)]


def _schur_product_chunked(prob, Wm, G, b_p, K):
    """W Hpp^-1 W^T and W Hpp^-1 b_p accumulated over landmark chunks.

    Returns (S_red [6K,6K], rhs_red [6K]) in BLOCKED row layout
    (row = i*K + k): every per-chunk operand is a [C,K] tile with K in the
    lane dimension, the 108 block matmuls are [K,C]@[C,K], and nothing with
    a 3- or 6-sized trailing dim is ever materialized at [.,L] scale."""
    L, D = prob.obs_cam.shape
    C = _cross_chunk(L, K)
    nc = L // C
    # stacked scan inputs (row-major reshapes of the [L,...] arrays are free)
    wm_st = jnp.stack([Wm[(i, a)] for i in range(6) for a in range(3)],
                      axis=1)  # [L,18,D]
    g_st = jnp.stack([_sym_get(G, a, b) for a in range(3) for b in range(3)],
                     axis=1)  # [L,9]
    bp_st = jnp.stack(b_p, axis=1)  # [L,3]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)

    def _acc(carry, inp):
        S_blk, rhs_blk = carry  # [6,6,K,K], [6,K]
        wm_c, g_c, bp_c, oc = inp
        Wk = {}
        for n, (i, a) in enumerate(
                (i, a) for i in range(6) for a in range(3)):
            acc = None
            for d in range(D):
                oh_d = (oc[:, d:d + 1] == iota_c).astype(jnp.float32)
                t = oh_d * wm_c[:, n, d:d + 1]
                acc = t if acc is None else acc + t
            Wk[(i, a)] = acc  # [C,K]
        A = {
            (i, a): (
                Wk[(i, 0)] * g_c[:, 0 * 3 + a:0 * 3 + a + 1]
                + Wk[(i, 1)] * g_c[:, 1 * 3 + a:1 * 3 + a + 1]
                + Wk[(i, 2)] * g_c[:, 2 * 3 + a:2 * 3 + a + 1]
            )
            for i in range(6) for a in range(3)
        }
        dims = (((0,), (0,)), ((), ()))  # contract the C axis of both
        S_new = S_blk + jnp.stack([
            jnp.stack([
                sum(jax.lax.dot_general(A[(i, a)], Wk[(j, a)], dims,
                                        preferred_element_type=jnp.float32)
                    for a in range(3))
                for j in range(6)
            ])
            for i in range(6)
        ])
        rhs_new = rhs_blk + jnp.stack([
            sum(jax.lax.dot_general(
                A[(i, a)], bp_c[:, a:a + 1], dims,
                preferred_element_type=jnp.float32)[:, 0]
                for a in range(3))
            for i in range(6)
        ])
        return (S_new, rhs_new), None

    (S_blk, rhs_blk), _ = jax.lax.scan(
        _acc,
        (jnp.zeros((6, 6, K, K), jnp.float32), jnp.zeros((6, K), jnp.float32)),
        (wm_st.reshape(nc, C, 18, D), g_st.reshape(nc, C, 9),
         bp_st.reshape(nc, C, 3), prob.obs_cam.reshape(nc, C, D)))
    # blocked flatten: S_red[(i,k),(j,m)] — 6 lands in sublanes, K in lanes
    S_red = S_blk.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    return S_red, rhs_blk.reshape(6 * K)


def _solve_schur(prob: BAProblem, cam_R, cam_t, lm_pos, blocks, lam):
    """Damped Schur-complement solve from precomputed blocks; applies the
    update to (cam_R, cam_t, lm_pos) and returns the trial state."""
    L, D = prob.obs_cam.shape
    K = cam_R.shape[0]
    N = L * D
    Hpp, b_p, Hcc, b_c, Wm, has_obs = blocks

    G = _sym3_inv(Hpp, lam)  # [L] entries of damped Hpp^-1
    if prob.lm_fixed is not None:
        # fixed points: no Schur marginalization (their obs fold fully into
        # Hcc) and, via the back-substitution below, a zero point update
        keep = (~prob.lm_fixed).astype(jnp.float32)
        G = {k: v * keep for k, v in G.items()}

    large = L * K >= _DENSE_CROSS_ELEMS
    if large:
        # global-BA scale: the dense [L,K] scatters below exceed HBM — chunk
        # the Schur product over the landmark axis instead (blocked [(i,k)]
        # layout so K stays in vector lanes; the interleaved layout's
        # [K,6,L,3] transpose tiled 3 -> 128 lanes and cost 48 GB, measured)
        S_red, rhs_red = _schur_product_chunked(prob, Wm, G, b_p, K)
    else:
        # Wk[(i,a)] [L,K]: one-hot scatter of Wm over D, unrolled over D
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (L, K), 1)
        Wk = {key: jnp.zeros((L, K), jnp.float32) for key in Wm}
        for d in range(D):
            oh_d = (prob.obs_cam[:, d:d + 1] == iota_k).astype(jnp.float32)
            for key, wm in Wm.items():
                Wk[key] = Wk[key] + oh_d * wm[:, d:d + 1]
        # A = Wk @ Hpp_inv per landmark: A[(i,a)] [L,K]
        A = {}
        for i in range(6):
            for a in range(3):
                A[(i, a)] = (
                    Wk[(i, 0)] * _sym_get(G, 0, a)[:, None]
                    + Wk[(i, 1)] * _sym_get(G, 1, a)[:, None]
                    + Wk[(i, 2)] * _sym_get(G, 2, a)[:, None]
                )

        # Schur product as ONE MXU matmul: [6K, 3L] @ [3L, 6K], output
        # already in the interleaved [(k,i),(m,j)] layout of the dense solve
        A_st = jnp.stack([
            jnp.stack([A[(i, a)] for a in range(3)]) for i in range(6)
        ])  # [6,3,L,K]
        W_st = jnp.stack([
            jnp.stack([Wk[(j, a)] for a in range(3)]) for j in range(6)
        ])  # [6,3,L,K]
        A_mat = A_st.transpose(3, 0, 2, 1).reshape(K * 6, L * 3)
        B_mat = W_st.transpose(2, 1, 3, 0).reshape(L * 3, K * 6)
        S_red = jnp.dot(A_mat, B_mat, preferred_element_type=jnp.float32)

        bp_flat = jnp.stack(b_p, axis=1).reshape(L * 3)  # [(l,a)]
        rhs_red = jnp.dot(A_mat, bp_flat, preferred_element_type=jnp.float32)

    # damped camera diagonal, embedded block-diagonally
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    diag_damp = lam * jnp.maximum(jnp.trace(Hcc, axis1=-2, axis2=-1) / 6.0, 1e-6)
    Hcc_d = Hcc + (diag_damp[:, None, None] + 1e-7) * eye6
    eyeK = jnp.eye(K, dtype=jnp.float32)
    free = (prob.cam_valid & ~prob.cam_fixed).astype(jnp.float32)  # [K]
    if large:
        # blocked layout: row index = i*K + k
        block_diag = jnp.einsum(
            "km,kij->ikjm", eyeK, Hcc_d).reshape(6 * K, 6 * K)
        rhs = b_c.T.reshape(-1) - rhs_red
        free6 = jnp.tile(free, 6)
    else:
        # interleaved layout: row index = k*6 + i
        block_diag = jnp.einsum(
            "km,kij->kimj", eyeK, Hcc_d).reshape(6 * K, 6 * K)
        rhs = b_c.reshape(-1) - rhs_red
        free6 = jnp.repeat(free, 6)
    S = -S_red + block_diag

    # mask fixed / invalid cameras: identity rows/cols, zero rhs
    S = S * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
    rhs = rhs * free6

    # blocked SPD Cholesky: jnp.linalg.solve at [384,384] measured 27 ms
    # on-chip (serialized LU) and ran once per LM iteration — the single
    # largest local-BA cost
    dx = -linalg_small.solve_spd_blocked(S, rhs)
    dx = (dx.reshape(6, K).T if large else dx.reshape(K, 6)) * free[:, None]

    # back-substitute landmarks: dx at each observation — gather at scale,
    # one-hot matmul for the small (tracking-path) buckets
    if large:
        dx_o = jnp.take(dx, prob.obs_cam.reshape(N), axis=0)  # [N,6]
    else:
        ohf = (
            prob.obs_cam.reshape(N, 1)
            == jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        ).astype(jnp.float32)
        dx_o = jnp.dot(ohf, dx, preferred_element_type=jnp.float32)  # [N,6]
    dx_i = [dx_o[:, i].reshape(L, D) for i in range(6)]
    wtd = []
    for a in range(3):
        acc = None
        for i in range(6):
            t = Wm[(i, a)] * dx_i[i]
            acc = t if acc is None else acc + t
        wtd.append(jnp.sum(acc, axis=1))  # [L]
    rhs_p = [b_p[a] + wtd[a] for a in range(3)]
    upd_mask = (
        prob.lm_valid.astype(jnp.float32) * has_obs.astype(jnp.float32))
    dp = [
        -(
            _sym_get(G, a, 0) * rhs_p[0]
            + _sym_get(G, a, 1) * rhs_p[1]
            + _sym_get(G, a, 2) * rhs_p[2]
        ) * upd_mask
        for a in range(3)
    ]

    dR, dt = lie.se3_exp(dx)
    cam_R_new, cam_t_new = lie.se3_compose(dR, dt, cam_R, cam_t)
    lm_new = lm_pos + jnp.stack(dp, axis=1)
    return cam_R_new, cam_t_new, lm_new


def _total_cost(prob, cam_R, cam_t, lm_pos, inlier, cam, model, use_huber):
    rows, _, _, depth_ok = _pose_rows(prob, cam_R, cam_t, lm_pos, cam, model)
    _, _, cost, chi2, _ = _row_weights(
        prob, rows, depth_ok, inlier, use_huber, model)
    return cost, chi2, depth_ok


@partial(jax.jit, static_argnames=("model", "num_first", "num_second"))
def bundle_adjust(
    prob: BAProblem,
    cam,
    *,
    model: str = "perspective",
    num_first: int = 5,
    num_second: int = 10,
) -> BAResult:
    """Two-stage LM schedule mirroring the reference local BA
    (local_bundle_adjuster_g2o.cc:306-348): robust rounds, outlier
    reclassification, plain rounds, final outlier flags."""

    def stage(cam_R, cam_t, lm_pos, inlier, use_huber, iters):
        # LM loop with gain-based early termination (the reference registers
        # a g2o post-iteration action stopping when the relative cost gain
        # drops under 1e-3 — optimize/terminate_action.cc, wired at
        # local_bundle_adjuster_g2o.cc:157-159). lax.while_loop gives the
        # dynamic trip count: typical local problems stop after 3-6
        # iterations instead of burning the full schedule on device.
        def cond(carry):
            it, done, *_ = carry
            return (it < iters) & ~done

        def body(carry):
            it, done, cam_R, cam_t, lm_pos, lam, _ = carry
            cost0, blocks = _linearize(
                prob, cam_R, cam_t, lm_pos, inlier, cam, model, use_huber)
            Rn, tn, pn = _solve_schur(
                prob, cam_R, cam_t, lm_pos, blocks, lam)
            cost1, _, _ = _total_cost(prob, Rn, tn, pn, inlier, cam, model, use_huber)
            improved = cost1 < cost0
            gain = (cost0 - cost1) / jnp.maximum(cost0, 1e-12)
            done = improved & (gain < 1e-3)
            cam_R = jnp.where(improved, Rn, cam_R)
            cam_t = jnp.where(improved, tn, cam_t)
            lm_pos = jnp.where(improved, pn, lm_pos)
            lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0), 1e-8, 1e4)
            return (it + 1, done, cam_R, cam_t, lm_pos, lam, cost1)

        init = (jnp.int32(0), jnp.asarray(False), cam_R, cam_t, lm_pos,
                jnp.float32(1e-4), jnp.float32(jnp.inf))
        _, _, cam_R, cam_t, lm_pos, _, cost = jax.lax.while_loop(
            cond, body, init)
        return cam_R, cam_t, lm_pos, cost

    inlier0 = jnp.ones_like(prob.obs_valid)
    R1, t1, p1, cost1 = stage(prob.cam_R, prob.cam_t, prob.lm_pos, inlier0, True, num_first)
    # reclassify (cc:306-329)
    _, chi2_mid, depth_ok_mid = _total_cost(prob, R1, t1, p1, inlier0, cam, model, False)
    is_stereo = prob.obs_x_right > 0
    chi_thr = jnp.where(is_stereo, CHI_SQ_3D, CHI_SQ_2D)
    inlier1 = (chi2_mid <= chi_thr) & depth_ok_mid
    if prob.lm_keep_inlier is not None:
        inlier1 = inlier1 | prob.lm_keep_inlier[:, None]
    if num_second > 0:
        R2, t2, p2, cost = stage(R1, t1, p1, inlier1, False, num_second)
    else:
        # single robust stage (reference global BA: no pruning pass)
        R2, t2, p2, cost = R1, t1, p1, cost1
    _, chi2_fin, depth_ok_fin = _total_cost(prob, R2, t2, p2, inlier1, cam, model, False)
    outlier = prob.obs_valid & ((chi2_fin > chi_thr) | ~depth_ok_fin)
    return BAResult(cam_R=R2, cam_t=t2, lm_pos=p2, obs_is_outlier=outlier, cost=cost)


# ---------------------------------------------------------------------------
# legacy einsum-form residual evaluation, kept for the explicit one-step
# sharded GN path (parallel/sharded_ba.make_sharded_ba_step) which assembles
# its own normal equations from (r, Jc, Jp)
# ---------------------------------------------------------------------------

def _residuals(prob: BAProblem, cam_R, cam_t, lm_pos, cam, model: str,
               oh=None):
    """Flattened residual evaluation over [L*D] observation slots."""
    L, D = prob.obs_cam.shape
    K = cam_R.shape[0]
    if oh is None:
        ik = jax.lax.broadcasted_iota(jnp.int32, (L, D, K), 2)
        oh = (prob.obs_cam[:, :, None] == ik).astype(jnp.float32)  # [L,D,K]
    rows, Jc_u, Jp_u, depth_ok = _pose_rows(
        prob, cam_R, cam_t, lm_pos, cam, model)
    zeros = jnp.zeros_like(rows[0])
    has_stereo = (prob.obs_x_right > 0).astype(jnp.float32)
    r = jnp.stack([
        rows[0], rows[1],
        zeros if rows[2] is None else rows[2] * has_stereo,
    ], axis=-1)
    def _mat(rows_u, ncol):
        out = []
        for rr in range(3):
            if rows_u[rr] is None:
                out.append(jnp.stack([zeros] * ncol, axis=-1))
            else:
                out.append(jnp.stack(
                    [_as0(c, zeros) for c in rows_u[rr]], axis=-1))
        return jnp.stack(out, axis=-2)
    Jc = _mat(Jc_u, 6)  # [L,D,3,6]
    Jp = _mat(Jp_u, 3)  # [L,D,3,3]
    if model == "equirectangular":
        dof = jnp.stack([jnp.ones_like(zeros), jnp.ones_like(zeros), zeros],
                        axis=-1)
    else:
        dof = jnp.stack(
            [jnp.ones_like(zeros), jnp.ones_like(zeros), has_stereo], axis=-1)
    return r, Jc, Jp, dof, depth_ok, oh
