"""Batched 256-bit Hamming distance on the MXU.

Reference computes per-pair popcount loops on the CPU
(src/stella_vslam/match/base.h:19-66, compute_descriptor_distance_32/64).
The TPU-native form: unpack each 256-bit descriptor to a +/-1 int8 vector; then
for descriptors a, b with bits A, B:  dot(a, b) = 256 - 2 * hamming(A, B), so
the full [N, M] distance matrix is one int8 matmul on the systolic array —
exact integer arithmetic, ~2 orders of magnitude faster than elementwise
popcount at frame-scale N, M.

Shared thresholds (reference match/base.h:15-17).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

HAMMING_DIST_THR_LOW = 50
HAMMING_DIST_THR_HIGH = 100
MAX_HAMMING_DIST = 256


def unpack_bits_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] int8 in {-1, +1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts[None, None, :]) & jnp.uint32(1)  # [N,8,32]
    bits = bits.reshape(desc.shape[0], 256).astype(jnp.int8)
    return bits * jnp.int8(2) - jnp.int8(1)


def pairwise_hamming(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] u32 x [M, 8] u32 -> [N, M] int32 exact Hamming distances."""
    a = unpack_bits_pm1(desc1)
    b = unpack_bits_pm1(desc2)
    dot = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (256 - dot) // 2


def hamming_1v1(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise rows: [N, 8] x [N, 8] -> [N] (for aligned pairs)."""
    x = jnp.bitwise_xor(desc1, desc2)
    # popcount via jax.lax.population_count on uint32
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def angle_diff_ok(angle1: jnp.ndarray, angle2: jnp.ndarray, thr_deg: float = 30.0) -> jnp.ndarray:
    """Orientation consistency |circular angle diff| <= 30 deg
    (reference match/projection.cc:183 via util::angle::diff)."""
    d = angle1 - angle2
    d = jnp.arctan2(jnp.sin(d), jnp.cos(d))
    return jnp.abs(d) <= jnp.deg2rad(thr_deg)


def check_epipolar_constraint(
    bearing_1: jnp.ndarray,  # [..., 3]
    bearing_2: jnp.ndarray,  # [..., 3]
    E_12: jnp.ndarray,  # [3, 3]
    residual_rad_thr: float,
    bearing_1_scale_factor: jnp.ndarray,
) -> jnp.ndarray:
    """Angular epipolar residual check in bearing space
    (reference match/base.h:68-80).

    |pi/2 - arccos(c)| < thr  <=>  |c| < sin(thr): the arccos over the full
    [N1,N2] map is replaced by a per-row sin of the (scale-scaled) threshold
    — same accept set, no per-cell transcendental."""
    epiplane = jnp.einsum("ij,...j->...i", E_12, bearing_2)
    norm = jnp.linalg.norm(epiplane, axis=-1)
    cos_res = jnp.clip(
        jnp.sum(epiplane * bearing_1, axis=-1) / jnp.maximum(norm, 1e-12), -1.0, 1.0
    )
    return jnp.abs(cos_res) < jnp.sin(residual_rad_thr * bearing_1_scale_factor)


def take_rows(values: jnp.ndarray, idx: jnp.ndarray, num: int) -> jnp.ndarray:
    """Gather-free lookup values[idx] for [N]-vector values and [M] indices,
    as a one-hot masked reduction (TPU serializes per-element gathers)."""
    it = jax.lax.broadcasted_iota(jnp.int32, (1, num), 1)
    onehot = idx[:, None] == it  # [M, N]
    return jnp.sum(jnp.where(onehot, values[None, :], 0), axis=1)


def take_small_table(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Lookup into a tiny table (e.g. per-level scale factors, len <= ~16)
    via one-hot reduction; idx may have any shape."""
    L = table.shape[0]
    it = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (L,), idx.ndim)
    onehot = idx[..., None] == it
    return jnp.sum(jnp.where(onehot, table, 0), axis=-1)


def best_and_second(
    dist: jnp.ndarray, axis: int = -1
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(best_dist, best_idx, second_best_dist) along an axis, in one pass."""
    best_idx = jnp.argmin(dist, axis=axis)
    best = jnp.min(dist, axis=axis)
    n = dist.shape[axis]
    iota_shape = [1] * dist.ndim
    iota_shape[axis] = n
    it = jax.lax.broadcasted_iota(jnp.int32, dist.shape, axis if axis >= 0 else dist.ndim + axis)
    onehot = jnp.expand_dims(best_idx, axis) == it
    masked = jnp.where(onehot, MAX_HAMMING_DIST + 1, dist)
    second = jnp.min(masked, axis=axis)
    return best, best_idx, second


def resolve_duplicate_targets(
    target_idx: jnp.ndarray,  # [M] i32, candidate target per source
    dist: jnp.ndarray,  # [M] distance of that candidate
    accepted: jnp.ndarray,  # [M] bool
    num_targets: int,
) -> jnp.ndarray:
    """Keep, per target, only the lowest-distance accepted source (ties -> lowest
    source index). The reference resolves collisions implicitly by sequential
    overwrite (frame::add_landmark); here a deterministic min-reduction.

    Implemented as one-hot [M, num_targets] reductions rather than scatter-min:
    XLA-on-TPU serializes per-element scatters, while masked reductions are
    plain VPU work."""
    M = target_idx.shape[0]
    src = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)[:, 0]
    big = jnp.int32(2**30)
    key = jnp.where(accepted, dist.astype(jnp.int32) * M + src, big)  # [M]
    it = jax.lax.broadcasted_iota(jnp.int32, (1, num_targets), 1)
    onehot = (target_idx[:, None] == it) & accepted[:, None]  # [M, N]
    best_key_per_target = jnp.min(
        jnp.where(onehot, key[:, None], big), axis=0
    )  # [N]
    my_best = jnp.min(
        jnp.where(onehot, best_key_per_target[None, :], big), axis=1
    )  # [M]
    return accepted & (my_best == key)
