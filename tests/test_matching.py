"""Matcher tests (pattern mirrors reference test/stella_vslam/match/base.cc
Hamming correctness plus synthetic-geometry matcher behavior)."""
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.match import (
    HAMMING_DIST_THR_LOW,
    pairwise_hamming,
)
from stella_vslam_tpu.match import area, fuse, hamming, projection, robust

RNG = np.random.default_rng(4)


def rand_desc(n):
    return RNG.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def np_hamming(a, b):
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def test_pairwise_hamming_exact():
    a, b = rand_desc(64), rand_desc(96)
    ours = np.array(pairwise_hamming(jnp.asarray(a), jnp.asarray(b)))
    ref = np_hamming(a, b)
    np.testing.assert_array_equal(ours, ref)
    # identity: zero distance on identical rows
    d = np.array(pairwise_hamming(jnp.asarray(a), jnp.asarray(a)))
    assert np.all(np.diag(d) == 0)


def test_hamming_1v1():
    a, b = rand_desc(32), rand_desc(32)
    ours = np.array(hamming.hamming_1v1(jnp.asarray(a), jnp.asarray(b)))
    ref = np_hamming(a, b)[np.arange(32), np.arange(32)]
    np.testing.assert_array_equal(ours, ref)


def flip_bits(desc, nbits):
    """Flip nbits random bits in each 256-bit descriptor row."""
    out = desc.copy()
    for i in range(out.shape[0]):
        for b in RNG.choice(256, size=nbits, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


def test_projection_match_frame_and_landmarks():
    N, M, L = 128, 64, 8
    scale_factors = jnp.asarray([1.2**i for i in range(L)], dtype=jnp.float32)
    kp_uv = RNG.uniform(0, 640, (N, 2)).astype(np.float32)
    kp_desc = rand_desc(N)
    kp_level = np.zeros(N, dtype=np.int32)
    # landmarks 0..M-1 correspond to keypoints 0..M-1 with slightly corrupted desc
    lm_desc = flip_bits(kp_desc[:M], 10)
    lm_reproj = kp_uv[:M] + RNG.uniform(-2, 2, (M, 2)).astype(np.float32)
    idx, acc, dist = projection.match_frame_and_landmarks(
        jnp.asarray(kp_uv), jnp.asarray(kp_level), jnp.asarray(kp_desc),
        jnp.ones(N, bool), jnp.zeros(N, bool), jnp.full(N, -1.0),
        jnp.asarray(lm_desc), jnp.asarray(lm_reproj), jnp.full(M, -1.0),
        jnp.zeros(M, jnp.int32), jnp.ones(M, bool),
        scale_factors=scale_factors, num_levels=L, margin=5.0,
    )
    idx, acc = np.array(idx), np.array(acc)
    assert acc.sum() >= M * 0.9
    assert np.all(idx[acc] == np.arange(M)[acc])


def test_projection_match_rejects_outside_window():
    N, M, L = 32, 16, 8
    scale_factors = jnp.asarray([1.2**i for i in range(L)], dtype=jnp.float32)
    kp_uv = RNG.uniform(0, 640, (N, 2)).astype(np.float32)
    kp_desc = rand_desc(N)
    lm_desc = kp_desc[:M].copy()
    lm_reproj = kp_uv[:M] + 50.0  # far outside the 5px margin
    idx, acc, _ = projection.match_frame_and_landmarks(
        jnp.asarray(kp_uv), jnp.zeros(N, jnp.int32), jnp.asarray(kp_desc),
        jnp.ones(N, bool), jnp.zeros(N, bool), jnp.full(N, -1.0),
        jnp.asarray(lm_desc), jnp.asarray(lm_reproj), jnp.full(M, -1.0),
        jnp.zeros(M, jnp.int32), jnp.ones(M, bool),
        scale_factors=scale_factors, num_levels=L, margin=5.0,
    )
    assert np.array(acc).sum() == 0


def test_area_match():
    N1, N2 = 64, 80
    kp1_desc = rand_desc(N1)
    kp2_desc = np.concatenate([flip_bits(kp1_desc, 8), rand_desc(N2 - N1)])
    kp2_uv = RNG.uniform(100, 500, (N2, 2)).astype(np.float32)
    prev = kp2_uv[:N1] + RNG.uniform(-30, 30, (N1, 2)).astype(np.float32)
    angles = np.zeros(max(N1, N2), dtype=np.float32)
    idx, acc, _ = area.match_in_consistent_area(
        jnp.zeros(N1, jnp.int32), jnp.asarray(kp1_desc), jnp.asarray(angles[:N1]),
        jnp.ones(N1, bool), jnp.asarray(prev),
        jnp.asarray(kp2_uv), jnp.zeros(N2, jnp.int32), jnp.asarray(kp2_desc),
        jnp.asarray(angles[:N2]), jnp.ones(N2, bool),
        margin=100.0, lowe_ratio=0.9,
    )
    idx, acc = np.array(idx), np.array(acc)
    assert acc.sum() >= N1 * 0.8
    assert np.all(idx[acc] == np.arange(N1)[acc])


def test_area_match_orientation_rejects():
    N = 32
    d = rand_desc(N)
    uv = RNG.uniform(100, 500, (N, 2)).astype(np.float32)
    idx, acc, _ = area.match_in_consistent_area(
        jnp.zeros(N, jnp.int32), jnp.asarray(d), jnp.zeros(N),
        jnp.ones(N, bool), jnp.asarray(uv),
        jnp.asarray(uv), jnp.zeros(N, jnp.int32), jnp.asarray(d),
        jnp.full(N, np.pi),  # 180 deg rotated orientation
        jnp.ones(N, bool),
    )
    assert np.array(acc).sum() == 0


def test_brute_force_match():
    N1, N2 = 100, 60
    kp2_desc = rand_desc(N2)
    kp1_desc = np.concatenate([flip_bits(kp2_desc, 6), rand_desc(N1 - N2)])
    idx, acc, _ = robust.brute_force_match(
        jnp.zeros(N1), jnp.asarray(kp1_desc), jnp.ones(N1, bool),
        jnp.zeros(N2), jnp.asarray(kp2_desc), jnp.ones(N2, bool),
    )
    idx, acc = np.array(idx), np.array(acc)
    assert acc.sum() >= N2 * 0.9
    assert np.all(idx[acc] == np.arange(N2)[acc])


def test_fuse_detect_duplication():
    N, M, L = 64, 32, 8
    scale_factors = jnp.asarray([1.2**i for i in range(L)], dtype=jnp.float32)
    sigma_sq = jnp.asarray([1.2 ** (2 * i) for i in range(L)], dtype=jnp.float32)
    kp_uv = RNG.uniform(0, 640, (N, 2)).astype(np.float32)
    kp_desc = rand_desc(N)
    lm_desc = flip_bits(kp_desc[:M], 5)
    lm_reproj = kp_uv[:M] + RNG.uniform(-1, 1, (M, 2)).astype(np.float32)
    idx, acc, _ = fuse.detect_duplication(
        jnp.asarray(kp_uv), jnp.zeros(N, jnp.int32), jnp.asarray(kp_desc),
        jnp.ones(N, bool), jnp.full(N, -1.0),
        jnp.asarray(lm_desc), jnp.asarray(lm_reproj), jnp.full(M, -1.0),
        jnp.zeros(M, jnp.int32), jnp.ones(M, bool),
        scale_factors=scale_factors, level_sigma_sq=sigma_sq, num_levels=L,
    )
    idx, acc = np.array(idx), np.array(acc)
    assert acc.sum() >= M * 0.8
    assert np.all(idx[acc] == np.arange(M)[acc])


def test_duplicate_resolution():
    """Two sources matching one target: only the closer survives."""
    tgt_idx = jnp.asarray([5, 5, 3], dtype=jnp.int32)
    dist = jnp.asarray([10, 4, 7], dtype=jnp.int32)
    acc = jnp.asarray([True, True, True])
    out = np.array(hamming.resolve_duplicate_targets(tgt_idx, dist, acc, 8))
    assert list(out) == [False, True, True]


def test_epipolar_constraint():
    # two cameras translated along x; bearing pairs from a true 3D point satisfy
    # the constraint, random ones mostly don't
    from stella_vslam_tpu.ops import lie

    R = jnp.eye(3)
    t = jnp.asarray([1.0, 0.0, 0.0])
    E = lie.hat(t) @ R  # E_12 with pose kf1<-kf2 = (R, t)
    pts = RNG.uniform(-1, 1, (50, 3)).astype(np.float32) + [0, 0, 5]
    b2 = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    pts1 = pts @ np.array(R).T + np.array(t)
    b1 = pts1 / np.linalg.norm(pts1, axis=-1, keepdims=True)
    ok = hamming.check_epipolar_constraint(
        jnp.asarray(b1), jnp.asarray(b2), E, 0.004, jnp.ones(50)
    )
    assert np.array(ok).mean() > 0.95
    perm = RNG.permutation(50)
    bad = hamming.check_epipolar_constraint(
        jnp.asarray(b1[perm]), jnp.asarray(b2), E, 0.004, jnp.ones(50)
    )
    assert np.array(bad).mean() < 0.3
