"""BoW vocabulary/database + relocalization + loop-closing machinery tests."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.data.bow_database import BowDatabase
from stella_vslam_tpu.data.bow_vocabulary import BowVocabulary
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory

RNG = np.random.default_rng(21)


def rand_desc(n):
    return RNG.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def flip_bits(desc, nbits):
    out = desc.copy()
    for i in range(len(out)):
        for b in RNG.choice(256, size=nbits, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


def test_vocab_transform_properties():
    vocab = BowVocabulary()
    d = rand_desc(128)
    w1, bow1 = vocab.compute_bow(d, np.ones(128, bool))
    w2, _ = vocab.compute_bow(d, np.ones(128, bool))
    np.testing.assert_array_equal(w1, w2)  # deterministic
    assert (w1 >= 0).all() and (w1 < vocab.num_words).all()
    # slightly corrupted descriptors keep most words
    d2 = flip_bits(d, 4)
    w3, _ = vocab.compute_bow(d2, np.ones(128, bool))
    same = (w1 == w3).mean()
    # random descriptors share almost no words
    d4 = rand_desc(128)
    w4, _ = vocab.compute_bow(d4, np.ones(128, bool))
    rand_same = (w1 == w4).mean()
    assert same > 5 * max(rand_same, 1e-3), f"same={same}, rand={rand_same}"


def test_bow_score_and_database():
    vocab = BowVocabulary()
    base = rand_desc(256)
    valid = np.ones(256, bool)
    _, bow_a = vocab.compute_bow(base, valid)
    _, bow_a2 = vocab.compute_bow(flip_bits(base, 3), valid)
    _, bow_b = vocab.compute_bow(rand_desc(256), valid)
    s_self = vocab.score(bow_a, bow_a)
    s_near = vocab.score(bow_a, bow_a2)
    s_far = vocab.score(bow_a, bow_b)
    assert s_self == pytest.approx(1.0, abs=1e-6)
    assert s_near > 3 * s_far  # near-scene score dominates far-scene
    db = BowDatabase(vocab)
    db.add_keyframe(1, bow_a)
    db.add_keyframe(2, bow_b)
    cands = db.acquire_keyframes(bow_a2)
    assert cands and cands[0] == 1
    db.erase_keyframe(1)
    cands = db.acquire_keyframes(bow_a2)
    assert 1 not in cands


@pytest.mark.slow
def test_relocalization_after_lost():
    """Track a sequence, cut to blank frames (lost), then return to a known
    view — the relocalizer must recover the pose."""
    world = PlaneWorld()
    poses = lateral_trajectory(60, step=0.015)
    cfg = Config.from_dict(
        {
            "Camera": world.camera_yaml(),
            "Feature": {"num_levels": 4},
            "Preprocessing": {"min_size": 400},
            "Initializer": {"use_fixed_seed": True},
        }
    )
    slam = System(cfg, inline_mapping=True)
    slam.startup()
    # phase 1: build a map over 30 frames
    for i in range(30):
        slam.feed_monocular_frame(world.render(poses[i]), i * 0.2)
    slam.tracker.finalize_pending()  # drain in-flight frames (pipeline barrier)
    slam._drain_mapper_inline()
    assert slam.tracker.state == "Tracking"
    assert slam.map_db.num_keyframes() >= 3
    n_kfs = slam.map_db.num_keyframes()
    # phase 2: blank frames -> lost (init_time is old, so no auto-reset)
    blank = np.zeros((world.H, world.W), np.float32)
    for j in range(3):
        slam.feed_monocular_frame(blank, (60 + j) * 0.2)
    slam.tracker.finalize_pending()
    assert slam.tracker.state == "Lost"
    assert slam.map_db.num_keyframes() == n_kfs  # map survived
    # phase 3: return to a mapped view -> relocalize
    ok = False
    for j in range(3):
        idx = 10 + j
        pose = slam.feed_monocular_frame(
            world.render(poses[idx]), (70 + j) * 0.2
        )
        slam.tracker.finalize_pending()
        if slam.tracker.state == "Tracking":
            ok = True
            # pose should be close to ground truth (map is gauge-aligned to
            # the first keyframe at identity, same convention as gt)
            est_c = -pose[:3, :3].T @ pose[:3, 3]
            gt_c = -poses[idx][:3, :3].T @ poses[idx][:3, 3]
            # mono scale: compare directions / ratios loosely
            assert np.linalg.norm(est_c - gt_c) < 0.5
            break
    slam.shutdown()
    assert ok, "relocalization failed"
