"""Real-image validation of the extractor + trained BoW vocabulary.

Reference anchor: test/stella_vslam/data/bow_vocabulary.cc:13-54 — the
reference's only real-image test extracts ORB (top/bottom 20% masked, 1000
keypoints) from its two shipped equirectangular photos
(test/data/equirectangular_image_00{1,2}.jpg, a near-scene pair) and scores
their BoW vectors. Here the assertion is strengthened to a ranking: the
near-scene pair must outscore far-scene pairs (disjoint halves of the same
panoramas — opposite viewing directions of an equirectangular image share no
scene content).

The photos are read from the reference checkout in place (they are data
fixtures, not code); the whole module skips when that path is absent.
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

_DATA = "/root/reference/test/data"
_PHOTOS = [os.path.join(_DATA, f"equirectangular_image_00{i}.jpg")
           for i in (1, 2)]

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in _PHOTOS),
    reason="reference real-image fixtures not available",
)


@pytest.fixture(scope="module")
def real_features():
    """Per (photo, half): (desc, valid) from the real panoramas.

    Halves of an equirectangular panorama look in opposite directions, so
    (001-left, 002-left) is a near-scene pair while (001-left, 001-right)
    is a far-scene pair from the very same camera."""
    from stella_vslam_tpu.feature.orb_params import OrbParams

    from stella_vslam_tpu.feature.orb_extractor import OrbExtractor

    imgs = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in _PHOTOS]
    H, W = imgs[0].shape
    # the reference masks the top and bottom 20% (bow_vocabulary.cc:16)
    ex = OrbExtractor(OrbParams(num_levels=4), W // 2, H,
                      mask_rects=[(0.0, 0.2, 0.0, 1.0), (0.8, 1.0, 0.0, 1.0)])
    feats = {}
    for pi, img in enumerate(imgs):
        for half, sl in (("L", np.s_[:, : W // 2]), ("R", np.s_[:, W // 2:])):
            f = ex.extract(np.asarray(img[sl], np.float32))
            feats[(pi, half)] = (np.asarray(f.desc), np.asarray(f.valid))
    return feats


def test_extractor_finds_real_keypoints(real_features):
    """The front end must produce a healthy feature set on real imagery
    (non-degenerate count, descriptors not collapsed)."""
    for (pi, half), (desc, valid) in real_features.items():
        n = int(valid.sum())
        assert n >= 300, f"photo {pi} half {half}: only {n} keypoints"
        d = desc[valid]
        # descriptor diversity: the most common descriptor must not dominate
        _, counts = np.unique(d, axis=0, return_counts=True)
        assert counts.max() < 0.05 * n, "descriptor distribution collapsed"


def test_trained_vocab_near_scene_outscores_far_scene(real_features):
    """score(near pair) > score(far pair) on real photos — the reference's
    bow_vocabulary test semantics, strengthened from its score<1.0 bound."""
    from stella_vslam_tpu.data.bow_vocabulary import BowVocabulary

    vocab = BowVocabulary.default()
    bows = {k: vocab.compute_bow(d, v)[1] for k, (d, v) in real_features.items()}
    near = [((0, "L"), (1, "L")), ((0, "R"), (1, "R"))]
    far = [((0, "L"), (0, "R")), ((1, "L"), (1, "R")),
           ((0, "L"), (1, "R")), ((0, "R"), (1, "L"))]
    near_scores = [vocab.score(bows[a], bows[b]) for a, b in near]
    far_scores = [vocab.score(bows[a], bows[b]) for a, b in far]
    assert min(near_scores) > max(far_scores), (
        f"near {near_scores} vs far {far_scores}")
