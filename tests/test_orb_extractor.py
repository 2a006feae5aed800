"""ORB extractor tests on synthetic corner images
(pattern mirrors reference test/stella_vslam/feature/orb_extractor.cc:25-80:
rectangles drawn on flat background; detected keypoints must lie near true
corners; masks must be respected)."""
import jax.numpy as jnp
import numpy as np
import pytest

from stella_vslam_tpu.feature import OrbExtractor, OrbParams

W, H = 320, 240


def draw_rect(img, x0, y0, x1, y1, val=200):
    img[y0:y1, x0:x1] = val
    return img


@pytest.fixture(scope="module")
def extractor():
    return OrbExtractor(OrbParams(num_levels=4), W, H)


def test_slot_geometry(extractor):
    assert extractor.num_slots > 0
    # level 0 NMS grid ~ (320-38)/28.3 x (240-38)/28.3
    g = extractor.levels[0]
    assert 8 <= g.Gx <= 12 and 6 <= g.Gy <= 9


def test_corners_detected(extractor):
    img = np.full((H, W), 50, dtype=np.float32)
    corners = [(80, 60), (80, 160), (220, 60), (220, 160)]
    draw_rect(img, 80, 60, 220, 160)
    feats = extractor.extract(jnp.asarray(img))
    xy = np.array(feats.xy)[np.array(feats.valid)]
    assert len(xy) >= 4
    for cx, cy in corners:
        d = np.min(np.linalg.norm(xy - [cx, cy], axis=1))
        assert d < 3.0, f"corner ({cx},{cy}) not found, nearest {d:.1f}px"


def test_flat_image_no_keypoints(extractor):
    img = np.full((H, W), 128, dtype=np.float32)
    feats = extractor.extract(jnp.asarray(img))
    assert int(np.array(feats.valid).sum()) == 0


def test_mask_respected(extractor):
    img = np.full((H, W), 50, dtype=np.float32)
    draw_rect(img, 80, 60, 220, 160)
    mask = np.ones((H, W), dtype=np.uint8)
    mask[:, : W // 2] = 0  # exclude the left half
    feats = extractor.extract(jnp.asarray(img), jnp.asarray(mask))
    xy = np.array(feats.xy)[np.array(feats.valid)]
    assert np.all(xy[:, 0] >= W // 2 - 2)


def test_descriptor_shift_invariance(extractor):
    """The same patch shifted by 16px must produce (near-)identical descriptors."""
    rng = np.random.default_rng(3)
    tex = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # smooth the noise so FAST finds stable corners
    import cv2
    tex = cv2.GaussianBlur(tex, (5, 5), 1.5)
    img1 = tex
    img2 = np.roll(tex, shift=(0, 16), axis=(0, 1))
    f1 = extractor.extract(jnp.asarray(img1))
    f2 = extractor.extract(jnp.asarray(img2))
    xy1 = np.array(f1.xy)
    v1 = np.array(f1.valid)
    d1 = np.array(f1.desc)
    xy2 = np.array(f2.xy)
    v2 = np.array(f2.valid)
    d2 = np.array(f2.desc)
    lvl1 = np.array(f1.level)
    lvl2 = np.array(f2.level)
    # match level-0 keypoints by shifted position
    matched = 0
    dists = []
    for i in np.where(v1 & (lvl1 == 0))[0]:
        tgt = xy1[i] + [16, 0]
        if tgt[0] > W - 40:
            continue
        j_all = np.where(v2 & (lvl2 == 0))[0]
        dd = np.linalg.norm(xy2[j_all] - tgt, axis=1)
        j = j_all[np.argmin(dd)]
        if dd.min() < 1.0:
            matched += 1
            ham = bin(int.from_bytes(np.bitwise_xor(d1[i], d2[j]).astype('>u4').tobytes(), 'big')).count("1")
            dists.append(ham)
    assert matched >= 5
    assert np.median(dists) <= 40, f"median Hamming {np.median(dists)} too high"


def test_fast_score_map_simple():
    from stella_vslam_tpu.feature.orb_extractor import fast_score_map

    img = np.zeros((32, 32), dtype=np.float32)
    img[16, 16] = 200.0  # isolated bright dot: all 16 circle pixels darker
    s = np.array(fast_score_map(jnp.asarray(img)))
    assert s[16, 16] > 100  # strong corner response at the dot
    assert s[5, 5] <= 0  # flat region: no corner
