"""Train the default BoW vocabulary on descriptors harvested from the
synthetic worlds and save it as the packaged asset
stella_vslam_tpu/data/vocab_default.npz.

The reference ships a pretrained FBoW vocabulary (bow_vocabulary.cc:20-22,
3rd/FBoW); this framework carries its own descriptor family (seeded BRIEF
pattern), so the vocabulary is trained in-repo on a diverse descriptor
sample: many texture seeds x viewpoints of the plane world plus the box
room, to cover the binary descriptor space the extractor actually emits.

Run:  python scripts/train_vocab.py  (uses the ambient JAX platform)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stella_vslam_tpu.data.bow_vocabulary import BowVocabulary
from stella_vslam_tpu.feature.orb_extractor import OrbExtractor
from stella_vslam_tpu.feature.orb_params import OrbParams
from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.util.synthetic import BoxWorld, PlaneWorld


def harvest_descriptors(max_total: int = 120_000, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    descs = []

    W, H = 400, 300
    ex = OrbExtractor(OrbParams(), W, H)
    for tex_seed in range(8):
        world = PlaneWorld(width=W, height=H, seed=100 + tex_seed)
        for k in range(10):
            # varied viewpoints: lateral offset + yaw/pitch jitter
            w = rng.uniform(-0.06, 0.06, 3)
            R = np.asarray(lie.so3_exp(jnp.asarray(w)))
            t = np.array([rng.uniform(-1.0, 1.0), rng.uniform(-0.7, 0.7),
                          rng.uniform(-0.5, 0.5)])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            img = world.render(T)
            f = ex.extract(jnp.asarray(img, jnp.float32))
            valid = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[valid])
        print(f"plane seed {tex_seed}: total {sum(map(len, descs))}")

    exb = OrbExtractor(OrbParams(), 640, 320)
    for tex_seed in range(3):
        world = BoxWorld(seed=200 + tex_seed)
        for k in range(8):
            w = rng.uniform(-0.15, 0.15, 3)
            R = np.asarray(lie.so3_exp(jnp.asarray(w)))
            t = rng.uniform(-1.5, 1.5, 3)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            img = world.render(T)
            f = exb.extract(jnp.asarray(img, jnp.float32))
            valid = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[valid])
        print(f"box seed {tex_seed}: total {sum(map(len, descs))}")

    # real-image descriptors: the reference's two shipped equirectangular
    # photos (test/data/equirectangular_image_00{1,2}.jpg — the fixtures its
    # own BoW test uses, bow_vocabulary.cc:40). Harvested from many crops and
    # scales so the vocabulary covers the descriptor distribution of real
    # imagery, not only the synthetic renderers. Skipped when the checkout
    # is absent.
    real_dir = "/root/reference/test/data"
    photos = [os.path.join(real_dir, f"equirectangular_image_00{i}.jpg")
              for i in (1, 2)]
    if all(os.path.exists(p) for p in photos):
        import cv2

        exr = OrbExtractor(OrbParams(), 480, 480)
        n0 = sum(map(len, descs))
        for p in photos:
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            Hh, Ww = img.shape
            for _ in range(24):
                size = int(rng.integers(480, min(Hh, 960)))
                y = int(rng.integers(0, Hh - size + 1))
                x = int(rng.integers(0, Ww - size + 1))
                crop = cv2.resize(img[y:y + size, x:x + size], (480, 480))
                f = exr.extract(jnp.asarray(crop, jnp.float32))
                valid = np.asarray(f.valid)
                descs.append(np.asarray(f.desc)[valid])
        print(f"real photos: +{sum(map(len, descs)) - n0}")

    all_desc = np.concatenate(descs, axis=0)
    # dedup exact duplicates, then subsample
    all_desc = np.unique(all_desc, axis=0)
    if len(all_desc) > max_total:
        sel = rng.choice(len(all_desc), max_total, replace=False)
        all_desc = all_desc[sel]
    return all_desc


def main():
    t0 = time.time()
    descs = harvest_descriptors()
    print(f"harvested {len(descs)} unique descriptors "
          f"in {time.time() - t0:.0f}s")
    vocab = BowVocabulary()
    t0 = time.time()
    vocab.train(descs, num_iters=8)
    print(f"trained in {time.time() - t0:.0f}s")
    out = os.path.join(os.path.dirname(__file__), "..",
                       "stella_vslam_tpu", "data", "vocab_default.npz")
    vocab.save(out)
    print(f"saved {out} ({os.path.getsize(out) / 1024:.0f} KB)")
    # quick sanity: word distribution entropy on a held-out sample
    words = np.asarray(vocab.transform(jnp.asarray(descs[:20000])))
    uniq, cnt = np.unique(words, return_counts=True)
    p = cnt / cnt.sum()
    print(f"words used: {len(uniq)}/{vocab.num_words}, "
          f"entropy {-(p * np.log2(p)).sum():.2f} bits "
          f"(max {np.log2(vocab.num_words):.2f})")


if __name__ == "__main__":
    main()
