"""Bag-of-visual-words vocabulary as on-device matmul tree descent.

Reference: src/stella_vslam/data/bow_vocabulary.{h,cc} wraps a pretrained FBoW
binary vocabulary (.fbow file, 3rd/FBoW submodule) and computes per-image BoW
vectors by walking a k-ary tree of binary centers with CPU popcount loops.

TPU-native redesign: this framework carries its OWN descriptor family (the
seeded BRIEF pattern in feature/orb_pattern.py), so a pretrained OpenCV-ORB
vocabulary would not transfer; instead the vocabulary is a deterministic
seeded hierarchy of binary centers (branching K_BRANCH, DEPTH levels). The
tree descent runs entirely on device as bf16 matmuls: Hamming distance to
every node of a level is (256 - <desc_pm1, center_pm1>)/2, and the child
restriction is a one-hot select — zero gathers. An optional `train` method
refines the centers with Lloyd k-medians over sample descriptors (binary
median = majority vote), also matmul-based.

The leaf id is the "word"; host code builds tf (L1-normalized) BoW vectors
and the inverted index (bow_database.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

K_BRANCH = 10
DEPTH = 4  # 10^4 = 10000 words
_VOCAB_SEED = 0xB0A


def _unpack_pm1_np(desc_u32: np.ndarray) -> np.ndarray:
    bits = np.unpackbits(desc_u32.view(np.uint8).reshape(len(desc_u32), -1),
                         axis=1, bitorder="little")
    return (bits.astype(np.float32) * 2.0 - 1.0)[:, :256]


class BowVocabulary:
    def __init__(self, seed: int = _VOCAB_SEED):
        rng = np.random.default_rng(seed)
        # centers per level: level l has K^(l+1) nodes (children of K^l parents)
        self.centers = []  # list of [K^(l+1), 256] float32 in {-1,+1}
        for lvl in range(DEPTH):
            n = K_BRANCH ** (lvl + 1)
            c = rng.integers(0, 2, size=(n, 256)).astype(np.float32) * 2 - 1
            self.centers.append(c)
        self._centers_dev = None
        self.num_words = K_BRANCH**DEPTH
        self._content_hash = None

    def __hash__(self):
        # content-hash: vocabulary instances are static jit args and the
        # centers are baked into the compiled transform as constants
        if self._content_hash is None:
            import hashlib

            h = hashlib.sha1()
            for c in self.centers:
                h.update(np.ascontiguousarray(c).tobytes())
            self._content_hash = int.from_bytes(h.digest()[:8], "little")
        return self._content_hash

    def __eq__(self, other):
        return type(other) is type(self) and hash(other) == hash(self)

    def _dev_centers(self):
        if self._centers_dev is None:
            self._centers_dev = [
                jnp.asarray(c.T, dtype=jnp.bfloat16) for c in self.centers
            ]  # [256, n] for matmul
        return self._centers_dev

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def transform(self, desc: jnp.ndarray) -> jnp.ndarray:
        """[N, 8] u32 descriptors -> [N] i32 leaf word ids (tree descent)."""
        N = desc.shape[0]
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = ((desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1))
        pm1 = (bits.reshape(N, 256).astype(jnp.bfloat16) * 2 - 1)

        node = jnp.zeros(N, dtype=jnp.int32)
        for lvl, cT in enumerate(self._dev_centers()):
            # similarity to every node at this level: one matmul
            sim = jax.lax.dot_general(
                pm1, cT, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, K^(l+1)]  (higher = closer)
            # restrict to the K children of the current node via one-hot
            n_parents = K_BRANCH**lvl
            simr = sim.reshape(N, n_parents, K_BRANCH)
            ip = jax.lax.broadcasted_iota(jnp.int32, (1, n_parents), 1)
            oh = (node[:, None] == ip).astype(sim.dtype)  # [N, parents]
            child_sim = jnp.einsum("npk,np->nk", simr, oh)  # [N, K]
            best_child = jnp.argmax(child_sim, axis=-1).astype(jnp.int32)
            node = node * K_BRANCH + best_child
        return node

    # ------------------------------------------------------------------
    def compute_bow(self, desc_u32: np.ndarray, valid: np.ndarray):
        """Host entry: returns (word_ids [N] i64 with -1 invalid,
        bow dict word->tf weight, L1-normalized)."""
        words = np.asarray(self.transform(jnp.asarray(desc_u32)))
        return self.words_to_bow(words, valid)

    @staticmethod
    def words_to_bow(words: np.ndarray, valid: np.ndarray):
        """Host half of compute_bow, split out so callers can overlap the
        device `transform` fetch with other round trips (the mapper fetches
        word ids together with its triangulation results)."""
        words = np.where(valid, words.astype(np.int64), -1)
        vw = words[words >= 0]
        if len(vw) == 0:
            return words, {}
        uniq, cnt = np.unique(vw, return_counts=True)
        total = cnt.sum()
        return words, {int(w): float(c) / total for w, c in zip(uniq, cnt)}

    # ------------------------------------------------------------------
    def train(self, descriptors: np.ndarray, num_iters: int = 8, seed: int = 1):
        """Lloyd refinement of the random tree with sample descriptors
        (binary k-medians via majority vote), top level first.

        Fully vectorized: the restricted assignment gathers each sample's
        parent's K child centers ([S,K,256] einsum), the update is one
        scatter-add majority vote — no per-node Python loop. Empty children
        are re-seeded from the descriptors of their own parent cluster so
        the tree keeps full branching where the data lives."""
        pm1 = _unpack_pm1_np(descriptors)
        S = len(pm1)
        rng = np.random.default_rng(seed)
        assign_parent = np.zeros(S, dtype=np.int64)
        for lvl in range(DEPTH):
            n_parents = K_BRANCH**lvl
            n_nodes = n_parents * K_BRANCH
            centers = self.centers[lvl].copy()

            def assign_children(c):
                child_c = c.reshape(n_parents, K_BRANCH, 256)[assign_parent]
                sims = np.einsum("sd,skd->sk", pm1, child_c)
                return assign_parent * K_BRANCH + sims.argmax(-1)

            for _ in range(num_iters):
                assign = assign_children(centers)
                sums = np.zeros((n_nodes, 256), np.float32)
                np.add.at(sums, assign, pm1)
                counts = np.bincount(assign, minlength=n_nodes)
                upd = counts >= 2
                centers[upd] = np.sign(sums[upd] + 1e-3)
                # re-seed empty children from a random sample of the parent
                empty = np.nonzero(~upd)[0]
                if len(empty):
                    parent_counts = counts.reshape(n_parents, K_BRANCH).sum(1)
                    for node in empty:
                        par = node // K_BRANCH
                        if parent_counts[par] > K_BRANCH:
                            cand = np.nonzero(assign_parent == par)[0]
                            centers[node] = pm1[rng.choice(cand)]
            self.centers[lvl] = centers
            assign_parent = assign_children(centers)
        self._centers_dev = None  # refresh device copies
        self._content_hash = None

    # ------------------------------------------------------------------
    @staticmethod
    def score(bow1: dict, bow2: dict) -> float:
        """DBoW2 L1 score: 1 - 0.5 * sum|v - w| = sum min(v_i, w_i) for
        L1-normalized vectors (reference bow_vocabulary.cc score)."""
        s = 0.0
        for w, v in bow1.items():
            u = bow2.get(w)
            if u is not None:
                s += min(v, u)
        return s

    def save(self, path: str):
        """Bit-packed vocabulary file (binary centers -> uint8 bits):
        ~355 KB for the 11,110-node default tree."""
        packed = {
            f"level_{i}": np.packbits((c > 0).astype(np.uint8), axis=1)
            for i, c in enumerate(self.centers)
        }
        np.savez_compressed(path, **packed)

    def save_fbow(self, path: str):
        """Export in the reference's FBoW binary format (data/fbow_io.py) so
        the actual stella_vslam binary can consume a vocabulary trained
        here (train with opencv-pattern descriptors for bit-compatibility)."""
        from stella_vslam_tpu.data.fbow_io import write_fbow

        write_fbow(path, self.centers)

    @staticmethod
    def load(path: str):
        """Load a vocabulary: this framework's .npz format, or a reference
        FBoW `.fbow` binary (system.cc:44-50 mandatory artifact) — detected
        by signature, returned as an API-compatible FbowVocabulary."""
        with open(path, "rb") as f:
            magic = f.read(8)
        if magic[:8] == int(55824124).to_bytes(8, "little"):
            from stella_vslam_tpu.data.fbow_io import read_fbow

            return read_fbow(path)
        v = BowVocabulary()
        data = np.load(path)
        centers = []
        for i in range(DEPTH):
            c = data[f"level_{i}"]
            if c.dtype == np.uint8:  # bit-packed format
                c = np.unpackbits(c, axis=1)[:, :256].astype(np.float32) * 2 - 1
            centers.append(np.ascontiguousarray(c, dtype=np.float32))
        v.centers = centers
        v._centers_dev = None
        v._content_hash = None
        return v

    @staticmethod
    def default() -> "BowVocabulary":
        """The packaged pretrained vocabulary (trained on descriptors
        harvested from the synthetic worlds — reference ships a pretrained
        FBoW file, bow_vocabulary.cc:20-22); falls back to the seeded
        random tree when the asset is missing."""
        import os

        path = os.path.join(os.path.dirname(__file__), "vocab_default.npz")
        if os.path.exists(path):
            return BowVocabulary.load(path)
        return BowVocabulary()
