"""FBoW (.fbow) vocabulary file interop.

The reference loads its mandatory vocabulary from an FBoW binary file
(src/stella_vslam/system.cc:44-50, data/bow_vocabulary.cc:20-22; the format
is defined by the vendored 3rd/FBoW submodule — rmsalinas/fbow `Vocabulary`).
This module reads and writes that on-disk format directly so a vocabulary
produced for the actual stella_vslam binary can be used for place recognition
here (pair it with `Feature.descriptor_pattern: opencv` so descriptors are
bit-comparable), and vocabularies trained here can be exported for the
reference.

Binary layout (fbow::Vocabulary::toStream / fromStream):

    uint64  signature = 55824124
    params  (120 bytes, natural C alignment):
        char[50]  desc_name           (e.g. "orb"), offset 0
        u32       aligment            offset 52 (2 pad bytes after the name)
        u32       nblocks             offset 56
        u64       desc_size_bytes_wp  offset 64 (descriptor bytes + pad)
        u64       block_size_bytes_wp offset 72
        u64       feature_off_start   offset 80
        u64       child_off_start     offset 88
        u64       total_size          offset 96
        i32       desc_type           offset 104 (OpenCV type; 0 = CV_8UC1)
        i32       desc_size           offset 108 (32 for ORB)
        u32       m_k                 offset 112 (max children per node)
        u32       nwords              offset 116
    data    total_size bytes = nblocks * block_size_bytes_wp

Each block describes one interior node and its <= m_k children:

    u16   N            number of children actually present
    u8    isLeaf       1 when the block's children are leaves
    u8    pad
    u32   parent_id
    block_node_info[m_k] at child_off_start (= 8):
        u32  id_or_childblock   MSB set -> leaf, low 31 bits = word id;
                                else the child's block index
        f32  weight             word idf weight (leaves)
    features[m_k] at feature_off_start: desc_size_bytes_wp bytes each
        (the child's binary center descriptor)

Tree descent (fbow::Vocabulary::transform): start at block 0, pick the child
whose center has minimal Hamming distance to the query descriptor, follow
id_or_childblock until a leaf; the leaf's low-31 bits are the word id.

No genuine .fbow artifact exists in this environment (the reference's FBoW
submodule is not checked out and the vocab file is downloaded at CI time,
.github/workflows/main.yml:57-59), so the reader is validated by round-trip
against this writer plus structural checks mirroring fromStream's.
"""
from __future__ import annotations

import struct
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

FBOW_SIGNATURE = 55824124
_PARAMS_FMT = "<50s2xII4xQQQQQiiII"  # 120 bytes, natural C alignment
_PARAMS_SIZE = struct.calcsize(_PARAMS_FMT)
assert _PARAMS_SIZE == 120
_NODE_INFO = np.dtype([("id_or_childblock", "<u4"), ("weight", "<f4")])


class FbowVocabulary:
    """A (possibly irregular) FBoW tree, exposed with the same API surface
    as data/bow_vocabulary.BowVocabulary: `transform` (device tree descent),
    `compute_bow` / `words_to_bow`, `score`, `num_words`.

    Device design: per-block tensors instead of per-level matmuls (genuine
    FBoW trees are irregular — variable branching, pruned children, variable
    depth). The descent keeps a per-descriptor current-block index and does
    `max_depth` rounds of gather + one small einsum; all descriptors advance
    in lockstep, finished ones are masked. Shapes are fixed by the
    vocabulary, so the program compiles once.
    """

    def __init__(self, centers_pm1: np.ndarray, node_info: np.ndarray,
                 n_children: np.ndarray, max_depth: int,
                 desc_name: str = "orb"):
        # centers_pm1: [nblocks, m_k, 256] float32 in {-1,+1} (invalid rows 0)
        self.centers_pm1 = centers_pm1
        self.node_info = node_info          # [nblocks, m_k] u32
        self.weights = None                 # [nblocks, m_k] f32 (set by reader)
        self.n_children = n_children        # [nblocks] i32
        self.max_depth = int(max_depth)
        self.desc_name = desc_name
        leaf = (node_info & 0x80000000) != 0
        ids = node_info & 0x7FFFFFFF
        self.num_words = int(ids[leaf].max()) + 1 if leaf.any() else 0
        self._dev = None
        self._content_hash = None

    # -- jit-hashability (vocabulary is a static argument; centers are baked
    #    into the compiled program as constants)
    def __hash__(self):
        if self._content_hash is None:
            import hashlib

            h = hashlib.sha1()
            h.update(np.ascontiguousarray(self.centers_pm1).tobytes())
            h.update(np.ascontiguousarray(self.node_info).tobytes())
            self._content_hash = int.from_bytes(h.digest()[:8], "little")
        return self._content_hash

    def __eq__(self, other):
        return type(other) is type(self) and hash(other) == hash(self)

    def _dev_tables(self):
        if self._dev is None:
            # split the u32 id_or_childblock into int32-safe planes (x64 is
            # disabled under jit): MSB -> leaf flag, low 31 bits -> payload
            leaf = ((self.node_info & 0x80000000) != 0)
            payload = (self.node_info & 0x7FFFFFFF).astype(np.int32)
            self._dev = (
                jnp.asarray(self.centers_pm1, dtype=jnp.bfloat16),
                jnp.asarray(leaf),
                jnp.asarray(payload),
                jnp.asarray(self.n_children, dtype=jnp.int32),
            )
        return self._dev

    @partial(jax.jit, static_argnames=("self",))
    def transform(self, desc: jnp.ndarray) -> jnp.ndarray:
        """[N, 8] u32 descriptors -> [N] i32 word ids (-1 never occurs for a
        well-formed vocabulary; unreachable descriptors map to word 0)."""
        centers, leaf_tbl, payload_tbl, n_children = self._dev_tables()
        N = desc.shape[0]
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
        pm1 = bits.reshape(N, 256).astype(jnp.bfloat16) * 2 - 1

        blk = jnp.zeros(N, dtype=jnp.int32)
        word = jnp.zeros(N, dtype=jnp.int32)
        done = jnp.zeros(N, dtype=bool)
        mk = centers.shape[1]
        for _ in range(self.max_depth):
            c = centers[blk]                      # [N, mk, 256] gather
            sim = jnp.einsum("nd,nkd->nk", pm1, c,
                             preferred_element_type=jnp.float32)
            nc = n_children[blk]                  # [N]
            kidx = jax.lax.broadcasted_iota(jnp.int32, (N, mk), 1)
            sim = jnp.where(kidx < nc[:, None], sim, -jnp.inf)
            best = jnp.argmax(sim, axis=-1).astype(jnp.int32)
            is_leaf = leaf_tbl[blk, best]         # [N] bool
            payload = payload_tbl[blk, best]      # [N] i32 (word id or block)
            word = jnp.where(~done & is_leaf, payload, word)
            blk = jnp.where(done | is_leaf, blk, payload)
            done = done | is_leaf
        return word

    def compute_bow(self, desc_u32: np.ndarray, valid: np.ndarray):
        words = np.asarray(self.transform(jnp.asarray(desc_u32)))
        return self.words_to_bow(words, valid)

    @staticmethod
    def words_to_bow(words: np.ndarray, valid: np.ndarray):
        words = np.where(valid, words.astype(np.int64), -1)
        vw = words[words >= 0]
        if len(vw) == 0:
            return words, {}
        uniq, cnt = np.unique(vw, return_counts=True)
        total = cnt.sum()
        return words, {int(w): float(c) / total for w, c in zip(uniq, cnt)}

    @staticmethod
    def score(bow1: Dict[int, float], bow2: Dict[int, float]) -> float:
        s = 0.0
        for w, v in bow1.items():
            u = bow2.get(w)
            if u is not None:
                s += min(v, u)
        return s


# ---------------------------------------------------------------------------
def read_fbow(path: str) -> FbowVocabulary:
    with open(path, "rb") as f:
        raw = f.read()
    (sig,) = struct.unpack_from("<Q", raw, 0)
    if sig != FBOW_SIGNATURE:
        raise ValueError(
            f"{path}: not an FBoW vocabulary (signature {sig:#x}, "
            f"expected {FBOW_SIGNATURE:#x})")
    (desc_name, aligment, nblocks, desc_size_wp, block_size_wp,
     feature_off, child_off, total_size, desc_type, desc_size,
     m_k, nwords) = struct.unpack_from(_PARAMS_FMT, raw, 8)
    desc_name = desc_name.split(b"\0")[0].decode("ascii", "replace")
    if desc_size != 32:
        raise ValueError(
            f"{path}: descriptor size {desc_size} bytes unsupported "
            "(expected 32-byte ORB)")
    data = np.frombuffer(raw, np.uint8, count=total_size,
                         offset=8 + _PARAMS_SIZE)
    blocks = data[: nblocks * block_size_wp].reshape(nblocks, block_size_wp)

    n_children = blocks[:, 0:2].copy().view("<u2")[:, 0].astype(np.int32)
    n_children = np.minimum(n_children, m_k)
    info_bytes = blocks[:, child_off: child_off + m_k * 8]
    info = np.ascontiguousarray(info_bytes).view(_NODE_INFO).reshape(
        nblocks, m_k)
    feats = blocks[:, feature_off: feature_off + m_k * desc_size_wp]
    feats = np.ascontiguousarray(feats).reshape(nblocks, m_k, desc_size_wp)
    feats = feats[:, :, :desc_size]  # drop alignment padding

    bits = np.unpackbits(feats.reshape(-1, desc_size), axis=1,
                         bitorder="little")
    pm1 = (bits.astype(np.float32) * 2 - 1).reshape(nblocks, m_k, 256)
    kmask = np.arange(m_k)[None, :] < n_children[:, None]
    pm1 *= kmask[:, :, None]

    # depth bound: walk down following max child-block index per level
    depth, frontier = 0, {0}
    seen = set()
    while frontier and depth < 64:
        depth += 1
        nxt = set()
        for b in frontier:
            if b in seen or b >= nblocks:
                continue
            seen.add(b)
            for k in range(n_children[b]):
                v = int(info[b, k]["id_or_childblock"])
                if not (v & 0x80000000):
                    nxt.add(v)
        frontier = nxt
    vocab = FbowVocabulary(pm1, info["id_or_childblock"].copy(),
                           n_children, depth, desc_name)
    vocab.weights = info["weight"].copy()
    if nwords and vocab.num_words > nwords:
        # ids must stay within the declared word count
        raise ValueError(f"{path}: corrupt vocabulary (word id "
                         f"{vocab.num_words - 1} >= nwords {nwords})")
    vocab.num_words = max(vocab.num_words, int(nwords))
    return vocab


def write_fbow(path: str, centers_pm1_levels, desc_name: str = "orb",
               aligment: int = 8):
    """Serialize a COMPLETE k-ary tree (list of per-level center arrays,
    level l shaped [K^(l+1), 256] in {-1,+1} — the layout of
    data/bow_vocabulary.BowVocabulary.centers) into the FBoW on-disk format.

    Blocks are emitted in BFS order: block 0 is the root; an interior node at
    level l < depth-1 becomes a block whose children's centers come from
    level l+1. Leaf children carry sequential word ids with MSB set and
    uniform weight 1.0 (FBoW stores idf weights; uniform weights reproduce
    this framework's tf-only scoring)."""
    K = centers_pm1_levels[0].shape[0]
    depth = len(centers_pm1_levels)
    desc_size = 32
    desc_size_wp = -(-desc_size // aligment) * aligment
    child_off = 8
    feature_off = child_off + K * 8
    # feature area aligned
    feature_off = -(-feature_off // aligment) * aligment
    block_size = feature_off + K * desc_size_wp
    block_size_wp = -(-block_size // aligment) * aligment

    # interior nodes: levels 0..depth-1 have K^l blocks each (root = K^0)
    nblocks = sum(K**l for l in range(depth))
    buf = np.zeros((nblocks, block_size_wp), np.uint8)
    # block index of interior node (level l, index i) in BFS order
    first_block_of_level = np.cumsum([0] + [K**l for l in range(depth)])

    nwords = K**depth
    for lvl in range(depth):
        c = centers_pm1_levels[lvl]
        for parent in range(K**lvl):
            b = first_block_of_level[lvl] + parent
            blk = buf[b]
            blk[0:2].view("<u2")[0] = K
            blk[2] = 1 if lvl == depth - 1 else 0
            blk[4:8].view("<u4")[0] = (
                first_block_of_level[lvl - 1] + parent // K if lvl else 0)
            info = blk[child_off: child_off + K * 8].view(_NODE_INFO)
            for k in range(K):
                node = parent * K + k
                if lvl == depth - 1:
                    info[k]["id_or_childblock"] = 0x80000000 | node
                    info[k]["weight"] = 1.0
                else:
                    info[k]["id_or_childblock"] = (
                        first_block_of_level[lvl + 1] + node)
                    info[k]["weight"] = 0.0
                center_bits = (c[node] > 0).astype(np.uint8)
                packed = np.packbits(center_bits, bitorder="little")
                blk[feature_off + k * desc_size_wp:
                    feature_off + k * desc_size_wp + desc_size] = packed

    total_size = nblocks * block_size_wp
    params = struct.pack(
        _PARAMS_FMT, desc_name.encode("ascii"), aligment, nblocks,
        desc_size_wp, block_size_wp, feature_off, child_off, total_size,
        0, desc_size, K, nwords)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", FBOW_SIGNATURE))
        f.write(params)
        f.write(buf.tobytes())
