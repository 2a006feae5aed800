"""Generate tests/data/reference_layout_vocab.fbow — an FBoW vocabulary
binary written by an INDEPENDENT serializer coded field-by-field from the
FBoW struct spec (rmsalinas/fbow `Vocabulary::toStream` layout, as
documented from `fromStream`), NOT by calling
stella_vslam_tpu.data.fbow_io.write_fbow — so a shared encode/decode bug
cannot hide (VERDICT r4 weak item 4 / task 8).

Layout (natural C alignment):
    u64  signature = 55824124
    params (120 B): char[50] desc_name; (2 pad) u32 aligment; u32 nblocks;
        (4 pad) u64 desc_size_bytes_wp; u64 block_size_bytes_wp;
        u64 feature_off_start; u64 child_off_start; u64 total_size;
        i32 desc_type; i32 desc_size; u32 m_k; u32 nwords
    data: nblocks x block_size_bytes_wp, each block:
        u16 N; u8 isLeaf; u8 pad; u32 parent_block
        at child_off_start (=8): m_k x { u32 id_or_childblock; f32 weight }
            (MSB set -> leaf, low 31 bits = word id; else child block index)
        at feature_off_start: m_k x desc_size_bytes_wp center descriptor
            bytes (zero padded to the SIMD alignment)

Deliberate differences from the package writer, to exercise the reader:
  * aligment = 16 (package writer emits 8) -> different feature offsets
    and per-descriptor padding
  * an IRREGULAR tree: the last child of every even-indexed interior block
    is pruned (N = K-1), so block child counts vary — the package writer
    only emits complete K-ary trees
  * leaf word ids assigned sequentially in BFS visit order (FBoW assigns
    ids during construction; any consistent numbering is a valid file)
  * non-uniform leaf weights (1 + word_id % 3) * 0.5

Tree content (centers) comes from the packaged trained vocabulary so the
fixture discriminates REAL image descriptors and can serve as the System
vocabulary in relocalization tests.

Run:  python scripts/make_fbow_fixture.py
"""
from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FBOW_SIGNATURE = 55824124
ALIGMENT = 16
DESC_SIZE = 32  # ORB


def align_up(x: int, a: int) -> int:
    return -(-x // a) * a


def build_blocks(levels):
    """levels: list of per-level center arrays in {-1,+1}, level l shaped
    [K^(l+1), 256] (complete K-ary tree content). Emits blocks in BFS order
    with the last child of every even block pruned."""
    K = levels[0].shape[0]
    depth = len(levels)
    desc_size_wp = align_up(DESC_SIZE, ALIGMENT)
    child_off = 8
    feature_off = align_up(child_off + K * 8, ALIGMENT)
    block_size_wp = align_up(feature_off + K * desc_size_wp, ALIGMENT)

    # BFS over interior nodes of the complete tree, pruning the last child
    # of every even-numbered block; children of pruned nodes never become
    # blocks, so the block list itself is irregular
    blocks = []            # (level, node_index_in_level, parent_block)
    block_of = {}          # (level, node) -> block id
    queue = [(0, 0, 0)]    # root block describes level-0 children
    while queue:
        lvl, node, parent_b = queue.pop(0)
        b = len(blocks)
        blocks.append((lvl, node, parent_b))
        block_of[(lvl, node)] = b
        n_here = K - 1 if (b % 2 == 0 and K > 2) else K
        if lvl < depth - 1:
            for k in range(n_here):
                child_node = node * K + k
                queue.append((lvl + 1, child_node, b))

    nblocks = len(blocks)
    buf = bytearray(nblocks * block_size_wp)
    next_word = 0
    # second pass: fill bytes. Children of block b at (lvl,node) are the
    # complete-tree nodes node*K+k with centers levels[lvl][node*K+k];
    # interior children point at the block BFS created for them.
    for b, (lvl, node, parent_b) in enumerate(blocks):
        n_here = K - 1 if (b % 2 == 0 and K > 2) else K
        off = b * block_size_wp
        is_leaf_level = 1 if lvl == depth - 1 else 0
        struct.pack_into("<HBBI", buf, off, n_here, is_leaf_level, 0,
                         parent_b)
        for k in range(n_here):
            child_node = node * K + k
            if is_leaf_level:
                word = next_word
                next_word += 1
                id_or_child = 0x80000000 | word
                weight = (1 + word % 3) * 0.5
            else:
                id_or_child = block_of[(lvl + 1, child_node)]
                weight = 0.0
            struct.pack_into("<If", buf, off + child_off + k * 8,
                             id_or_child, weight)
            center = levels[lvl][child_node]
            bits = (np.asarray(center) > 0).astype(np.uint8)
            packed = np.packbits(bits, bitorder="little")
            fo = off + feature_off + k * desc_size_wp
            buf[fo: fo + DESC_SIZE] = packed.tobytes()
    params = struct.pack(
        "<50s2xII4xQQQQQiiII", b"orb", ALIGMENT, nblocks, desc_size_wp,
        block_size_wp, feature_off, child_off, len(buf), 0, DESC_SIZE,
        K, next_word)
    return struct.pack("<Q", FBOW_SIGNATURE) + params + bytes(buf)


def main():
    os.environ.setdefault("SVT_WARMUP", "0")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from stella_vslam_tpu.data.bow_vocabulary import BowVocabulary

    vocab = BowVocabulary.default()
    levels = [np.asarray(c) for c in vocab.centers]
    blob = build_blocks(levels)
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "reference_layout_vocab.fbow")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {out} ({len(blob) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
