"""Keyframe inverted index for place recognition.

Reference: src/stella_vslam/data/bow_database.{h,cc} — word-id -> keyframe
lists; acquire_keyframes: shared-word counting -> min common words =
ratio * max -> L1 similarity scores above min_score (bow_database.cc:58-162).
(The reference's covisibility-accumulated scoring lives in the loop detector;
kept there.)
"""
from __future__ import annotations

from typing import Dict, List, Set

import numpy as np


class BowDatabase:
    def __init__(self, vocab):
        self.vocab = vocab
        self.keyfrms_in_word: Dict[int, Set[int]] = {}
        self.bow_vecs: Dict[int, dict] = {}  # keyframe id -> bow vector

    def add_keyframe(self, kf_id: int, bow_vec: dict):
        self.bow_vecs[kf_id] = bow_vec
        for w in bow_vec:
            self.keyfrms_in_word.setdefault(w, set()).add(kf_id)

    def erase_keyframe(self, kf_id: int):
        vec = self.bow_vecs.pop(kf_id, None)
        if vec is None:
            return
        for w in vec:
            s = self.keyfrms_in_word.get(w)
            if s is not None:
                s.discard(kf_id)

    def clear(self):
        self.keyfrms_in_word = {}
        self.bow_vecs = {}

    # ------------------------------------------------------------------
    def acquire_keyframes(
        self,
        bow_vec: dict,
        min_score: float = 0.0,
        num_common_words_thr_ratio: float = 0.8,
        reject: Set[int] = frozenset(),
    ) -> List[int]:
        """Returns candidate keyframe ids (reference acquire_keyframes)."""
        common: Dict[int, int] = {}
        for w in bow_vec:
            for kf_id in self.keyfrms_in_word.get(w, ()):
                if kf_id in reject:
                    continue
                common[kf_id] = common.get(kf_id, 0) + 1
        if not common:
            return []
        max_common = max(common.values())
        thr = num_common_words_thr_ratio * max_common
        out = []
        for kf_id, n in common.items():
            if n <= thr:
                continue
            s = self.vocab.score(bow_vec, self.bow_vecs.get(kf_id, {}))
            if s >= min_score:
                out.append((s, kf_id))
        out.sort(reverse=True)
        return [kf_id for _, kf_id in out]
