"""acquire_keyframes covisibility-accumulated score filtering
(reference bow_database.cc:99-162)."""
from types import SimpleNamespace

from stella_vslam_tpu.data.bow_database import BowDatabase
from stella_vslam_tpu.data.bow_vocabulary import BowVocabulary


def _kf(covis):
    return SimpleNamespace(
        will_be_erased=False,
        graph_node=SimpleNamespace(get_top_n_covisibilities=lambda n: covis),
    )


def _vec(score, filler_word):
    """L1-normalized vec scoring `score` against the query {0:.5, 1:.5}."""
    a = score / 2.0
    return {0: a, 1: a, filler_word: 1.0 - 2 * a}


def test_cluster_filtering_prefers_covisibility_clusters():
    db = BowDatabase(BowVocabulary())
    query = {0: 0.5, 1: 0.5}
    # cluster A: three mutually covisible keyframes with moderate scores
    db.add_keyframe(1, _vec(0.50, 101))
    db.add_keyframe(2, _vec(0.45, 102))
    db.add_keyframe(3, _vec(0.40, 103))
    # B: isolated keyframe with the highest INDIVIDUAL score
    db.add_keyframe(9, _vec(0.55, 109))
    keyframes = {
        1: _kf([2, 3]), 2: _kf([1, 3]), 3: _kf([1, 2]), 9: _kf([])
    }

    # raw ranking (no graph): isolated B wins on pair score alone
    raw = db.acquire_keyframes(query)
    assert raw[0] == 9

    # cluster-accumulated ranking: A's cluster sum (1.35) dwarfs B's (0.55 <
    # 0.75 x 1.35) -> B is filtered out, A's best member leads
    filtered = db.acquire_keyframes(query, keyframes=keyframes)
    assert filtered[0] == 1
    assert 9 not in filtered
    # one entry per surviving cluster (best-of-cluster), not all members
    assert set(filtered) == {1}


def test_cluster_filtering_respects_reject_and_min_score():
    db = BowDatabase(BowVocabulary())
    query = {0: 0.5, 1: 0.5}
    db.add_keyframe(1, _vec(0.5, 101))
    db.add_keyframe(2, _vec(0.5, 102))
    keyframes = {1: _kf([]), 2: _kf([])}
    out = db.acquire_keyframes(query, reject={1}, keyframes=keyframes)
    assert out == [2]
    assert db.acquire_keyframes(query, min_score=0.9, keyframes=keyframes) == []
