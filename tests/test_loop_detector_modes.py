"""Loop-detector candidate policies: graph-distance rejection mode and
best-of-all-validated-candidates selection (reference loop_detector.cc:89-127
BFS reject set; cc:207-356 iterates ALL validated candidates)."""
from types import SimpleNamespace

from stella_vslam_tpu.module.loop_detector import LoopDetector


class _StubCam:
    class _M:
        name = "PERSPECTIVE"

    model = _M()
    width, height = 640, 480

    class params:
        fx = fy = 400.0
        cx, cy = 320.0, 240.0
        width, height = 640, 480
        focal_x_baseline = 0.0


def _orb():
    from stella_vslam_tpu.feature.orb_params import OrbParams

    return OrbParams.from_yaml({"num_levels": 4})


def _graph_kf(kf_id, parent=None, children=(), covis=()):
    return SimpleNamespace(
        id=kf_id,
        will_be_erased=False,
        graph_node=SimpleNamespace(
            spanning_parent=parent,
            spanning_children=set(children),
            loop_edges=set(),
            get_covisibilities=lambda c=tuple(covis): list(c),
            get_top_n_covisibilities=lambda n, c=tuple(covis): list(c)[:n],
        ),
    )


def _chain_map(n):
    """Spanning-tree chain 0-1-...-(n-1); each keyframe covisible with its
    immediate neighbors only."""
    kfs = {}
    for i in range(n):
        covis = [j for j in (i - 1, i + 1) if 0 <= j < n]
        kfs[i] = _graph_kf(
            i,
            parent=i - 1 if i > 0 else None,
            children=[i + 1] if i + 1 < n else [],
            covis=covis,
        )
    return SimpleNamespace(keyframes=kfs)


def _detector_with_captured_reject(map_db, n, **kwargs):
    captured = {}

    def acquire(bow_cur, min_score, reject, keyframes):
        captured["reject"] = set(reject)
        return [i for i in range(n) if i not in reject]

    bow_db = SimpleNamespace(
        bow_vecs={i: {0: 1.0} for i in range(n)},
        vocab=SimpleNamespace(score=lambda a, b: 0.5),
        acquire_keyframes=acquire,
    )
    det = LoopDetector(_StubCam(), _orb(), bow_db, min_continuity=1, **kwargs)
    return det, captured


def test_default_mode_rejects_connected_set_only():
    n = 12
    map_db = _chain_map(n)
    det, cap = _detector_with_captured_reject(map_db, n)
    cands = det.detect_loop_candidates(map_db, map_db.keyframes[n - 1])
    # covisibilities of kf 11 = {10}; reject = {11, 10}
    assert cap["reject"] == {n - 1, n - 2}
    assert 0 in cands and n - 3 in cands


def test_graph_distance_mode_rejects_bfs_neighborhood():
    n = 12
    map_db = _chain_map(n)
    det, cap = _detector_with_captured_reject(
        map_db, n, reject_by_graph_distance=True, min_distance_on_graph=5)
    cands = det.detect_loop_candidates(map_db, map_db.keyframes[n - 1])
    # BFS from 11 along the spanning chain: hops of distance < 5 ->
    # {11, 10, 9, 8, 7} rejected; 6 and below survive
    assert cap["reject"] == {11, 10, 9, 8, 7}
    assert 7 not in cands and 6 in cands and 0 in cands
    # a nearby candidate (distance 2) is rejected ONLY in this mode
    det2, cap2 = _detector_with_captured_reject(map_db, n)
    det2.detect_loop_candidates(map_db, map_db.keyframes[n - 1])
    assert 9 not in cap2["reject"]  # default mode keeps it


def test_validate_candidates_picks_best_not_first():
    det = LoopDetector(
        _StubCam(), _orb(),
        SimpleNamespace(bow_vecs={}, vocab=None), min_continuity=1)
    # decoy near-miss candidate (id 3) validates first with fewer inliers;
    # the true loop (id 7) must win on post-refinement inlier count
    scores = {3: 22, 7: 61, 9: None}
    calls = []

    def fake_select(map_db, cur_kf, cand_id):
        calls.append(cand_id)
        s = scores[cand_id]
        if s is None:
            return None
        return cand_id, (1.0, None, None), None, None, s

    det.select_loop_candidate_via_Sim3 = fake_select
    out = det.validate_candidates(None, None, [3, 7, 9])
    assert calls == [3, 7, 9]  # every candidate evaluated
    assert out is not None and out[0] == 7
    # all candidates failing -> None
    scores = {3: None, 7: None, 9: None}
    assert det.validate_candidates(None, None, [3, 7, 9]) is None
