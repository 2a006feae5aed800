"""End-to-end monocular SLAM through the THREADED pipeline (the production
configuration the bench runs): pipelined tracker dispatch + finalize thread +
mapper thread with staged keyframe events (_event_start/_event_finish) +
deferred BA writeback. Every other e2e test uses inline_mapping=True; this one
certifies the asynchronous orchestration — queue handoff, staged-event
polling, pause/resume barriers, and clean shutdown settle.

Reference behavior: mapping_module.cc:121-137 (run loop), :199-208
(backpressure), system.cc pause/resume contract.
"""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory, umeyama_align


@pytest.fixture(scope="module")
def threaded_run():
    world = PlaneWorld()
    n = 60
    poses_gt = lateral_trajectory(n)
    cfg = Config.from_dict(
        {
            "Camera": world.camera_yaml(),
            "Feature": {"num_levels": 4},
            "Preprocessing": {"min_size": 400},
            "Initializer": {"use_fixed_seed": True},
        }
    )
    sys_ = System(cfg, inline_mapping=False)
    sys_.startup()
    paused_once = False
    for i, T in enumerate(poses_gt):
        img = world.render(T)
        sys_.feed_monocular_frame(img, i * 0.05)
        if i == 40 and not paused_once:
            # exercise the pause barrier mid-run: a staged event + pending
            # BA must settle BEFORE is_paused flips (the loop-closing thread
            # relies on this ordering to correct the map safely)
            sys_.pause_other_threads()
            assert sys_.mapper.is_paused()
            assert getattr(sys_.mapper, "_event", None) is None
            assert sys_.mapper._pending_ba is None
            sys_.resume_other_threads()
            paused_once = True
    sys_.shutdown()
    by_ts = {round(ts / 0.05): pose for (ts, pose, _, _) in sys_.frame_poses}
    results = [by_ts.get(i) for i in range(n)]
    return sys_, poses_gt, results


def test_threaded_tracks_and_maps(threaded_run):
    sys_, poses_gt, results = threaded_run
    tracked = [r is not None for r in results]
    first = tracked.index(True)
    assert first < 15, f"initialized too late: frame {first}"
    lost = sum(1 for t in tracked[first:] if not t)
    assert lost <= 2, f"{lost} frames lost after init (threaded pipeline)"
    assert sys_.map_db.num_keyframes() >= 2
    assert sys_.map_db.num_landmarks() > 80
    # every queued keyframe event was processed (none stranded in the staged
    # slot or the queue at shutdown)
    assert getattr(sys_.mapper, "_event", None) is None
    assert sys_.mapper._queue.empty()
    assert sys_.mapper.num_processed >= 2
    # publisher timing parity (reference system.cc:540-543): extraction and
    # tracking wall times are populated per frame
    assert sys_.frame_publisher.extraction_time_ms > 0.0
    assert sys_.frame_publisher.tracking_time_ms > 0.0


def test_threaded_ate(threaded_run):
    sys_, poses_gt, results = threaded_run
    est, gt = [], []
    for T_gt, pose in zip(poses_gt, results):
        if pose is None:
            continue
        est.append(-pose[:3, :3].T @ pose[:3, 3])
        gt.append(-T_gt[:3, :3].T @ T_gt[:3, 3])
    est, gt = np.array(est), np.array(gt)
    assert len(est) >= 30
    aligned, _ = umeyama_align(est, gt)
    ate_rmse = np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1)))
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    rel = ate_rmse / max(traj_len, 1e-9)
    # Loose bound by design: this test certifies the async orchestration, not
    # accuracy (inline e2e tests + bench do that). The first-run JIT compiles
    # stall the mapper thread, so fewer keyframe events complete (~3 kf /
    # 1 BA instead of 6 kf / 5 BA) and ATE lands ~10% instead of the ~3%
    # steady state (scripts/measure_threaded_ate.py quantifies both regimes).
    assert rel < 0.13, f"ATE RMSE {ate_rmse:.4f} m over {traj_len:.2f} m ({rel:.1%})"


def test_threaded_ba_settles_on_shutdown(threaded_run):
    sys_, _, _ = threaded_run
    # the deferred local-BA writeback must have landed (no pending slot) and
    # at least one BA ran through the staged path
    assert sys_.mapper._pending_ba is None
    assert len(sys_.mapper.local_ba_ms) >= 1
