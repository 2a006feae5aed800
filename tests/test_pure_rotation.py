"""Pure-rotation robustness: monocular tracking through a pan segment.

Rotation-only motion is the classic monocular failure regime — zero
baseline means nothing can be triangulated, so the tracker must survive
on the existing map (motion-model + projection matching with the twist
carrying rotation; reference frame_tracker motion-based track) while the
keyframe inserter's new keyframes produce no (or rejected) triangulations
until translation resumes. The reference's CI exercises this implicitly
through hand-held datasets; here it is explicit: translate to build a
map, pan 20 degrees in place, pan back, translate again — assert the pan
itself stays tracked and the trajectory stays metric after re-alignment
(translation legs resume correctly)."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, umeyama_align


def _pose(x, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4)
    T[:3, :3] = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    T[:3, 3] = T[:3, :3] @ np.array([-x, 0.0, 0.0])
    return T


@pytest.mark.slow
def test_tracking_survives_pure_rotation_pan():
    world = PlaneWorld(width=640, height=400, fx=400.0, fy=400.0, depth=4.0,
                       tex_size=2048, meters_per_px=0.012)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": 4},
        "Preprocessing": {"min_size": 600},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg, inline_mapping=True)
    slam.startup()
    traj = []
    x = 0.0
    for i in range(60):                       # translate: build the map
        x = i * 0.015
        traj.append((x, 0.0))
    for i in range(40):                       # pure-rotation pan to 20 deg
        traj.append((x, np.deg2rad(20.0) * (i + 1) / 40))
    for i in range(40):                       # pan back
        traj.append((x, np.deg2rad(20.0) * (39 - i) / 40))
    for i in range(40):                       # translation resumes
        x += 0.015
        traj.append((x, 0.0))
    t = 0.0
    for (xx, yy) in traj:
        slam.feed_monocular_frame(world.render(_pose(xx, yy)), t)
        t += 0.05
    slam.tracker.finalize_pending()
    slam.shutdown()

    res = slam.frame_poses
    ok = [(i, p) for i, (_, p, _, _) in enumerate(res) if p is not None]
    assert len(ok) >= 10
    first = ok[0][0]
    assert first < 20, f"init took too long (frame {first})"
    # every frame after init must stay tracked THROUGH the pan
    tracked_idx = {i for i, _ in ok}
    missing = [i for i in range(first, len(res)) if i not in tracked_idx]
    assert not missing, f"lost frames (pan segment is 60-140): {missing}"
    est = np.array([-p[:3, :3].T @ p[:3, 3] for _, p in ok])
    gt = np.array([[traj[i][0], 0.0, 0.0] for i, _ in ok])
    aligned, _ = umeyama_align(est, gt)
    ate = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, 1))))
    assert ate < 0.05, f"ATE {ate:.3f} m through the pure-rotation pan"
