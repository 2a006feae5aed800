"""Detached loop-BA writeback: keyframes/landmarks created WHILE the global
BA solves must be brought into the optimized frame by spanning-tree
propagation (reference loop_bundle_adjuster.cc:84-116, 139-175).

The test assembles + solves the global BA, then grows the map (a new
keyframe as a spanning child + a landmark referenced to it) before the
writeback — exactly the interleaving the live system produces — and checks
the propagation invariants numerically."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark
from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars
from stella_vslam_tpu.ops.optim import ba as ba_mod
from stella_vslam_tpu.system import System
from stella_vslam_tpu.util.fetch import fetch_all
from tests.synthetic_world import PlaneWorld, lateral_trajectory


@pytest.mark.slow
def test_spanning_tree_propagation_after_global_ba():
    world = PlaneWorld()
    poses = lateral_trajectory(30, step=0.02)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": 4},
        "Preprocessing": {"min_size": 400},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg, inline_mapping=True)
    slam.startup()
    for i in range(30):
        slam.feed_monocular_frame(world.render(poses[i]), i * 0.2)
    slam.shutdown()
    md = slam.map_db
    gopt = slam.global_optimizer
    assert md.num_keyframes() >= 3

    # perturb non-origin keyframe poses so the BA has something to correct
    # (otherwise the propagation invariants are vacuously satisfied)
    rng = np.random.default_rng(3)
    with md.lock:
        for k, kf in md.keyframes.items():
            if k == md.origin_keyfrm_id:
                continue
            T = kf.pose_cw.copy()
            T[:3, 3] += rng.normal(0, 0.01, 3)
            kf.set_pose_cw(T)

    prob, lm_ids, kf_slots, marker_rows = gopt._assemble_global_ba()
    res = ba_mod.bundle_adjust(
        prob, make_cam_scalars(slam.camera), model="perspective",
        num_first=10, num_second=0)
    camR, camt, lm_new = fetch_all(res.cam_R, res.cam_t, res.lm_pos)

    # --- the map grows while the BA was solving ---
    with md.lock:
        parent = md.keyframes[max(md.keyframes)]
        new_id = md._next_keyfrm_id
        md._next_keyfrm_id += 1
        child = Keyframe.from_payload(
            md, new_id, parent.to_json(), slam.camera, slam.orb_params)
        child.lm_ids[:] = -1
        T_rel = np.eye(4)
        T_rel[:3, 3] = [0.05, 0.01, -0.02]
        child.set_pose_cw(T_rel @ parent.pose_cw)
        md.add_keyframe(child)
        child.graph_node.spanning_parent = parent.id
        parent.graph_node.spanning_children.add(child.id)
        lm = Landmark(md.next_landmark_id(), np.array([0.3, -0.2, 4.1]),
                      child.id)
        md.add_landmark(lm)

        child_before = child.pose_cw.copy()
        parent_before = parent.pose_cw.copy()
        lm_before = lm.pos_w.copy()

    gopt._apply_global_ba_result(
        prob, lm_ids, kf_slots, marker_rows, camR, camt, lm_new)

    parent_after = md.keyframes[parent.id].pose_cw
    # non-vacuous: the BA must actually have moved the parent
    assert not np.allclose(parent_after, parent_before, atol=1e-6), \
        "perturbed BA produced no correction — test is vacuous"

    # invariant 1: the child keeps its relative pose to its spanning parent
    rel_before = child_before @ np.linalg.inv(parent_before)
    np.testing.assert_allclose(
        child.pose_cw, rel_before @ parent_after, atol=1e-5)

    # invariant 2: the non-optimized landmark rides its reference keyframe's
    # before/after poses
    Rb, tb = child_before[:3, :3], child_before[:3, 3]
    Ra, ta = child.pose_cw[:3, :3], child.pose_cw[:3, 3]
    expected = Ra.T @ ((Rb @ lm_before + tb) - ta)
    np.testing.assert_allclose(lm.pos_w, expected, atol=1e-6)

    # optimized landmarks were written directly
    row0 = next(i for i, l in enumerate(lm_ids) if l >= 0)
    np.testing.assert_allclose(
        md.landmarks[lm_ids[row0]].pos_w, lm_new[row0], atol=1e-6)
