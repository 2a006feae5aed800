"""Post-loop-BA duplicate-layer merge (beyond-reference; see
GlobalOptimizationModule._merge_duplicate_layers).

The reference's replace_duplicated_landmarks
(global_optimization_module.cc:400-491) only fuses the loop keyframe's
covisibility neighborhood, so a revisit leg that mapped a duplicate
landmark layer (occlusion thinned re-acquisition — the panels-world
failure mode) stays decoupled away from the seam. The merge pass detects
keyframe pairs that are spatially close but covisibility-disconnected and
temporally distant, fuses each side's landmarks into the other, and
re-optimizes.

This test fabricates the failure mode directly: the SAME rendered
trajectory tracked twice into one map database as two spanning roots
(start_new_submap) — two coincident keyframe layers observing duplicate
landmarks with zero covisibility between them — then asserts the merge
creates cross-layer covisibility and collapses duplicate landmarks."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory


def _cross_layer_links(md, layer_b_root):
    """Covisibility edges between the two spanning components."""
    in_b = {kf.id for kf in md.get_keyframes_from_root(layer_b_root)}
    n = 0
    for kf in md.keyframes.values():
        if kf.will_be_erased or kf.id in in_b:
            continue
        n += sum(1 for c in kf.graph_node.get_covisibilities() if c in in_b)
    return n


@pytest.mark.slow
def test_merge_reconnects_duplicate_layers():
    world = PlaneWorld()
    poses = lateral_trajectory(70, step=0.02)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": 4},
        "Preprocessing": {"min_size": 400},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg, inline_mapping=True)
    slam.disable_loop_detector()  # the merge is what is under test, not
    slam.startup()                # the BoW loop-closing path
    for i, T in enumerate(poses):
        slam.feed_monocular_frame(world.render(T), i * 0.05)
    slam.tracker.finalize_pending()
    assert slam.tracker.state == "Tracking"

    # second pass over the SAME trajectory as a fresh submap: mono init
    # re-normalizes against the same scene, so layer B lands coincident
    # with layer A in map coordinates but shares nothing with it
    slam.start_new_submap()
    for i, T in enumerate(poses):
        slam.feed_monocular_frame(world.render(T), 100.0 + i * 0.05)
    slam.tracker.finalize_pending()
    assert slam.tracker.state == "Tracking", "second-layer init failed"

    md = slam.map_db
    assert len(md.spanning_roots) == 2
    root_b = md.spanning_roots[1]
    n_links_before = _cross_layer_links(md, root_b)
    assert n_links_before == 0, (
        "fixture broken: layers already coupled — the merge would be "
        "vacuous")
    n_lms_before = md.num_landmarks()
    n_kfs = md.num_keyframes()
    assert n_kfs >= 8

    slam.global_optimizer._merge_duplicate_layers()

    n_links_after = _cross_layer_links(md, root_b)
    assert n_links_after > 0, "merge created no cross-layer covisibility"
    # fused duplicates: replace_landmark erases one of each merged pair
    assert md.num_landmarks() < n_lms_before, (
        f"no landmarks fused ({n_lms_before} before/after)")
    slam.shutdown()
