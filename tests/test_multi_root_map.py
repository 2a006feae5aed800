"""Multi-root map database: a loaded map plus a freshly-initialized submap
coexist as separate spanning-tree components (reference
map_database.h:346-362 spanning_roots_, graph_node.cc:396-451
get_spanning_root / get_keyframes_from_root, map_database.cc:528-541 root
discovery on load). Loads the reference-layout sqlite3 fixture, force-resets
tracking into a NEW submap (map kept), verifies both components stay
walkable, and round-trips the combined two-root map through save/load."""
import os

import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "reference_layout_map.db")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="fixture not generated")


@pytest.fixture(scope="module")
def combined_map(tmp_path_factory):
    world = PlaneWorld()
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": 4, "descriptor_pattern": "opencv"},
        "Preprocessing": {"min_size": 400},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg, inline_mapping=True)
    slam.load_map_database(FIXTURE, "sqlite3")
    n_loaded = slam.map_db.num_keyframes()
    assert n_loaded >= 2
    assert len(slam.map_db.spanning_roots) == 1
    root_a = slam.map_db.spanning_roots[0]

    # force-reset into a NEW submap: the loaded map is kept; the next
    # frames initialize a second component far from the old one
    slam.start_new_submap()
    assert slam.map_db.num_keyframes() == n_loaded  # nothing was cleared
    world_b = PlaneWorld(seed=5)  # different texture: no accidental overlap
    for i, T in enumerate(lateral_trajectory(30)):
        slam.feed_monocular_frame(world_b.render(T), 1000.0 + i * 0.05)
    slam.tracker.finalize_pending()
    assert slam.tracker.state == "Tracking", "submap init failed"
    return slam, root_a, n_loaded


def test_two_roots_registered(combined_map):
    slam, root_a, n_loaded = combined_map
    roots = slam.map_db.spanning_roots
    assert len(roots) == 2, f"expected 2 roots, got {roots}"
    assert root_a in roots


def test_components_walkable_and_disjoint(combined_map):
    slam, root_a, n_loaded = combined_map
    md = slam.map_db
    root_b = next(r for r in md.spanning_roots if r != root_a)
    comp_a = {kf.id for kf in md.get_keyframes_from_root(root_a)}
    comp_b = {kf.id for kf in md.get_keyframes_from_root(root_b)}
    assert len(comp_a) >= 2 and len(comp_b) >= 2
    assert not (comp_a & comp_b), "components share keyframes"
    live = {k for k, kf in md.keyframes.items() if not kf.will_be_erased}
    assert comp_a | comp_b == live, "some keyframe belongs to neither root"
    # every keyframe resolves to its component's root
    for kid in comp_a:
        assert md.get_spanning_root_of(kid) == root_a
    for kid in comp_b:
        assert md.get_spanning_root_of(kid) == root_b


def test_roots_protected_from_erase(combined_map):
    slam, root_a, _ = combined_map
    md = slam.map_db
    n = md.num_keyframes()
    md.erase_keyframe(root_a)  # must refuse
    assert md.num_keyframes() == n
    assert root_a in md.keyframes


def test_combined_map_roundtrip(combined_map, tmp_path):
    slam, root_a, _ = combined_map
    path = str(tmp_path / "combined.msg")
    slam.save_map_database(path, "msgpack")

    world = PlaneWorld()
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        "Feature": {"num_levels": 4, "descriptor_pattern": "opencv"},
        "Preprocessing": {"min_size": 400},
    })
    slam2 = System(cfg, inline_mapping=True)
    slam2.load_map_database(path, "msgpack")
    md2 = slam2.map_db
    assert md2.num_keyframes() == sum(
        1 for kf in slam.map_db.keyframes.values() if not kf.will_be_erased)
    assert len(md2.spanning_roots) == 2, (
        f"roots not recovered on load: {md2.spanning_roots}")
    comp_sizes = sorted(
        len(md2.get_keyframes_from_root(r)) for r in md2.spanning_roots)
    live = sum(1 for kf in md2.keyframes.values() if not kf.will_be_erased)
    assert sum(comp_sizes) == live
