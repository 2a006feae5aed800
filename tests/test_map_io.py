"""Map save/load (msgpack + sqlite3) and localization-on-prebuilt-map tests."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System
from tests.synthetic_world import PlaneWorld, lateral_trajectory


def build_map(world, poses, n):
    cfg = Config.from_dict(
        {
            "Camera": world.camera_yaml(),
            "Feature": {"num_levels": 4},
            "Preprocessing": {"min_size": 400},
            "Initializer": {"use_fixed_seed": True},
        }
    )
    slam = System(cfg, inline_mapping=True)
    slam.startup()
    for i in range(n):
        slam.feed_monocular_frame(world.render(poses[i]), i * 0.2)
    slam.shutdown()
    return slam, cfg


@pytest.fixture(scope="module")
def built():
    world = PlaneWorld()
    poses = lateral_trajectory(30, step=0.02)
    slam, cfg = build_map(world, poses, 30)
    return world, poses, slam, cfg


@pytest.mark.parametrize("fmt,ext", [("msgpack", "msg"), ("sqlite3", "db")])
def test_map_roundtrip(built, tmp_path, fmt, ext):
    world, poses, slam, cfg = built
    assert slam.map_db.num_keyframes() >= 2
    path = str(tmp_path / f"map.{ext}")
    slam.save_map_database(path, fmt)

    slam2 = System(cfg, inline_mapping=True)
    slam2.load_map_database(path, fmt)
    db1, db2 = slam.map_db, slam2.map_db
    assert db2.num_keyframes() == db1.num_keyframes()
    assert db2.num_landmarks() == db1.num_landmarks()
    # poses survive byte-exactly enough
    for kid, kf in db1.keyframes.items():
        kf2 = db2.keyframes[kid]
        np.testing.assert_allclose(kf2.pose_cw, kf.pose_cw, atol=1e-5)
    # landmark positions and observations survive
    for lid, lm in db1.landmarks.items():
        lm2 = db2.landmarks[lid]
        np.testing.assert_allclose(lm2.pos_w, lm.pos_w, atol=1e-4)
        assert lm2.observations == lm.observations
    # covisibility graph rebuilt
    k0 = next(iter(db2.keyframes.values()))
    assert k0.graph_node.connections


def test_localization_mode_on_prebuilt_map(built, tmp_path):
    """Load map, disable mapping, relocalize and track (reference CI
    localization runs, main.yml:150-159)."""
    world, poses, slam, cfg = built
    path = str(tmp_path / "map.msgpack")
    slam.save_map_database(path, "msgpack")

    slam2 = System(cfg, inline_mapping=True)
    slam2.load_map_database(path, "msgpack")
    slam2.disable_mapping_module()
    slam2.startup(need_initialize=False)
    assert slam2.tracker.state == "Lost"
    tracked = 0
    for j, i in enumerate([5, 6, 7, 8, 9, 10]):
        pose = slam2.feed_monocular_frame(world.render(poses[i]), 100.0 + j * 0.2)
        slam2.tracker.finalize_pending()
        if slam2.tracker.state == "Tracking":
            tracked += 1
    slam2.shutdown()
    assert tracked >= 3, f"localization tracked only {tracked} frames"
    # mapping disabled: no new keyframes were created
    assert slam2.map_db.num_keyframes() == slam.map_db.num_keyframes()
