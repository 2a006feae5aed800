"""Map save/load (msgpack + sqlite3) and localization-on-prebuilt-map tests."""
import numpy as np
import pytest

from stella_vslam_tpu.config import Config
from stella_vslam_tpu.system import System

@pytest.fixture(scope="module")
def built(base_map_run):
    # session-shared base run (tests/conftest.py); this module re-saves it
    # in each format under test
    world, poses, slam, cfg_dict, _path = base_map_run
    return world, poses, slam, Config.from_dict(cfg_dict)


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


def test_sqlite3_reference_schema(built, tmp_path):
    """The .db layout must match the reference byte-for-byte: table + column
    names (keyframe.h:88-102, landmark.h:50-58, map_database.h:323-329,
    camera_database.cc:234-253) and blob encodings (cv::KeyPoint structs,
    column-major f64 pose, i32 id arrays)."""
    import sqlite3

    world, poses, slam, cfg = built
    path = str(tmp_path / "schema.db")
    slam.save_map_database(path, "sqlite3")
    conn = sqlite3.connect(path)
    c = conn.cursor()

    def cols(tbl):
        return [r[1] for r in c.execute(f"PRAGMA table_info({tbl})")]

    assert cols("stats") == ["id", "frame_next_id", "keyframe_next_id",
                             "landmark_next_id"]
    assert cols("keyframes") == [
        "id", "src_frm_id", "ts", "cam", "orb_params", "pose_cw", "n_keypts",
        "undist_keypts", "x_rights", "depths", "descs", "n_markers", "markers"]
    assert cols("landmarks") == ["id", "first_keyfrm", "pos_w", "ref_keyfrm",
                                 "n_vis", "n_fnd"]
    assert cols("associations") == [
        "id", "lm_ids", "span_parent", "n_spanning_children",
        "spanning_children", "n_loop_edges", "loop_edges"]
    assert cols("cameras")[:6] == ["id", "name", "setup_type", "model_type",
                                   "color_type", "cols"]

    n, kpt_blob, pose_blob, desc_blob = c.execute(
        "SELECT n_keypts, undist_keypts, pose_cw, descs FROM keyframes"
    ).fetchone()
    assert len(kpt_blob) == 28 * n  # packed cv::KeyPoint structs
    assert len(pose_blob) == 16 * 8  # 4x4 float64
    assert len(desc_blob) == 32 * n  # 256-bit descriptors
    # pose blob is column-major: reassemble and compare against the map
    kf_id = c.execute("SELECT id FROM keyframes").fetchone()[0]
    pose = np.frombuffer(pose_blob, "<f8").reshape(4, 4).T
    np.testing.assert_allclose(
        pose, slam.map_db.keyframes[kf_id].pose_cw, atol=1e-12)
    (lm_blob,) = c.execute(
        "SELECT lm_ids FROM associations WHERE id=?", (kf_id,)).fetchone()
    assert np.array_equal(np.frombuffer(lm_blob, "<i4"),
                          slam.map_db.keyframes[kf_id].lm_ids)
    conn.close()


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
