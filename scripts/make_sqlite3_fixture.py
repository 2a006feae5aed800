"""Generate tests/data/reference_layout_map.db — a sqlite3 map in the
REFERENCE's exact on-disk layout, written by an independent writer coded
strictly from the reference C++ (NOT stella_vslam_tpu.io, so a shared
encode/decode bug cannot hide): table/column set from
io/map_database_io_sqlite3.cc:86 + keyframe.h:88-102 + landmark.h:50-58 +
map_database.h:323-329 + camera_database.cc:232-253; blob encodings from
keyframe.cc:302-362 (col-major f64 pose, packed cv::KeyPoint structs with
angle in degrees, N x 32 u8 descriptors, i32 id arrays) and the stats bind
order of map_database_io_sqlite3.cc:83-129 (frame_next_id left NULL, as the
reference leaves bind index 2 unbound).

The map content comes from a small deterministic in-repo SLAM run so the
fixture carries realistic descriptors and the reverse-interop test can
relocalize real rendered frames against the loaded map.

Run:  python scripts/make_sqlite3_fixture.py
"""
from __future__ import annotations

import os
import sqlite3
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# run on CPU like the test that consumes the fixture (the axon sitecustomize
# pins the TPU tunnel, where cold compiles for this one-off config cost
# minutes); must happen before stella_vslam_tpu pulls in jax programs
os.environ["SVT_WARMUP"] = "0"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# cv::KeyPoint memory layout (28 bytes): pt.x, pt.y, size, angle, response
# (float32), octave, class_id (int32) — keyframe.cc:329 memcpies the structs
KEYPT = np.dtype([
    ("x", "<f4"), ("y", "<f4"), ("size", "<f4"), ("angle", "<f4"),
    ("response", "<f4"), ("octave", "<i4"), ("class_id", "<i4"),
])


def write_reference_layout_db(path, slam):
    map_db = slam.map_db
    conn = sqlite3.connect(path)
    c = conn.cursor()
    # stats (map_database_io_sqlite3.cc:86): frame_next_id left NULL
    c.execute("CREATE TABLE stats(id INTEGER PRIMARY KEY, "
              "frame_next_id INTEGER, keyframe_next_id INTEGER, "
              "landmark_next_id INTEGER)")
    c.execute("INSERT INTO stats(id, keyframe_next_id, landmark_next_id) "
              "VALUES(0, ?, ?)",
              (map_db._next_keyfrm_id, map_db._next_landmark_id))
    # cameras (camera_database.cc:232-253)
    c.execute("CREATE TABLE cameras(id INTEGER PRIMARY KEY, name BLOB, "
              "setup_type BLOB, model_type BLOB, color_type BLOB, "
              "cols INTEGER, rows INTEGER, fps REAL, fx REAL, fy REAL, "
              "cx REAL, cy REAL, k1 REAL, k2 REAL, p1 REAL, p2 REAL, "
              "k3 REAL, k4 REAL, focal_x_baseline REAL, distortion REAL)")
    cam = slam.camera
    p = cam.params
    c.execute("INSERT INTO cameras VALUES(?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)",
              (0, cam.name.encode(), b"Monocular", b"Perspective",
               cam.color_order.encode(), cam.width, cam.height, cam.fps,
               float(p.fx), float(p.fy), float(p.cx), float(p.cy),
               float(p.k1), float(p.k2), float(p.p1), float(p.p2),
               float(p.k3), float(p.k4), 0.0, 0.0))
    # keyframes (keyframe.h:88-102, blobs per keyframe.cc:302-362)
    c.execute("CREATE TABLE keyframes(id INTEGER PRIMARY KEY, "
              "src_frm_id INTEGER, ts REAL, cam BLOB, orb_params BLOB, "
              "pose_cw BLOB, n_keypts INTEGER, undist_keypts BLOB, "
              "x_rights BLOB, depths BLOB, descs BLOB, "
              "n_markers INTEGER, markers BLOB)")
    # landmarks (landmark.h:50-58)
    c.execute("CREATE TABLE landmarks(id INTEGER PRIMARY KEY, "
              "first_keyfrm INTEGER, pos_w BLOB, ref_keyfrm INTEGER, "
              "n_vis INTEGER, n_fnd INTEGER)")
    # associations (map_database.h:323-329)
    c.execute("CREATE TABLE associations(id INTEGER PRIMARY KEY, "
              "lm_ids BLOB, span_parent INTEGER, "
              "n_spanning_children INTEGER, spanning_children BLOB, "
              "n_loop_edges INTEGER, loop_edges BLOB)")

    scale_factors = np.asarray(slam.orb_params.scale_factors)
    for kf_id in sorted(map_db.keyframes):
        kf = map_db.keyframes[kf_id]
        n = kf.num_slots
        kpts = np.zeros(n, KEYPT)
        kpts["x"] = kf.h_undist_xy[:, 0]
        kpts["y"] = kf.h_undist_xy[:, 1]
        kpts["size"] = 31.0 * scale_factors[kf.h_level]
        kpts["angle"] = np.degrees(kf.h_angle) % 360.0  # cv degrees
        kpts["octave"] = kf.h_level
        kpts["class_id"] = -1
        # pose: Eigen Mat44 .data() = column-major f64 (keyframe.cc:319)
        pose_colmajor = np.asarray(kf.pose_cw, "<f8").T.tobytes()
        descs = kf.h_desc.astype("<u4").tobytes()  # N x 32 u8 rows
        # mono: stereo_x_right_ / depths_ are empty vectors -> empty blobs;
        # src_frm_id left NULL ("removed", keyframe.cc:306)
        c.execute("INSERT INTO keyframes(id, ts, cam, orb_params, pose_cw, "
                  "n_keypts, undist_keypts, x_rights, depths, descs, "
                  "n_markers, markers) VALUES(?,?,?,?,?,?,?,?,?,?,?,?)",
                  (int(kf_id), float(kf.timestamp), cam.name.encode(),
                   slam.orb_params.name.encode(), pose_colmajor, int(n),
                   kpts.tobytes(), b"", b"", descs, 0, b""))
        gn = kf.graph_node
        children = np.asarray(sorted(gn.spanning_children), "<i4")
        loops = np.asarray(sorted(gn.loop_edges), "<i4")
        c.execute("INSERT INTO associations VALUES(?,?,?,?,?,?,?)",
                  (int(kf_id), kf.lm_ids.astype("<i4").tobytes(),
                   -1 if gn.spanning_parent is None else int(gn.spanning_parent),
                   len(children), children.tobytes(),
                   len(loops), loops.tobytes()))
    for lm_id in sorted(map_db.landmarks):
        lm = map_db.landmarks[lm_id]
        c.execute("INSERT INTO landmarks VALUES(?,?,?,?,?,?)",
                  (int(lm_id), int(lm.first_keyfrm_id),
                   np.asarray(lm.pos_w, "<f8").tobytes(),
                   int(lm.ref_keyfrm_id), int(lm.num_observable),
                   int(lm.num_observed)))
    conn.commit()
    conn.close()


def main():
    from synthetic_world import PlaneWorld, lateral_trajectory

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System

    # deterministic mini-map; the test re-creates this world (same seed) to
    # render relocalization frames against the loaded fixture
    world = PlaneWorld()
    poses = lateral_trajectory(30, step=0.02)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
        # opencv descriptor pattern: the fixture must carry descriptors
        # bit-compatible with maps the actual stella_vslam binary writes
        # (it embeds the OpenCV ORB pair table, orb_point_pairs.h:1)
        "Feature": {"num_levels": 4, "descriptor_pattern": "opencv"},
        "Preprocessing": {"min_size": 400},
        "Initializer": {"use_fixed_seed": True},
    })
    slam = System(cfg, inline_mapping=True)
    slam.startup()
    for i in range(30):
        slam.feed_monocular_frame(world.render(poses[i]), i * 0.2)
    slam.shutdown()

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "reference_layout_map.db")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_reference_layout_db(out, slam)
    print(f"wrote {out} ({os.path.getsize(out) / 1024:.0f} KB): "
          f"{slam.map_db.num_keyframes()} keyframes, "
          f"{slam.map_db.num_landmarks()} landmarks")


if __name__ == "__main__":
    main()
