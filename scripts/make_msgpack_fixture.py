"""Generate tests/data/reference_layout_map.msg — a msgpack map in the
REFERENCE's exact encoding, written by an independent writer coded strictly
from the reference C++ (NOT stella_vslam_tpu.io, so a shared encode/decode
bug cannot hide): document layout from io/map_database_io_msgpack.cc:31-47
({"cameras","orb_params","keyframes","landmarks","keyframe_next_id",
"landmark_next_id"}, keyframes/landmarks keyed by decimal-string ids);
keyframe fields from keyframe.cc:283-299 (quaternion rot_cw [x,y,z,w] via
Eigen Quat coefficients, trans_cw, keypoint dicts {"pt","ang","oct"} with
cv2 DEGREE angles per data/common.cc:32-40, descs as rows of 8 uint32 words
per data/common.cc:57-69, slot-aligned lm_ids with erased landmarks as -1,
span_parent/span_children/loop_edges); landmark fields from
landmark.cc:441-447; camera JSON from perspective.cc:172-189; orb_params
from orb_params.cc:29-35.

The map content comes from a small deterministic in-repo SLAM run so the
fixture carries realistic descriptors and the reverse-interop test can
relocalize real rendered frames against the loaded map.

Run:  python scripts/make_msgpack_fixture.py
"""
from __future__ import annotations

import os
import sys

import msgpack
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ["SVT_WARMUP"] = "0"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def rot_to_quat_xyzw(R):
    """Mat33 -> Eigen quaternion coefficient order [x, y, z, w]
    (data/common.cc:13-16)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # not hit for the fixture's small-rotation poses
        x, y, z = 0.0, 0.0, 0.0
    return [float(x), float(y), float(z), float(w)]


def write_reference_layout_msg(path, slam):
    map_db = slam.map_db
    cam = slam.camera
    p = cam.params
    # perspective::to_json (perspective.cc:172-189)
    cameras = {cam.name: {
        "model_type": "Perspective", "setup_type": "Monocular",
        "color_order": cam.color_order, "cols": cam.width,
        "rows": cam.height, "fps": float(cam.fps),
        "focal_x_baseline": 0.0,
        "fx": float(p.fx), "fy": float(p.fy),
        "cx": float(p.cx), "cy": float(p.cy),
        "k1": float(p.k1), "k2": float(p.k2), "p1": float(p.p1),
        "p2": float(p.p2), "k3": float(p.k3),
    }}
    # orb_params::to_json (orb_params.cc:29-35)
    op = slam.orb_params
    orb_params = {op.name: {
        "name": op.name, "scale_factor": float(op.scale_factor),
        "num_levels": int(op.num_levels),
        "ini_fast_threshold": int(op.ini_fast_thr),
        "min_fast_threshold": int(op.min_fast_thr),
    }}
    keyframes = {}
    for kf_id in sorted(map_db.keyframes):
        kf = map_db.keyframes[kf_id]
        n = kf.num_slots
        uv = np.asarray(kf.h_undist_xy, float)
        ang_deg = np.degrees(np.asarray(kf.h_angle, float)) % 360.0
        levels = np.asarray(kf.h_level, int)
        # keyframe.cc:255-260 — erased landmarks encode as -1
        lm_ids = []
        for v in kf.lm_ids:
            lm = map_db.landmarks.get(int(v)) if v >= 0 else None
            lm_ids.append(int(v) if lm is not None
                          and not lm.will_be_erased else -1)
        gn = kf.graph_node
        keyframes[str(int(kf_id))] = {
            "ts": float(kf.timestamp),
            "cam": cam.name,
            "orb_params": op.name,
            "rot_cw": rot_to_quat_xyzw(kf.pose_cw[:3, :3]),
            "trans_cw": [float(v) for v in kf.pose_cw[:3, 3]],
            "n_keypts": int(n),
            "undist_keypts": [
                {"pt": [float(uv[i, 0]), float(uv[i, 1])],
                 "ang": float(ang_deg[i]), "oct": int(levels[i])}
                for i in range(n)],
            "x_rights": [],  # mono: empty vectors (keyframe.cc:291-292)
            "depths": [],
            "descs": [[int(w) for w in row]
                      for row in np.asarray(kf.h_desc, np.uint32)],
            "lm_ids": lm_ids,
            "span_parent": (-1 if gn.spanning_parent is None
                            else int(gn.spanning_parent)),
            "span_children": sorted(int(c) for c in gn.spanning_children),
            "loop_edges": sorted(int(e) for e in gn.loop_edges),
        }
    landmarks = {}
    for lm_id in sorted(map_db.landmarks):
        lm = map_db.landmarks[lm_id]
        landmarks[str(int(lm_id))] = {
            "1st_keyfrm": int(lm.first_keyfrm_id),
            "pos_w": [float(v) for v in lm.pos_w],
            "ref_keyfrm": int(lm.ref_keyfrm_id),
            "n_vis": int(lm.num_observable),
            "n_fnd": int(lm.num_observed),
        }
    doc = {
        "cameras": cameras, "orb_params": orb_params,
        "keyframes": keyframes, "landmarks": landmarks,
        "keyframe_next_id": int(map_db._next_keyfrm_id),
        "landmark_next_id": int(map_db._next_landmark_id),
    }
    with open(path, "wb") as f:
        f.write(msgpack.packb(doc))


def main():
    from synthetic_world import PlaneWorld, lateral_trajectory

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.system import System

    # deterministic mini-map; identical world/config to the sqlite3 fixture
    # so the reverse-interop test can render matching frames
    world = PlaneWorld()
    poses = lateral_trajectory(30, step=0.02)
    cfg = Config.from_dict({
        "Camera": world.camera_yaml(),
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
                       "reference_layout_map.msg")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_reference_layout_msg(out, slam)
    print(f"wrote {out} ({os.path.getsize(out) / 1024:.0f} KB): "
          f"{slam.map_db.num_keyframes()} keyframes, "
          f"{slam.map_db.num_landmarks()} landmarks")


if __name__ == "__main__":
    main()
