"""Whole-map serialization: MessagePack and sqlite3 backends + factory.

Reference: src/stella_vslam/io/map_database_io_msgpack.{h,cc} (map as one
msgpack document: cameras, orb_params, keyframes, landmarks, graph),
io/map_database_io_sqlite3.{h,cc} (same as row-wise tables with schemas from
keyframe::columns()/landmark::columns()), io/map_database_io_factory.h
("msgpack" | "sqlite3" selector).

The serialized schema carries the same information as the reference's
(self-describing maps: cameras + orb_params embedded) with array fields stored
as lists; keyframe device tensors are rebuilt at load
(data/keyframe.Keyframe.from_payload).
"""
from __future__ import annotations

import sqlite3 as _sql
from typing import Optional

import numpy as np

from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), Eigen coefficient order
    (reference data/common.cc:13-16 convert_rotation_to_json)."""
    from stella_vslam_tpu.io.trajectory_io import _rot_to_quat as _f

    return _f(R)


def _quat_to_rot(q) -> np.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix (reference
    data/common.cc:18-21 convert_json_to_rotation)."""
    x, y, z, w = (float(v) for v in q)
    n = np.sqrt(x * x + y * y + z * z + w * w)
    if n > 0:
        x, y, z, w = x / n, y / n, z / n, w / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _dict_to_map(system, d: dict):
    from stella_vslam_tpu.camera.base import Camera
    from stella_vslam_tpu.feature.orb_params import OrbParams

    map_db = system.map_db
    # register the file's cameras / orb_params (reference register_keyframe
    # resolves both by NAME from the databases, map_database.cc:357-365);
    # unknown names fall back to the system's active objects
    for name, cj in d.get("cameras", {}).items():
        if name not in system.cameras:
            try:
                system.cameras[name] = Camera.from_json(dict(cj, name=name))
            except Exception:
                pass
    for name, pj in d.get("orb_params", {}).items():
        if name not in system.orb_params_registry:
            system.orb_params_registry[name] = OrbParams.from_json(
                dict(pj, name=name))
    with map_db.lock:
        map_db.clear()
        slot_assoc: dict = {}  # lm_id -> [(kf_id, keypoint idx)]
        for kf_id_s, payload in sorted(
            d["keyframes"].items(), key=lambda kv: int(kv[0])
        ):
            camera = system.cameras.get(payload.get("cam"), system.camera)
            orb_params = system.orb_params_registry.get(
                payload.get("orb_params"), system.orb_params)
            kf = Keyframe.from_payload(
                map_db, int(kf_id_s), payload, camera, orb_params
            )
            for idx, lm_id in enumerate(payload.get("lm_ids", ())):
                if lm_id >= 0:
                    slot_assoc.setdefault(int(lm_id), []).append(
                        (int(kf_id_s), idx))
            kf.lm_ids[:] = -1  # associations rebuilt from landmark observations
            map_db.add_keyframe(kf)
            if payload.get("span_parent", -1) >= 0:
                kf.graph_node.spanning_parent = payload["span_parent"]
            for c in payload.get("span_children", []):
                kf.graph_node.spanning_children.add(c)
            for le in payload.get("loop_edges", []):
                kf.graph_node.loop_edges.add(le)
        for lm_id_s, payload in d["landmarks"].items():
            lm = Landmark.from_json(int(lm_id_s), payload)
            obs = payload.get("observations")
            if obs is None:
                # sqlite3 layout: observations live in the keyframe slot
                # associations (reference load_association_from_stmt)
                obs_items = slot_assoc.get(lm.id, [])
            else:
                obs_items = [(int(k), int(v)) for k, v in obs.items()]
            for kf_id, idx in obs_items:
                kf = map_db.keyframes.get(int(kf_id))
                if kf is None:
                    continue
                lm.add_observation(int(kf_id), int(idx))
                kf.lm_ids[int(idx)] = lm.id
            map_db.add_landmark(lm)
        # roots: one per connected component, found by walking the restored
        # spanning parents (reference map_database.cc:310-322 / 528-541) —
        # a loaded file may carry several submaps (multi-root)
        map_db.rebuild_spanning_roots()
        if not map_db.spanning_roots and d.get("origin_keyfrm_id") is not None:
            map_db.spanning_roots = [d["origin_keyfrm_id"]]
        map_db._next_keyfrm_id = d.get("keyframe_next_id", len(map_db.keyframes))
        map_db._next_landmark_id = d.get("landmark_next_id", len(map_db.landmarks))
        # rebuild derived state
        for lm in map_db.landmarks.values():
            lm.compute_descriptor(map_db)
            lm.update_mean_normal_and_obs_scale_variance(map_db)
        for kf in map_db.keyframes.values():
            kf.graph_node.update_connections(map_db)
    map_db.refresh_device_table()
    # rebuild the BoW index for relocalization
    if system.bow_db is not None:
        system.bow_db.clear()
        for kf_id, kf in map_db.keyframes.items():
            _, bow_vec = system.bow_db.vocab.compute_bow(kf.h_desc, kf.h_valid)
            system.bow_db.add_keyframe(kf_id, bow_vec)


# ---------------------------------------------------------------------------
def _camera_to_ref_json(cam) -> dict:
    """Per-model camera JSON exactly as the reference emits it
    (perspective.cc:172-189, fisheye.cc:211-227, equirectangular.cc:82-90,
    radial_division.cc:158-173)."""
    p = cam.params
    g = float
    d = {
        "model_type": _MODEL_STR[cam.model.name],
        "setup_type": _SETUP_STR[cam.setup.name],
        "color_order": cam.color_order,
        "cols": cam.width, "rows": cam.height, "fps": g(cam.fps),
        "focal_x_baseline": g(p.focal_x_baseline),
    }
    m = cam.model.name
    if m == "PERSPECTIVE":
        d.update(fx=g(p.fx), fy=g(p.fy), cx=g(p.cx), cy=g(p.cy),
                 k1=g(p.k1), k2=g(p.k2), p1=g(p.p1), p2=g(p.p2), k3=g(p.k3))
    elif m == "FISHEYE":
        d.update(fx=g(p.fx), fy=g(p.fy), cx=g(p.cx), cy=g(p.cy),
                 k1=g(p.k1), k2=g(p.k2), k3=g(p.k3), k4=g(p.k4))
    elif m == "RADIAL_DIVISION":
        d.update(fx=g(p.fx), fy=g(p.fy), cx=g(p.cx), cy=g(p.cy),
                 distortion=g(p.k1))
    return d


def _camera_from_ref_json(name: str, cj: dict) -> dict:
    """Normalize a reference camera JSON into Camera.from_json's surface."""
    d = dict(cj, name=name)
    model = str(cj.get("model_type", "perspective"))
    d["model_type"] = model.lower().replace("radialdivision",
                                            "radial_division")
    d["setup_type"] = str(cj.get("setup_type", "monocular")).lower()
    if "distortion" in cj:  # radial-division's single parameter rides k1
        d["k1"] = cj["distortion"]
    return d


class MapDatabaseIOMsgpack:
    """Reference-encoding msgpack maps.

    Byte-level schema of io/map_database_io_msgpack.cc:31-47: one msgpack
    document {"cameras", "orb_params", "keyframes", "landmarks",
    "keyframe_next_id", "landmark_next_id"}, keyframes/landmarks keyed by
    DECIMAL-STRING ids, each keyframe encoded per keyframe::to_json
    (keyframe.cc:283-299): quaternion "rot_cw" [x,y,z,w] + "trans_cw",
    "undist_keypts" as keypoint dicts {"pt":[x,y], "ang":degrees, "oct":int},
    "descs" as rows of 8 uint32 words (data/common.cc:57-69), slot-aligned
    "lm_ids", spanning tree + loop edges; landmarks per landmark::to_json
    (landmark.cc:441-447). Maps written here load in the reference binary
    and reference-written maps load here (landmark-keyframe associations are
    rebuilt from lm_ids, map_database.cc:299-308 register_association)."""

    def save(self, path: str, system):
        import msgpack

        map_db = system.map_db
        with map_db.lock:
            keyframes = {}
            mono = system.camera.setup.name == "MONOCULAR"
            alive = map_db.fields.alive
            for kf_id in sorted(map_db.keyframes):
                kf = map_db.keyframes[kf_id]
                n = kf.num_slots
                uv = np.asarray(kf.h_undist_xy, float)
                ang = np.degrees(np.asarray(kf.h_angle, float)) % 360.0
                oct_ = np.asarray(kf.h_level, int)
                # liveness-masked slot ids (reference keyframe.cc:255-260)
                lm_ids = np.asarray(kf.lm_ids, np.int64).copy()
                occ = lm_ids >= 0
                lm_ids[occ] = np.where(alive[lm_ids[occ]], lm_ids[occ], -1)
                gn = kf.graph_node
                keyframes[str(int(kf_id))] = {
                    "ts": float(kf.timestamp),
                    "cam": kf.camera.name,
                    "orb_params": kf.orb_params.name,
                    "rot_cw": [float(v) for v in _rot_to_quat(
                        kf.pose_cw[:3, :3])],
                    "trans_cw": [float(v) for v in kf.pose_cw[:3, 3]],
                    "n_keypts": int(n),
                    "undist_keypts": [
                        {"pt": [float(uv[i, 0]), float(uv[i, 1])],
                         "ang": float(ang[i]), "oct": int(oct_[i])}
                        for i in range(n)
                    ],
                    # mono stereo/depth vectors are empty in the reference
                    "x_rights": ([] if mono else
                                 [float(v) for v in kf.h_x_right]),
                    "depths": ([] if mono else
                               [float(v) for v in kf.h_depths]),
                    "descs": np.asarray(kf.h_desc, np.uint32).tolist(),
                    "lm_ids": [int(v) for v in lm_ids],
                    "span_parent": (-1 if gn.spanning_parent is None
                                    else int(gn.spanning_parent)),
                    "span_children": sorted(int(c)
                                            for c in gn.spanning_children),
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
                "cameras": {n: _camera_to_ref_json(c)
                            for n, c in system.cameras.items()},
                "orb_params": {
                    n: p.to_json()
                    for n, p in system.orb_params_registry.items()
                },
                "keyframes": keyframes,
                "landmarks": landmarks,
                "keyframe_next_id": int(map_db._next_keyfrm_id),
                "landmark_next_id": int(map_db._next_landmark_id),
            }
        with open(path, "wb") as f:
            f.write(msgpack.packb(doc))

    def load(self, path: str, system):
        import msgpack

        with open(path, "rb") as f:
            doc = msgpack.unpackb(f.read(), strict_map_key=False)
        d = {"cameras": {}, "orb_params": {}, "keyframes": {},
             "landmarks": {}}
        for name, cj in doc.get("cameras", {}).items():
            d["cameras"][name] = _camera_from_ref_json(name, cj)
        d["orb_params"] = doc.get("orb_params", {})
        for kf_id_s, kj in doc.get("keyframes", {}).items():
            n = int(kj["n_keypts"])
            kpts = kj["undist_keypts"]
            uv = [[float(k["pt"][0]), float(k["pt"][1])] for k in kpts]
            T = np.eye(4)
            T[:3, :3] = _quat_to_rot(kj["rot_cw"])
            T[:3, 3] = [float(v) for v in kj["trans_cw"]]
            xr = [float(v) for v in kj.get("x_rights", [])]
            dp = [float(v) for v in kj.get("depths", [])]
            d["keyframes"][str(int(kf_id_s))] = {
                "ts": float(kj["ts"]),
                "cam": kj.get("cam"), "orb_params": kj.get("orb_params"),
                "pose_cw": T.reshape(-1).tolist(),
                "n_keypts": n,
                "keypts": uv,
                "undist_keypts": uv,
                "angles": np.radians(
                    [float(k["ang"]) for k in kpts]).tolist(),
                "levels": [int(k["oct"]) for k in kpts],
                "valid": [1] * n,
                "x_rights": xr if len(xr) == n else [-1.0] * n,
                "depths": dp if len(dp) == n else [0.0] * n,
                "descs": kj["descs"],
                "lm_ids": [int(v) for v in kj["lm_ids"]],
                "span_parent": int(kj.get("span_parent", -1)),
                "span_children": [int(v) for v in
                                  kj.get("span_children", [])],
                "loop_edges": [int(v) for v in kj.get("loop_edges", [])],
            }
        for lm_id_s, lj in doc.get("landmarks", {}).items():
            pos = lj["pos_w"]
            d["landmarks"][str(int(lm_id_s))] = {
                "1st_keyfrm": int(lj.get("1st_keyfrm", -1)),
                "pos_x": float(pos[0]), "pos_y": float(pos[1]),
                "pos_z": float(pos[2]),
                "ref_keyfrm": int(lj["ref_keyfrm"]),
                "n_vis": int(lj.get("n_vis", 1)),
                "n_fnd": int(lj.get("n_fnd", 1)),
            }
        d["keyframe_next_id"] = int(doc.get("keyframe_next_id", 0))
        d["landmark_next_id"] = int(doc.get("landmark_next_id", 0))
        if d["keyframes"]:
            d["origin_keyfrm_id"] = min(int(k) for k in d["keyframes"])
        else:
            d["origin_keyfrm_id"] = None
        _dict_to_map(system, d)


# cv::KeyPoint memory layout — the reference memcpy's the raw vector into the
# undist_keypts blob (keyframe.cc:326-330): 5 float32 + 2 int32 = 28 bytes
_KEYPT_DTYPE = np.dtype([
    ("x", "<f4"), ("y", "<f4"), ("size", "<f4"), ("angle", "<f4"),
    ("response", "<f4"), ("octave", "<i4"), ("class_id", "<i4"),
])

_SETUP_STR = {"MONOCULAR": "Monocular", "STEREO": "Stereo", "RGBD": "RGBD"}
_MODEL_STR = {
    "PERSPECTIVE": "Perspective", "FISHEYE": "Fisheye",
    "EQUIRECTANGULAR": "Equirectangular", "RADIAL_DIVISION": "RadialDivision",
}


class MapDatabaseIOSqlite3:
    """Reference-schema sqlite3 maps: byte-compatible tables
    stats / cameras / keyframes / landmarks / associations with the exact
    column layouts and blob encodings of the reference
    (keyframe.h:88-102 + keyframe.cc:302-362, landmark.h:50-58,
    map_database.h:323-329, camera_database.cc:232-253,
    io/map_database_io_sqlite3.cc) — maps interoperate in both directions.

    Blob encodings: pose_cw = 16 float64 column-major (Eigen);
    undist_keypts = packed cv::KeyPoint structs (28 B, angle in degrees);
    x_rights / depths = float32 arrays (empty for monocular);
    descs = N x 32 uint8; lm_ids / spanning_children / loop_edges = int32."""

    def save(self, path: str, system):
        map_db = system.map_db
        conn = _sql.connect(path)
        c = conn.cursor()
        try:
            with map_db.lock:
                for tbl in ("stats", "cameras", "keyframes", "landmarks",
                            "associations"):
                    c.execute(f"DROP TABLE IF EXISTS {tbl}")
                c.execute(
                    "CREATE TABLE stats(id INTEGER PRIMARY KEY, "
                    "frame_next_id INTEGER, keyframe_next_id INTEGER, "
                    "landmark_next_id INTEGER)")
                c.execute(
                    "INSERT INTO stats(id, keyframe_next_id, landmark_next_id)"
                    " VALUES(?, ?, ?)",
                    (0, map_db._next_keyfrm_id, map_db._next_landmark_id))

                c.execute(
                    "CREATE TABLE cameras(id INTEGER PRIMARY KEY, name BLOB, "
                    "setup_type BLOB, model_type BLOB, color_type BLOB, "
                    "cols INTEGER, rows INTEGER, fps REAL, fx REAL, fy REAL, "
                    "cx REAL, cy REAL, k1 REAL, k2 REAL, p1 REAL, p2 REAL, "
                    "k3 REAL, k4 REAL, focal_x_baseline REAL, distortion REAL)")
                for i, (name, cam) in enumerate(system.cameras.items()):
                    p = cam.params
                    c.execute(
                        "INSERT INTO cameras VALUES"
                        "(?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)",
                        (i, name.encode(),
                         _SETUP_STR[cam.setup.name].encode(),
                         _MODEL_STR[cam.model.name].encode(),
                         cam.color_order.encode(),
                         cam.width, cam.height, cam.fps,
                         float(p.fx), float(p.fy), float(p.cx), float(p.cy),
                         float(p.k1), float(p.k2), float(p.p1), float(p.p2),
                         float(p.k3), float(p.k4), float(p.focal_x_baseline),
                         float(p.k1) if cam.model.name == "RADIAL_DIVISION"
                         else 0.0))

                c.execute(
                    "CREATE TABLE keyframes(id INTEGER PRIMARY KEY, "
                    "src_frm_id INTEGER, ts REAL, cam BLOB, orb_params BLOB, "
                    "pose_cw BLOB, n_keypts INTEGER, undist_keypts BLOB, "
                    "x_rights BLOB, depths BLOB, descs BLOB, "
                    "n_markers INTEGER, markers BLOB)")
                c.execute(
                    "CREATE TABLE landmarks(id INTEGER PRIMARY KEY, "
                    "first_keyfrm INTEGER, pos_w BLOB, ref_keyfrm INTEGER, "
                    "n_vis INTEGER, n_fnd INTEGER)")
                c.execute(
                    "CREATE TABLE associations(id INTEGER PRIMARY KEY, "
                    "lm_ids BLOB, span_parent INTEGER, "
                    "n_spanning_children INTEGER, spanning_children BLOB, "
                    "n_loop_edges INTEGER, loop_edges BLOB)")

                mono = system.camera.setup.name == "MONOCULAR"
                for kf_id in sorted(map_db.keyframes):
                    kf = map_db.keyframes[kf_id]
                    n = kf.num_slots
                    kpts = np.zeros(n, _KEYPT_DTYPE)
                    kpts["x"] = kf.h_undist_xy[:, 0]
                    kpts["y"] = kf.h_undist_xy[:, 1]
                    kpts["size"] = 31.0 * np.asarray(
                        kf.orb_params.scale_factors)[kf.h_level]
                    kpts["angle"] = np.degrees(kf.h_angle) % 360.0
                    kpts["octave"] = kf.h_level
                    kpts["class_id"] = -1
                    xr = (b"" if mono
                          else kf.h_x_right.astype("<f4").tobytes())
                    dp = (b"" if mono
                          else kf.h_depths.astype("<f4").tobytes())
                    descs = kf.h_desc.astype("<u4").tobytes()  # = N x 32 u8
                    c.execute(
                        "INSERT INTO keyframes VALUES"
                        "(?,?,?,?,?,?,?,?,?,?,?,?,?)",
                        (int(kf_id), 0, float(kf.timestamp),
                         kf.camera.name.encode(),
                         kf.orb_params.name.encode(),
                         np.asarray(kf.pose_cw, "<f8").T.tobytes(),  # col-major
                         int(n), kpts.tobytes(), xr, dp, descs, 0, b""))
                    gn = kf.graph_node
                    span_children = np.asarray(
                        sorted(gn.spanning_children), "<i4")
                    loop_edges = np.asarray(sorted(gn.loop_edges), "<i4")
                    c.execute(
                        "INSERT INTO associations VALUES(?,?,?,?,?,?,?)",
                        (int(kf_id),
                         kf.lm_ids.astype("<i4").tobytes(),
                         -1 if gn.spanning_parent is None
                         else int(gn.spanning_parent),
                         len(span_children), span_children.tobytes(),
                         len(loop_edges), loop_edges.tobytes()))

                for lm_id in sorted(map_db.landmarks):
                    lm = map_db.landmarks[lm_id]
                    c.execute(
                        "INSERT INTO landmarks VALUES(?,?,?,?,?,?)",
                        (int(lm_id), int(lm.first_keyfrm_id),
                         np.asarray(lm.pos_w, "<f8").tobytes(),
                         int(lm.ref_keyfrm_id), int(lm.num_observable),
                         int(lm.num_observed)))
            conn.commit()
        finally:
            conn.close()

    def load(self, path: str, system):
        conn = _sql.connect(path)
        c = conn.cursor()
        try:
            d = {"cameras": {}, "orb_params": {},
                 "keyframes": {}, "landmarks": {}}
            row = c.execute("SELECT * FROM stats").fetchone()
            d["keyframe_next_id"] = int(row[2] or 0)
            d["landmark_next_id"] = int(row[3] or 0)

            def _s(b):  # name blobs may come back as bytes or str
                return b.decode() if isinstance(b, (bytes, bytearray)) else b

            for row in c.execute("SELECT * FROM cameras"):
                (_, name, setup, model, color, cols, rows, fps, fx, fy, cx,
                 cy, k1, k2, p1, p2, k3, k4, fxb, distortion) = row
                model_s = _s(model)
                d["cameras"][_s(name)] = {
                    "model_type": model_s.lower(),
                    "setup_type": _s(setup).lower(),
                    "color_order": _s(color), "cols": cols, "rows": rows,
                    "fps": fps, "fx": fx, "fy": fy, "cx": cx, "cy": cy,
                    "k1": distortion if model_s == "RadialDivision" else k1,
                    "k2": k2, "p1": p1, "p2": p2, "k3": k3, "k4": k4,
                    "focal_x_baseline": fxb,
                }

            assoc = {}
            for row in c.execute("SELECT * FROM associations"):
                kf_id, lm_blob, span_parent, _, child_blob, _, loop_blob = row
                assoc[int(kf_id)] = (
                    np.frombuffer(lm_blob, "<i4") if lm_blob else
                    np.zeros(0, "<i4"),
                    int(span_parent),
                    np.frombuffer(child_blob, "<i4") if child_blob else [],
                    np.frombuffer(loop_blob, "<i4") if loop_blob else [],
                )

            for row in c.execute("SELECT * FROM keyframes"):
                (kf_id, _src, ts, cam, orbp, pose_blob, n, kpt_blob, xr_blob,
                 dp_blob, desc_blob, _nm, _mk) = row
                n = int(n)
                kpts = np.frombuffer(kpt_blob, _KEYPT_DTYPE, count=n)
                pose = np.frombuffer(pose_blob, "<f8", count=16)
                pose = pose.reshape(4, 4).T  # Eigen column-major
                uv = np.stack([kpts["x"], kpts["y"]], axis=1)
                lm_ids, span_parent, children, loops = assoc.get(
                    int(kf_id), (np.full(n, -1, "<i4"), -1, [], []))
                d["keyframes"][str(int(kf_id))] = {
                    "ts": float(ts), "cam": _s(cam), "orb_params": _s(orbp),
                    "pose_cw": pose.reshape(-1).tolist(),
                    "n_keypts": n,
                    "keypts": uv.tolist(),
                    "undist_keypts": uv.tolist(),
                    "angles": np.radians(kpts["angle"]).tolist(),
                    "levels": kpts["octave"].tolist(),
                    "valid": [1] * n,
                    "x_rights": (
                        np.frombuffer(xr_blob, "<f4", count=n).tolist()
                        if xr_blob else [-1.0] * n),
                    "depths": (
                        np.frombuffer(dp_blob, "<f4", count=n).tolist()
                        if dp_blob else [0.0] * n),
                    "descs": np.frombuffer(
                        desc_blob, "<u4", count=n * 8).reshape(n, 8).tolist(),
                    "lm_ids": np.asarray(lm_ids).tolist(),
                    "span_parent": span_parent,
                    "span_children": np.asarray(children).tolist(),
                    "loop_edges": np.asarray(loops).tolist(),
                }

            for row in c.execute("SELECT * FROM landmarks"):
                lm_id, first_kf, pos_blob, ref_kf, n_vis, n_fnd = row
                pos = np.frombuffer(pos_blob, "<f8", count=3)
                d["landmarks"][str(int(lm_id))] = {
                    "1st_keyfrm": int(first_kf),
                    "pos_x": pos[0], "pos_y": pos[1], "pos_z": pos[2],
                    "ref_keyfrm": int(ref_kf),
                    "n_vis": int(n_vis), "n_fnd": int(n_fnd),
                }
            if d["keyframes"]:
                d["origin_keyfrm_id"] = min(
                    int(k) for k in d["keyframes"])
            else:
                d["origin_keyfrm_id"] = None
        finally:
            conn.close()
        _dict_to_map(system, d)


def create_map_database_io(fmt: str):
    """reference io/map_database_io_factory.h."""
    fmt = fmt.lower()
    if fmt == "msgpack":
        return MapDatabaseIOMsgpack()
    if fmt == "sqlite3":
        return MapDatabaseIOSqlite3()
    raise ValueError(f"unknown map format: {fmt}")
