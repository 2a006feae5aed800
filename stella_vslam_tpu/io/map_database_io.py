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

import json
import sqlite3 as _sql
from typing import Optional

import numpy as np

from stella_vslam_tpu.data.keyframe import Keyframe
from stella_vslam_tpu.data.landmark import Landmark


def _map_to_dict(system) -> dict:
    map_db = system.map_db
    with map_db.lock:
        d = map_db.to_json(
            cameras={system.camera.name: system.camera.to_json()},
            orb_params={system.orb_params.name: system.orb_params.to_json()},
        )
        # landmark observations (graph) per landmark
        for lm_id, lm in map_db.landmarks.items():
            d["landmarks"][str(lm_id)]["observations"] = {
                str(k): int(v) for k, v in lm.observations.items()
            }
        d["origin_keyfrm_id"] = map_db.origin_keyfrm_id
    return d


def _dict_to_map(system, d: dict):
    map_db = system.map_db
    with map_db.lock:
        map_db.clear()
        camera = system.camera
        orb_params = system.orb_params
        for kf_id_s, payload in sorted(
            d["keyframes"].items(), key=lambda kv: int(kv[0])
        ):
            kf = Keyframe.from_payload(
                map_db, int(kf_id_s), payload, camera, orb_params
            )
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
            for kf_id_s, idx in payload.get("observations", {}).items():
                kf = map_db.keyframes.get(int(kf_id_s))
                if kf is None:
                    continue
                lm.add_observation(int(kf_id_s), int(idx))
                kf.lm_ids[int(idx)] = lm.id
            map_db.add_landmark(lm)
        map_db.origin_keyfrm_id = d.get("origin_keyfrm_id")
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
class MapDatabaseIOMsgpack:
    def save(self, path: str, system):
        import msgpack

        with open(path, "wb") as f:
            f.write(msgpack.packb(_map_to_dict(system), use_single_float=True))

    def load(self, path: str, system):
        import msgpack

        with open(path, "rb") as f:
            d = msgpack.unpackb(f.read(), strict_map_key=False)
        _dict_to_map(system, d)


class MapDatabaseIOSqlite3:
    """Row-wise sqlite3 schema (reference map_database_io_sqlite3.cc):
    tables keyframes/landmarks/associations/metadata, array fields as JSON."""

    def save(self, path: str, system):
        d = _map_to_dict(system)
        conn = _sql.connect(path)
        c = conn.cursor()
        c.execute("DROP TABLE IF EXISTS metadata")
        c.execute("DROP TABLE IF EXISTS keyframes")
        c.execute("DROP TABLE IF EXISTS landmarks")
        c.execute("CREATE TABLE metadata (key TEXT PRIMARY KEY, value TEXT)")
        c.execute("CREATE TABLE keyframes (id INTEGER PRIMARY KEY, payload TEXT)")
        c.execute("CREATE TABLE landmarks (id INTEGER PRIMARY KEY, payload TEXT)")
        meta = {
            "cameras": d["cameras"], "orb_params": d["orb_params"],
            "origin_keyfrm_id": d["origin_keyfrm_id"],
            "keyframe_next_id": d["keyframe_next_id"],
            "landmark_next_id": d["landmark_next_id"],
        }
        c.execute("INSERT INTO metadata VALUES (?, ?)", ("map", json.dumps(meta)))
        for k, payload in d["keyframes"].items():
            c.execute(
                "INSERT INTO keyframes VALUES (?, ?)", (int(k), json.dumps(payload))
            )
        for k, payload in d["landmarks"].items():
            c.execute(
                "INSERT INTO landmarks VALUES (?, ?)", (int(k), json.dumps(payload))
            )
        conn.commit()
        conn.close()

    def load(self, path: str, system):
        conn = _sql.connect(path)
        c = conn.cursor()
        meta = json.loads(
            c.execute("SELECT value FROM metadata WHERE key='map'").fetchone()[0]
        )
        d = {
            "cameras": meta["cameras"], "orb_params": meta["orb_params"],
            "origin_keyfrm_id": meta["origin_keyfrm_id"],
            "keyframe_next_id": meta["keyframe_next_id"],
            "landmark_next_id": meta["landmark_next_id"],
            "keyframes": {}, "landmarks": {},
        }
        for kid, payload in c.execute("SELECT id, payload FROM keyframes"):
            d["keyframes"][str(kid)] = json.loads(payload)
        for lid, payload in c.execute("SELECT id, payload FROM landmarks"):
            d["landmarks"][str(lid)] = json.loads(payload)
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
