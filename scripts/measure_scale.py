"""Chip measurement for the scale ceilings (PARITY.md): the full 512-keyframe
/ 51k-landmark corridor map from tests/test_scale.py driven on the real TPU —
device-table refresh under a 12x-oversubscribed table, global BA assembly +
solve at K=512 / L=65536 / D=16 (the dense [3072,3072] reduced camera
solve), and the 512-keyframe Sim3 pose graph.

The CPU mesh cannot execute the full-scale BA in test time (>9 min/iter,
measured); this script records the chip numbers the slow tests point at.
Run:  python scripts/measure_scale.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from test_scale import (N_KFS, _perturb_map, build_corridor_map, make_camera)

from stella_vslam_tpu.feature.orb_params import OrbParams
from stella_vslam_tpu.global_optimization_module import \
    GlobalOptimizationModule
from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars
from stella_vslam_tpu.parallel.sharded_ba import sharded_bundle_adjust
from synthetic_world import umeyama_align


def main():
    camera = make_camera()
    orb_params = OrbParams(num_levels=4)
    t0 = time.monotonic()
    map_db, centers, lm_pos = build_corridor_map(camera, orb_params)
    print(f"[scale/chip] built {map_db.num_keyframes()} kfs / "
          f"{map_db.num_landmarks()} lms in {time.monotonic() - t0:.1f} s")

    # ---- device-table refresh with 51k live landmarks vs 4096 rows
    for rep in range(2):  # first = compile, second = steady
        t0 = time.monotonic()
        map_db.refresh_device_table(center_kf_id=5)
        t_tbl = (time.monotonic() - t0) * 1e3
    snap = map_db.device_table.snap
    ids = np.asarray(snap.ids)
    print(f"[scale/chip] table refresh {t_tbl:.0f} ms warm "
          f"({int((ids >= 0).sum())}/{len(ids)} rows)")

    # ---- global BA at full scale
    _perturb_map(map_db, np.random.default_rng(1))
    gopt = GlobalOptimizationModule(map_db, camera, orb_params, None)
    t0 = time.monotonic()
    prob, lm_ids, kf_slots, marker_rows = gopt._assemble_global_ba()
    t_asm = time.monotonic() - t0
    K, L, D = prob.cam_R.shape[0], prob.lm_pos.shape[0], prob.obs_cam.shape[1]
    pre = np.stack([map_db.keyframes[k].cam_center for k in range(N_KFS)])
    scal = make_cam_scalars(camera)
    t0 = time.monotonic()
    res = sharded_bundle_adjust(prob, scal, model="perspective",
                                num_first=3, num_second=0)
    cost = float(res.cost)  # blocks
    t_compile_plus = time.monotonic() - t0
    t0 = time.monotonic()
    res = sharded_bundle_adjust(prob, scal, model="perspective",
                                num_first=3, num_second=0)
    cost = float(res.cost)
    t_warm = time.monotonic() - t0
    camR, camt = np.asarray(res.cam_R), np.asarray(res.cam_t)
    est = np.stack([-camR[i].T @ camt[i] for i in range(N_KFS)])
    a_pre, _ = umeyama_align(pre, centers)
    a_est, _ = umeyama_align(est, centers)
    e_pre = float(np.sqrt(np.mean(np.sum((a_pre - centers) ** 2, 1))))
    e_est = float(np.sqrt(np.mean(np.sum((a_est - centers) ** 2, 1))))
    print(f"[scale/chip] global BA K={K} L={L} D={D}: assemble {t_asm:.1f} s, "
          f"3 robust iters {t_warm:.1f} s warm (first {t_compile_plus:.1f} s "
          f"incl. compile), camera RMSE {e_pre*1e3:.1f} -> {e_est*1e3:.1f} mm, "
          f"cost {cost:.3g}")
    assert e_est < 0.5 * e_pre, (e_pre, e_est)

    # ---- Sim3 pose graph over the 512-kf chain (same setup as the test)
    import jax.numpy as jnp

    from stella_vslam_tpu.ops.optim import sim3 as sim3_opt
    drift = np.deg2rad(0.02)
    R_cw = np.zeros((N_KFS, 3, 3))
    t_cw = np.zeros((N_KFS, 3))
    for k in range(N_KFS):
        c, s = np.cos(drift * k), np.sin(drift * k)
        R_cw[k] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
        t_cw[k] = [-(centers[k, 0] + 0.001 * k), 0, 0]
    true_T = np.tile(np.eye(4), (N_KFS, 1, 1))
    true_T[:, 0, 3] = -centers[:, 0]
    pairs = [(k, k + 1) for k in range(N_KFS - 1)] + [(0, N_KFS - 1)]
    eR = np.stack([(true_T[i] @ np.linalg.inv(true_T[j]))[:3, :3]
                   for i, j in pairs])
    et = np.stack([(true_T[i] @ np.linalg.inv(true_T[j]))[:3, 3]
                   for i, j in pairs])
    ei = np.asarray([i for i, _ in pairs], np.int32)
    ej = np.asarray([j for _, j in pairs], np.int32)
    fixed = np.zeros(N_KFS, bool)
    fixed[0] = True
    for rep in range(2):
        t0 = time.monotonic()
        s_o, R_o, t_o = sim3_opt.optimize_pose_graph(
            jnp.ones(N_KFS), jnp.asarray(R_cw, jnp.float32),
            jnp.asarray(t_cw, jnp.float32), jnp.asarray(fixed),
            jnp.ones(N_KFS, bool), jnp.asarray(ei), jnp.asarray(ej),
            jnp.ones(len(pairs), jnp.float32), jnp.asarray(eR, jnp.float32),
            jnp.asarray(et, jnp.float32), jnp.ones(len(pairs), bool))
        np.asarray(s_o)
        t_pg = time.monotonic() - t0
    R_o, t_o, s_o = np.asarray(R_o), np.asarray(t_o), np.asarray(s_o)
    c_before = -R_cw[-1].T @ t_cw[-1]
    c_after = -(R_o[-1].T @ t_o[-1]) / s_o[-1]
    e_b = np.linalg.norm(c_before - centers[-1])
    e_a = np.linalg.norm(c_after - centers[-1])
    print(f"[scale/chip] pose graph K={N_KFS} E={len(pairs)}: {t_pg:.1f} s "
          f"warm, end-kf error {e_b*1e3:.0f} -> {e_a*1e3:.0f} mm")
    assert e_a < 0.35 * e_b, (e_b, e_a)


if __name__ == "__main__":
    main()
