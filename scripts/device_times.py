"""Device-time report for the hot programs (VERDICT r4 task 2).

The reference publishes per-frame extraction+tracking wall times
(system.cc:540-543,578-583). This goes below wall time: it measures each hot
device program's standalone execution time on the real chip — dispatch+block
over many repetitions with the per-call client overhead subtracted — and
derives an MFU-style utilization estimate from XLA's own FLOP count
(compiled.cost_analysis()), so "is this kernel near speed-of-light" can be
judged per program rather than guessed from end-to-end FPS.

Programs covered (the per-frame and per-keyframe-event hot set):
  * fused mono preprocess (pyramid + FAST + NMS + rBRIEF + undistort + pack)
  * track_frame (the one-program tracking cascade)
  * fuse_packed (keyframe-event landmark fusion, one 16x2048 chunk)
  * triangulate_packed (keyframe-event 5-neighbor triangulation)
  * bundle_adjust_packed at each compiled (K, L) bucket
  * BoW tree transform

Usage: python scripts/device_times.py  (needs the real chip; ~2 min)
Output: one table + a JSON line (consumed by PARITY.md notes).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

# v5e peak: 197 TFLOP/s bf16, ~half that for f32 on the MXU. The utilization
# column uses bf16 peak — a conservative (under-)estimate for f32-heavy
# programs.
PEAK_FLOPS = 197e12


def measure(fn, args, n=30, warmup=3):
    """Amortized per-call seconds with the dispatch queue pipelined:
    dispatch n back-to-back, block once on the last output. On the tunneled
    runtime a blocking fetch costs a ~20-30 ms round trip regardless of
    size, so per-call dispatch+block timing would measure the tunnel, not
    the program; pipelined timing amortizes that to ~1/n."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def flops_of(fn, args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    from synthetic_world import PlaneWorld

    from stella_vslam_tpu.config import Config
    from stella_vslam_tpu.module.tracking_kernels import make_cam_scalars
    from stella_vslam_tpu.ops.optim import ba as ba_mod
    from stella_vslam_tpu.system import System

    world = PlaneWorld(width=752, height=480, fx=458.0, fy=458.0, depth=4.0,
                       tex_size=1024, meters_per_px=0.008)
    cfg = Config.from_dict({"Camera": world.camera_yaml(),
                            "Feature": {"num_levels": 8}})
    slam = System(cfg, inline_mapping=True)

    # overhead baseline: a trivial program's amortized pipelined cost
    # (client-side dispatch overhead per call)
    tiny = jax.jit(lambda x: x + 1.0)
    overhead = measure(tiny, (jnp.zeros(8, jnp.float32),), n=200)

    img = world.render(np.eye(4))
    N = slam.extractor.num_slots
    C = slam.map_db.device_table.capacity

    rows = []

    def add(name, fn, args):
        t = measure(fn, args)
        fl = flops_of(fn, args)
        dev = max(t - overhead, 1e-6)
        rows.append((name, dev * 1e3, fl, fl / dev / PEAK_FLOPS * 100.0))

    add("mono_preprocess", slam._mono_preprocess,
        (jnp.asarray(slam._to_gray(img)),))

    k = slam.tracker.kernels
    f32 = lambda *s: jnp.zeros(s, jnp.float32)
    i32 = lambda *s: jnp.zeros(s, jnp.int32)
    u32 = lambda *s: jnp.zeros(s, jnp.uint32)
    bl = lambda *s: jnp.zeros(s, bool)
    eye = jnp.eye(3, dtype=jnp.float32)
    track_args = (
        f32(N, 2), i32(N), u32(N, 8), bl(N), f32(N), f32(N),
        u32(N, 8), i32(N), f32(N),
        f32(N, 3), bl(N), jnp.full(N, -1, jnp.int32),
        u32(N, 8), f32(N),
        f32(N, 3), bl(N), jnp.full(N, -1, jnp.int32),
        f32(C, 8), u32(C, 10),
        eye, f32(3), eye, f32(3),
    )
    add("track_frame", lambda *a: k.track_frame(
        *a, use_motion=True, margin_local=float(k.margin_local)), track_args)

    mk = slam.mapper.kernels
    KC, MC = slam.mapper.FUSE_KF_CHUNK, slam.mapper.FUSE_LM_CHUNK
    kf_fuse = (f32(N, 2), i32(N), u32(N, 8), bl(N), f32(N))
    add("fuse_packed[16x2048]", lambda *a: mk.fuse_packed(
        tuple(kf_fuse for _ in range(KC)), a[0], a[1], a[2], margin=3.0),
        (np.zeros((KC, 13), np.float32), np.zeros((MC, 9), np.float32),
         u32(MC, 8)))

    B = 5
    kf_tri = (f32(N, 2), i32(N), u32(N, 8), f32(N, 3), f32(N), f32(N))
    add("triangulate_packed[5]", lambda m, p: mk.triangulate_packed(
        kf_tri, tuple(kf_tri for _ in range(B)), m, p),
        (np.zeros((B + 1, N, 2), np.float32), np.zeros((B + 1, 13), np.float32)))

    cam_scalars = make_cam_scalars(slam.camera)
    n1, n2 = slam.mapper.ba_iters
    for K in slam.mapper.BA_K_BUCKETS:
        for L in slam.mapper.BA_L_BUCKETS:
            if K < slam.mapper.ba_K and L == slam.mapper.ba_L \
                    and slam.mapper.ba_L > 4096:
                continue
            add(f"ba[K={K},L={L},{n1}+{n2}it]",
                lambda pack, K=K, L=L: ba_mod.bundle_adjust_packed(
                    pack, cam_scalars, K=K, L=L, D=slam.mapper.ba_D,
                    model="perspective", num_first=n1, num_second=n2),
                (f32(ba_mod.packed_size(K, L, slam.mapper.ba_D)),))

    add("bow_transform", slam.bow_vocab.transform, (u32(N, 8),))

    print(f"{'program':<28} {'device ms':>10} {'GFLOP':>8} {'util%':>7}")
    for name, ms, fl, util in rows:
        print(f"{name:<28} {ms:>10.2f} {fl / 1e9:>8.2f} {util:>7.2f}")
    print(f"(per-call client overhead subtracted: {overhead * 1e3:.2f} ms; "
          f"util = XLA-counted FLOPs / device-time / 197 TF bf16 peak)")
    print(json.dumps({
        "overhead_ms": round(overhead * 1e3, 3),
        "programs": {n: {"ms": round(ms, 3), "gflop": round(fl / 1e9, 3),
                         "util_pct": round(u, 3)} for n, ms, fl, u in rows},
    }))


if __name__ == "__main__":
    main()
