"""Measure the 8-pt-minimal-set RANSAC cost vs the reference's 5-pt Stewenius
at mono-initialization scales (VERDICT round 1 item 10).

The framework replaces the 5-point Stewenius minimal solver (needs a
nonsymmetric 10x10 eigendecomposition — unavailable on TPU/XLA) with batched
8-point minimal sets (ops/solve/essential.py). The claimed trade: more
hypotheses per batch at near-zero marginal cost on the MXU. This script
quantifies it:

1. theory: hypotheses for 99% success  N99(s) = ln(0.01)/ln(1 - w^s)
2. practice: empirical success rate of find_via_ransac at the default
   256-hypothesis batch on synthetic bearing sets, inlier ratios 0.3-0.9
3. wall-clock of the batched program on the ambient device vs hypothesis count

Run: python scripts/measure_ransac_8pt.py   (writes markdown to stdout)
"""
from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stella_vslam_tpu.ops import lie
from stella_vslam_tpu.ops.solve import essential


def make_scene(rng, n=400, inlier_ratio=0.5, noise_rad=0.002):
    """Two views of a random cloud; a fraction of matches corrupted."""
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4, 9, n)], axis=-1)
    w = rng.normal(0, 0.05, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)), np.float64)
    t = np.array([0.6, 0.05, 0.02])
    b1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    p2 = pts @ R.T + t
    b2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)

    def jitter(b, s):
        v = b + rng.normal(0, s, b.shape)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    b1, b2 = jitter(b1, noise_rad), jitter(b2, noise_rad)
    n_out = int(n * (1 - inlier_ratio))
    out_idx = rng.choice(n, n_out, replace=False)
    fake = rng.normal(size=(n_out, 3))
    b2[out_idx] = fake / np.linalg.norm(fake, axis=1, keepdims=True)
    return b1.astype(np.float32), b2.astype(np.float32), out_idx


def main():
    rng = np.random.default_rng(0)
    print("## 8-pt minimal-set RANSAC vs 5-pt Stewenius (measured)\n")
    print("| inlier ratio w | N99 5-pt | N99 8-pt | success @256 hyp "
          "(20 trials) | mean inlier recall |")
    print("|---|---|---|---|---|")
    for w in (0.3, 0.45, 0.6, 0.75, 0.9):
        n99_5 = math.log(0.01) / math.log(1 - w ** 5)
        n99_8 = math.log(0.01) / math.log(1 - w ** 8)
        succ, recall = 0, []
        for trial in range(20):
            b1, b2, out_idx = make_scene(rng, inlier_ratio=w)
            key = jax.random.PRNGKey(trial)
            res = essential.find_via_ransac(
                key, jnp.asarray(b1), jnp.asarray(b2),
                jnp.ones(len(b1), bool))
            inl = np.asarray(res.is_inlier)
            true_inl = np.ones(len(b1), bool)
            true_inl[out_idx] = False
            # success = recovers >=70% of true inliers with <=10% of outliers
            rec = inl[true_inl].mean()
            false_rate = inl[~true_inl].mean() if (~true_inl).any() else 0.0
            ok = rec >= 0.7 and false_rate <= 0.1
            succ += int(ok)
            recall.append(rec)
        print(f"| {w:.2f} | {n99_5:.0f} | {n99_8:.0f} | {succ}/20 "
              f"| {np.mean(recall):.2f} |")

    # wall-clock vs hypothesis count on the ambient device
    print("\n| hypotheses | wall-clock / RANSAC call |")
    print("|---|---|")
    b1, b2, _ = make_scene(rng, inlier_ratio=0.5)
    for H in (256, 1024, 4096):
        key = jax.random.PRNGKey(0)
        r = essential.find_via_ransac(
            key, jnp.asarray(b1), jnp.asarray(b2), jnp.ones(len(b1), bool),
            num_hypotheses=H)
        jax.block_until_ready(r.num_inliers)  # compile
        t0 = time.perf_counter()
        reps = 20
        for i in range(reps):
            r = essential.find_via_ransac(
                jax.random.PRNGKey(i), jnp.asarray(b1), jnp.asarray(b2),
                jnp.ones(len(b1), bool), num_hypotheses=H)
        jax.block_until_ready(r.num_inliers)
        dt = (time.perf_counter() - t0) / reps
        print(f"| {H} | {dt * 1e3:.2f} ms |")


if __name__ == "__main__":
    main()
