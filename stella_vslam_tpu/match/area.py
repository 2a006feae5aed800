"""Area matcher for monocular initialization, dense masked form.

Reference: src/stella_vslam/match/area.cc match_in_consistent_area — level-0
keypoints of frame 1 matched against frame-2 keypoints within a +/-margin window
around the previously-matched coordinates, Lowe ratio + orientation check,
accept at HAMMING_DIST_THR_LOW, with per-target dedup (scatter-min here instead
of the reference's sequential overwrite)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stella_vslam_tpu.match import hamming as H


@partial(jax.jit, static_argnames=("check_orientation",))
def match_in_consistent_area(
    # frame 1 (init frame)
    kp1_level: jnp.ndarray,  # [N1]
    kp1_desc: jnp.ndarray,  # [N1,8]
    kp1_angle: jnp.ndarray,  # [N1]
    kp1_valid: jnp.ndarray,  # [N1]
    prev_matched: jnp.ndarray,  # [N1,2] search centers in frame 2
    # frame 2 (current)
    kp2_uv: jnp.ndarray,  # [N2,2]
    kp2_level: jnp.ndarray,
    kp2_desc: jnp.ndarray,
    kp2_angle: jnp.ndarray,
    kp2_valid: jnp.ndarray,
    *,
    margin: float = 100.0,
    lowe_ratio: float = 0.9,
    check_orientation: bool = True,
):
    """Returns (best_idx2 [N1] i32, accepted [N1] bool, best_dist [N1])."""
    N2 = kp2_desc.shape[0]
    dist = H.pairwise_hamming(kp1_desc, kp2_desc)  # [N1,N2]

    dx = jnp.abs(kp2_uv[None, :, 0] - prev_matched[:, None, 0])
    dy = jnp.abs(kp2_uv[None, :, 1] - prev_matched[:, None, 1])
    in_window = (dx <= margin) & (dy <= margin)
    # reference: only level-0 keypoints on both sides (scale_level_1==0 and
    # cell query restricted to [0, 0])
    level_ok = (kp1_level[:, None] == 0) & (kp2_level[None, :] == 0)
    cand = in_window & level_ok & kp1_valid[:, None] & kp2_valid[None, :]
    if check_orientation:
        d = kp1_angle[:, None] - kp2_angle[None, :]
        d = jnp.arctan2(jnp.sin(d), jnp.cos(d))
        cand = cand & (jnp.abs(d) <= jnp.deg2rad(30.0))

    dist = jnp.where(cand, dist, H.MAX_HAMMING_DIST + 1)
    best, best_idx, second = H.best_and_second(dist, axis=1)
    accepted = (
        (best <= H.HAMMING_DIST_THR_LOW)
        & (best.astype(jnp.float32) <= lowe_ratio * second.astype(jnp.float32))
        & kp1_valid
    )
    accepted = H.resolve_duplicate_targets(best_idx, best, accepted, N2)
    return best_idx, accepted, best
