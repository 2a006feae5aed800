"""Low-inlier monocular initialization: the escalated RANSAC fallback.

Reference anchor: solve/essential_5pt.h + essential_solver.h:46-58 — the
reference keeps hard mono inits workable at low inlier ratios by shrinking
the minimal set to 5 points (Stewenius), keeping the all-inlier sampling
probability usable. The TPU counterpart (PARITY.md §2.6) is brute batch:
when the standard 1024-hypothesis 8-point batch fails with consensus below
the measured ~45% crossover, the initializer retries with a chunked
32k-hypothesis sweep plus locally-optimized refit rounds
(ops/solve/ransac.escalate_scan).

These tests build 30%-inlier two-view problems where the standard path
mostly fails and assert the escalated path recovers them.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stella_vslam_tpu.camera import base as cam
from stella_vslam_tpu.module.initializer import Initializer
from stella_vslam_tpu.ops.solve import essential as esolve

N_MATCHES = 400
INLIER_RATIO = 0.30


def _two_view_bearings(seed: int, n: int = N_MATCHES,
                       inlier_ratio: float = INLIER_RATIO):
    """Ground-truth two-view bearing problem: cam1 at identity, cam2 offset
    by (R_21, t_21); `inlier_ratio` of the matches are true correspondences
    (0.3 mrad bearing noise), the rest are random directions."""
    rng = np.random.default_rng(seed)
    # points in a shell around the cameras (equirect sees all directions)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    X = dirs * rng.uniform(2.0, 6.0, size=(n, 1))
    ang = np.deg2rad(4.0)
    R_21 = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                     [-np.sin(ang), 0, np.cos(ang)]])
    t_21 = np.array([0.25, 0.05, 0.0])
    b1 = X / np.linalg.norm(X, axis=1, keepdims=True)
    Xc2 = X @ R_21.T + t_21
    b2 = Xc2 / np.linalg.norm(Xc2, axis=1, keepdims=True)
    b1 += rng.normal(scale=3e-4, size=b1.shape)
    b2 += rng.normal(scale=3e-4, size=b2.shape)
    b1 /= np.linalg.norm(b1, axis=1, keepdims=True)
    b2 /= np.linalg.norm(b2, axis=1, keepdims=True)
    is_true = np.zeros(n, bool)
    is_true[: int(n * inlier_ratio)] = True
    rng.shuffle(is_true)
    junk = rng.normal(size=(n, 3))
    junk /= np.linalg.norm(junk, axis=1, keepdims=True)
    b2 = np.where(is_true[:, None], b2, junk)
    return (jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32),
            is_true, R_21, t_21)


def _recovers(res, is_true) -> bool:
    """The solver found the true model iff its inlier set covers most of the
    true correspondences (a wrong E cannot: outliers are random directions)."""
    if not bool(res.valid):
        return False
    inl = np.asarray(res.is_inlier)
    return inl[is_true].mean() > 0.7


def test_escalated_beats_standard_at_30pct():
    """At a 30% inlier ratio the standard 1024-hypothesis batch is a coin
    flip at best (all-inlier 8-sample probability 0.3^8 ~ 6.6e-5); the
    escalated chunked sweep with LO refits recovers nearly every problem."""
    std_ok, esc_ok = 0, 0
    seeds = range(8)
    for seed in seeds:
        b1, b2, is_true, _, _ = _two_view_bearings(seed)
        valid = jnp.ones(N_MATCHES, bool)
        k = jax.random.PRNGKey(seed)
        std = esolve.find_via_ransac(k, b1, b2, valid, num_hypotheses=1024)
        esc = esolve.find_via_ransac_escalated(k, b1, b2, valid)
        std_ok += _recovers(std, is_true)
        esc_ok += _recovers(esc, is_true)
    assert esc_ok >= 7, f"escalated path too weak: {esc_ok}/8"
    assert esc_ok > std_ok, (
        f"escalation shows no gain: std {std_ok}/8 vs esc {esc_ok}/8")


def _run_initializer(camera, b1, b2, R_21, t_21, *, gate_thr=None):
    """One _initialize_from_aligned attempt on a fresh Initializer (fresh =
    deterministic fixed-seed key stream per attempt). Returns True iff the
    init SUCCEEDED *and* recovered the true motion (rotation within 3 deg,
    translation direction within 10 deg — two-view scale is arbitrary; at
    30% inliers + 0.3 mrad noise a correct model lands a few degrees off,
    while a wrong model is tens of degrees off)."""

    class _Ref:  # the solver path only touches .bearings / .undist_xy
        pass

    ref = _Ref()
    ref.bearings = b1
    ref.undist_xy = jnp.zeros((N_MATCHES, 2), jnp.float32)  # unused (360)
    valid = jnp.ones(N_MATCHES, bool)
    kwargs = {} if gate_thr is None else {"escalation_ratio_thr": gate_thr}
    ini = Initializer(camera, None, use_fixed_seed=True, **kwargs)
    if not ini._initialize_from_aligned(ref, None, b2, valid, N_MATCHES):
        return False
    dR = ini.R_21 @ R_21.T
    rot_err = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    t_est = ini.t_21 / np.linalg.norm(ini.t_21)
    t_gt = t_21 / np.linalg.norm(t_21)
    t_err = np.rad2deg(np.arccos(np.clip(abs(t_est @ t_gt), -1, 1)))
    return rot_err < 3.0 and t_err < 10.0


@pytest.mark.slow
def test_initializer_escalates_and_reconstructs():
    """End-to-end through Initializer._initialize_from_aligned at a 30%
    inlier ratio: the escalated path (default gate) must recover the true
    motion on strictly more problems than the gate-disabled standard path,
    including at least one problem the standard path outright loses."""
    node = {"name": "360", "setup": "monocular", "model": "equirectangular",
            "cols": 1920, "rows": 960, "fps": 20.0}
    camera = cam.camera_from_yaml(node)

    std_ok, esc_ok, rescued = 0, 0, 0
    for seed in range(6):
        b1, b2, is_true, R_21, t_21 = _two_view_bearings(seed)
        # gate_thr=0 -> never escalate: the plain 1024-hypothesis batch
        std = _run_initializer(camera, b1, b2, R_21, t_21, gate_thr=0.0)
        esc = _run_initializer(camera, b1, b2, R_21, t_21)
        std_ok += std
        esc_ok += esc
        rescued += (esc and not std)
    assert esc_ok >= 5, f"escalated init too weak at 30% inliers: {esc_ok}/6"
    assert rescued >= 1, (
        f"escalation never rescued a standard-path failure "
        f"(std {std_ok}/6, esc {esc_ok}/6)")
