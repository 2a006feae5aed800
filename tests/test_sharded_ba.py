"""Multi-device bundle adjustment on the virtual 8-CPU mesh (conftest.py):
the sharded path must agree with the single-device program and actually run
over a Mesh — this is the framework's multi-chip scaling story
(parallel/sharded_ba.py; SURVEY.md §2.10 distributed row)."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np
from jax.sharding import Mesh

from stella_vslam_tpu.ops.optim import ba
from stella_vslam_tpu.parallel.sharded_ba import (
    make_sharded_ba_step,
    sharded_bundle_adjust,
)
from tests.test_ba import CAM, build_problem, reproj_rmse


def _mesh(n=8):
    devs = jax.devices()
    assert len(devs) >= n, f"conftest must provide >= {n} virtual devices"
    return Mesh(np.array(devs[:n]), axis_names=("data",))


def test_sharded_bundle_adjust_matches_single_device():
    prob, poses, pts, L, K = build_problem(K=6, L=64, D=6)
    res_single = ba.bundle_adjust(prob, CAM)
    res_sharded = sharded_bundle_adjust(prob, CAM, mesh=_mesh())
    # identical program, partial-sum order differs -> tight but not exact
    np.testing.assert_allclose(
        np.asarray(res_sharded.cam_t), np.asarray(res_single.cam_t),
        atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(res_sharded.cam_R), np.asarray(res_single.cam_R),
        atol=5e-3, rtol=1e-3)
    lm_err = np.linalg.norm(
        np.asarray(res_sharded.lm_pos[:L]) - np.asarray(res_single.lm_pos[:L]),
        axis=-1)
    assert np.median(lm_err) < 1e-2, f"median lm divergence {np.median(lm_err)}"
    # and it must actually solve the problem, not just agree
    rmse = reproj_rmse(
        res_sharded, poses, pts, np.array(prob.obs_valid),
        np.array(prob.obs_cam), np.array(prob.obs_uv), L)
    assert rmse < 0.6, f"sharded reprojection RMSE {rmse}"


@pytest.mark.slow  # padding edge case; the parity + GN-step tests stay fast
def test_sharded_bundle_adjust_pads_nondivisible_rows():
    # L=36 is not a multiple of 8: exercises the pad + slice-back path
    prob, poses, pts, L, K = build_problem(K=4, L=36, D=4)
    res = sharded_bundle_adjust(prob, CAM, mesh=_mesh())
    assert res.lm_pos.shape[0] == prob.lm_pos.shape[0]
    rmse = reproj_rmse(
        res, poses, pts, np.array(prob.obs_valid), np.array(prob.obs_cam),
        np.array(prob.obs_uv), L)
    assert rmse < 0.6, f"padded sharded RMSE {rmse}"


def test_sharded_gn_step_reduces_cost_and_matches_dense():
    """The shard_map GN step (dryrun path): one step must match the dense
    single-device Schur GN step to tolerance and reduce the robust cost."""
    mesh = _mesh()
    prob, poses, pts, L, K = build_problem(K=4, L=64, D=4, noise=0.05)
    step = make_sharded_ba_step(mesh, CAM)
    out = step(prob)
    assert out.lm_pos.shape == prob.lm_pos.shape
    assert not bool(jnp.isnan(out.cam_t).any())

    def cost(p):
        r, _, _, dof, depth_ok, _ = ba._residuals(
            p, p.cam_R, p.cam_t, p.lm_pos, CAM, "perspective")
        w = (p.obs_valid & depth_ok & p.lm_valid[:, None]).astype(
            jnp.float32) * p.obs_inv_sigma_sq
        return float(jnp.sum(w * jnp.sum(r * r * dof, axis=-1)))

    assert cost(out) < cost(prob), "one sharded GN step must reduce the cost"
