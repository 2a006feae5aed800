"""Unit tests for SO3/SE3/Sim3 ops (cross-checked against matrix exponentials)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from stella_vslam_tpu.ops import lie

RNG = np.random.default_rng(0)


def random_phi(scale=1.0):
    return jnp.asarray(RNG.normal(size=3) * scale, dtype=jnp.float32)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5, 2.0])
def test_so3_exp_log_roundtrip(scale):
    phi = random_phi(scale)
    R = lie.so3_exp(phi)
    np.testing.assert_allclose(np.array(R @ R.T), np.eye(3), atol=1e-5)
    phi2 = lie.so3_log(R)
    np.testing.assert_allclose(np.array(phi2), np.array(phi), atol=5e-4 * max(scale, 1e-2))


def test_so3_exp_matches_expm():
    phi = random_phi(1.0)
    R = lie.so3_exp(phi)
    R_ref = expm(np.array(lie.hat(phi)))
    np.testing.assert_allclose(np.array(R), R_ref, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-6, 0.3, 1.5])
def test_se3_exp_log_roundtrip(scale):
    xi = jnp.asarray(RNG.normal(size=6) * scale, dtype=jnp.float32)
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.array(xi2), np.array(xi), atol=1e-4 * max(scale, 1e-2))


def test_se3_exp_matches_expm():
    xi = jnp.asarray(RNG.normal(size=6) * 0.7, dtype=jnp.float32)
    R, t = lie.se3_exp(xi)
    G = np.zeros((4, 4))
    G[:3, :3] = np.array(lie.hat(xi[3:]))
    G[:3, 3] = np.array(xi[:3])
    T_ref = expm(G)
    np.testing.assert_allclose(np.array(R), T_ref[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.array(t), T_ref[:3, 3], atol=1e-5)


def test_se3_compose_inverse():
    xi1 = jnp.asarray(RNG.normal(size=6), dtype=jnp.float32)
    xi2 = jnp.asarray(RNG.normal(size=6), dtype=jnp.float32)
    R1, t1 = lie.se3_exp(xi1)
    R2, t2 = lie.se3_exp(xi2)
    Rc, tc = lie.se3_compose(R1, t1, R2, t2)
    Ri, ti = lie.se3_inverse(R1, t1)
    Rid, tid = lie.se3_compose(Ri, ti, Rc, tc)
    np.testing.assert_allclose(np.array(Rid), np.array(R2), atol=1e-5)
    np.testing.assert_allclose(np.array(tid), np.array(t2), atol=1e-5)


@pytest.mark.parametrize(
    "sigma,angle",
    [(0.0, 0.0), (0.0, 1.2), (0.4, 0.0), (0.4, 1.2), (-0.3, 2.5), (1e-6, 1e-6)],
)
def test_sim3_exp_matches_expm(sigma, angle):
    axis = RNG.normal(size=3)
    axis /= np.linalg.norm(axis)
    phi = axis * angle
    rho = RNG.normal(size=3)
    xi = jnp.asarray(np.concatenate([rho, phi, [sigma]]), dtype=jnp.float32)
    s, R, t = lie.sim3_exp(xi)
    G = np.zeros((4, 4))
    G[:3, :3] = np.array(lie.hat(jnp.asarray(phi, dtype=jnp.float32))) + sigma * np.eye(3)
    G[:3, 3] = rho
    T_ref = expm(G)
    sR_ref = T_ref[:3, :3]
    s_ref = np.cbrt(np.linalg.det(sR_ref))
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-5)
    np.testing.assert_allclose(np.array(s * R), sR_ref, atol=2e-5)
    np.testing.assert_allclose(np.array(t), T_ref[:3, 3], atol=2e-4)


@pytest.mark.parametrize("sigma,angle", [(0.0, 0.7), (0.5, 1e-7), (-0.4, 2.0)])
def test_sim3_log_roundtrip(sigma, angle):
    axis = RNG.normal(size=3)
    axis /= np.linalg.norm(axis)
    xi = jnp.asarray(
        np.concatenate([RNG.normal(size=3), axis * angle, [sigma]]), dtype=jnp.float32
    )
    s, R, t = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(s, R, t)
    np.testing.assert_allclose(np.array(xi2), np.array(xi), atol=3e-4)


def test_sim3_compose_inverse():
    xi = jnp.asarray(RNG.normal(size=7) * 0.5, dtype=jnp.float32)
    s, R, t = lie.sim3_exp(xi)
    si, Ri, ti = lie.sim3_inverse(s, R, t)
    sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
    np.testing.assert_allclose(float(sc), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.array(Rc), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.array(tc), np.zeros(3), atol=1e-5)
    p = jnp.asarray(RNG.normal(size=3), dtype=jnp.float32)
    p2 = lie.sim3_apply(si, Ri, ti, lie.sim3_apply(s, R, t, p))
    np.testing.assert_allclose(np.array(p2), np.array(p), atol=1e-5)


def test_batched_vmap():
    xis = jnp.asarray(RNG.normal(size=(32, 6)) * 0.5, dtype=jnp.float32)
    R, t = jax.vmap(lie.se3_exp)(xis)
    assert R.shape == (32, 3, 3) and t.shape == (32, 3)
    xi2 = jax.vmap(lie.se3_log)(R, t)
    np.testing.assert_allclose(np.array(xi2), np.array(xis), atol=1e-4)


def test_rotation_project():
    R = lie.so3_exp(random_phi()) + 0.01 * jnp.asarray(RNG.normal(size=(3, 3)), dtype=jnp.float32)
    Rp = lie.rotation_project(R)
    np.testing.assert_allclose(np.array(Rp @ Rp.T), np.eye(3), atol=1e-5)
    assert float(jnp.linalg.det(Rp)) == pytest.approx(1.0, abs=1e-5)
