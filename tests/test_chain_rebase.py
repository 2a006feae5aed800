"""Unit test for the on-device chain rebase (tracking_module._rebase_chain).

The rebase re-syncs the device-chained tracking state with a freshly
published landmark table: positions re-gathered by id, absent ids
invalidated, chained poses re-anchored by T_new = T_old @ A (the reference's
update_last_frame semantics, tracking_module.cc:433, applied on device).
"""
import jax.numpy as jnp
import numpy as np

from stella_vslam_tpu.tracking_module import _rebase_chain


def _se3(R, t):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def test_rebase_positions_and_invalidations():
    rng = np.random.default_rng(3)
    N, C = 64, 128
    la_id = np.full(N, -1, np.int32)
    la_id[:20] = rng.choice(500, 20, replace=False).astype(np.int32)
    la_pos = rng.normal(size=(N, 3)).astype(np.float32)
    la_valid = la_id >= 0

    tbl_ids = np.full(C, -1, np.int32)
    # first 12 chain ids are in the new table (with moved positions),
    # the other 8 are not (culled / out of window)
    tbl_ids[:12] = la_id[:12]
    tbl_ids[12:40] = 1000 + np.arange(28)
    tbl_pos = rng.normal(size=(C, 3)).astype(np.float32)

    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    new_pos, new_valid, new_id, *_ = _rebase_chain(
        jnp.asarray(la_pos), jnp.asarray(la_valid), jnp.asarray(la_id),
        jnp.asarray(tbl_ids), jnp.asarray(tbl_pos),
        eye, zero, eye, zero, eye, zero,
    )
    new_pos, new_valid, new_id = map(np.asarray, (new_pos, new_valid, new_id))
    # present ids: position comes from the new table, stay valid
    np.testing.assert_allclose(new_pos[:12], tbl_pos[:12], rtol=1e-6)
    assert new_valid[:12].all()
    assert (new_id[:12] == la_id[:12]).all()
    # absent ids: invalidated
    assert not new_valid[12:20].any()
    assert (new_id[12:20] == -1).all()
    # empty slots stay empty
    assert not new_valid[20:].any()


def test_rebase_pose_reanchor_matches_reference_update_last_frame():
    rng = np.random.default_rng(7)

    def rand_R():
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    T_ref_old = _se3(rand_R(), rng.normal(size=3))
    T_ref_new = _se3(rand_R(), rng.normal(size=3))
    T_last = _se3(rand_R(), rng.normal(size=3))
    T_prev = _se3(rand_R(), rng.normal(size=3))
    A = np.linalg.inv(T_ref_old) @ T_ref_new

    # reference semantics: T_last_new = (T_last @ inv(T_ref_old)) @ T_ref_new
    expect_last = T_last @ np.linalg.inv(T_ref_old) @ T_ref_new
    expect_prev = T_prev @ np.linalg.inv(T_ref_old) @ T_ref_new

    N, C = 8, 8
    f32 = lambda *s: jnp.zeros(s, jnp.float32)
    out = _rebase_chain(
        f32(N, 3), jnp.zeros(N, bool), jnp.full(N, -1, jnp.int32),
        jnp.full(C, -1, jnp.int32), f32(C, 3),
        jnp.asarray(A[:3, :3], jnp.float32), jnp.asarray(A[:3, 3], jnp.float32),
        jnp.asarray(T_last[:3, :3], jnp.float32),
        jnp.asarray(T_last[:3, 3], jnp.float32),
        jnp.asarray(T_prev[:3, :3], jnp.float32),
        jnp.asarray(T_prev[:3, 3], jnp.float32),
    )
    _, _, _, R_l, t_l, R_p, t_p = out
    np.testing.assert_allclose(np.asarray(R_l), expect_last[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_l), expect_last[:3, 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(R_p), expect_prev[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_p), expect_prev[:3, 3], atol=1e-5)
