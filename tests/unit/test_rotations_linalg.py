"""Math utility tests: quaternion ops and unrolled Cholesky."""
import numpy as np

from openballbot_rl_tpu.physics import rotations as rot
from openballbot_rl_tpu.physics.linalg import cho_solve_unrolled, cholesky_unrolled


def _rand_quat(rng):
    q = rng.standard_normal(4).astype(np.float32)
    return q / np.linalg.norm(q)


def test_quat_to_mat_orthonormal():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = _rand_quat(rng)
        R = np.asarray(rot.quat_to_mat(q))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = _rand_quat(rng)
    v = rng.standard_normal(3).astype(np.float32)
    R = np.asarray(rot.quat_to_mat(q))
    np.testing.assert_allclose(np.asarray(rot.quat_rotate(q, v)), R @ v,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot.quat_rotate_inv(q, v)), R.T @ v,
                               atol=1e-5)


def test_rotvec_roundtrip():
    rng = np.random.default_rng(2)
    for scale in (1e-6, 0.1, 1.0, 3.0):
        rv = rng.standard_normal(3).astype(np.float32)
        rv = rv / np.linalg.norm(rv) * scale
        q = np.asarray(rot.rotvec_to_quat(rv))
        rv2 = np.asarray(rot.quat_to_rotvec(q))
        np.testing.assert_allclose(rv2, rv, atol=1e-4)


def test_quat_mul_vs_matrix_compose():
    rng = np.random.default_rng(3)
    qa, qb = _rand_quat(rng), _rand_quat(rng)
    Rab = np.asarray(rot.quat_to_mat(np.asarray(rot.quat_mul(qa, qb))))
    Ra = np.asarray(rot.quat_to_mat(qa))
    Rb = np.asarray(rot.quat_to_mat(qb))
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)


def test_axis_angle_rotate():
    axis = np.array([0.0, 0.0, 1.0], np.float32)
    v = np.array([1.0, 0.0, 0.0], np.float32)
    out = np.asarray(rot.axis_angle_rotate(axis, np.float32(np.pi / 2), v))
    np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)


def test_skew():
    a = np.array([1.0, 2.0, 3.0], np.float32)
    b = np.array([-2.0, 0.5, 4.0], np.float32)
    np.testing.assert_allclose(np.asarray(rot.skew(a)) @ b, np.cross(a, b),
                               atol=1e-6)


def test_cholesky_and_solve():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((9, 9))
    A = (A @ A.T + 9 * np.eye(9)).astype(np.float32)
    L = np.asarray(cholesky_unrolled(A))
    np.testing.assert_allclose(L @ L.T, A, rtol=2e-4, atol=2e-4)
    b = rng.standard_normal(9).astype(np.float32)
    x = np.asarray(cho_solve_unrolled(L, b))
    np.testing.assert_allclose(A @ x, b, rtol=2e-3, atol=2e-3)
    B = rng.standard_normal((9, 5)).astype(np.float32)
    X = np.asarray(cho_solve_unrolled(L, B))
    np.testing.assert_allclose(A @ X, B, rtol=2e-3, atol=2e-3)


def test_batched_via_vmap():
    import jax

    rng = np.random.default_rng(5)
    A = rng.standard_normal((4, 6, 6))
    A = (A @ np.transpose(A, (0, 2, 1)) + 6 * np.eye(6)).astype(np.float32)
    L = np.asarray(jax.vmap(cholesky_unrolled)(A))
    np.testing.assert_allclose(L @ np.transpose(L, (0, 2, 1)), A,
                               rtol=2e-4, atol=2e-4)
