"""Unit tests for rd_vio_tpu.ops.lie against scipy and group identities."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from rd_vio_tpu.ops import lie


def _rand_rotvec(rng, n=64):
    w = rng.normal(size=(n, 3))
    scales = rng.uniform(0, np.pi - 1e-3, size=(n, 1))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * scales
    w[0] = 0.0  # include identity
    w[1] = [1e-9, 0, 0]  # small-angle branch
    return w


def _to_scipy(q_wxyz):
    q = np.asarray(q_wxyz)
    return Rotation.from_quat(np.concatenate([q[..., 1:], q[..., :1]], axis=-1))


def test_expmap_matches_scipy(rng):
    w = _rand_rotvec(rng)
    q = np.asarray(lie.expmap(jnp.asarray(w)))
    R_ours = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    R_scipy = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-12)


def test_logmap_inverts_expmap(rng):
    w = _rand_rotvec(rng)
    w_back = np.asarray(lie.logmap(lie.expmap(jnp.asarray(w))))
    np.testing.assert_allclose(w_back, w, atol=1e-9)


def test_quat_mul_and_rotate(rng):
    w1, w2 = _rand_rotvec(rng), _rand_rotvec(rng)
    q1, q2 = lie.expmap(jnp.asarray(w1)), lie.expmap(jnp.asarray(w2))
    q12 = np.asarray(lie.quat_mul(q1, q2))
    R12 = (_to_scipy(np.asarray(q1)) * _to_scipy(np.asarray(q2))).as_matrix()
    np.testing.assert_allclose(
        np.asarray(lie.quat_to_matrix(jnp.asarray(q12))), R12, atol=1e-12
    )
    v = rng.normal(size=(64, 3))
    np.testing.assert_allclose(
        np.asarray(lie.quat_rotate(q1, jnp.asarray(v))),
        _to_scipy(np.asarray(q1)).apply(v),
        atol=1e-12,
    )


def test_matrix_to_quat_roundtrip(rng):
    w = _rand_rotvec(rng)
    q = lie.expmap(jnp.asarray(w))
    R = lie.quat_to_matrix(q)
    q_back = lie.matrix_to_quat(R)
    # same rotation up to sign; canonicalized w>=0 so compare via matrices
    np.testing.assert_allclose(
        np.asarray(lie.quat_to_matrix(q_back)), np.asarray(R), atol=1e-12
    )


def test_hat_cross(rng):
    a, b = rng.normal(size=(8, 3)), rng.normal(size=(8, 3))
    hv = np.einsum("nij,nj->ni", np.asarray(lie.hat(jnp.asarray(a))), b)
    np.testing.assert_allclose(hv, np.cross(a, b), atol=1e-14)


def test_right_jacobian_fd(rng):
    """Jr satisfies expmap(w + Jr(w)^-T-ish ...) — test via the defining
    first-order property: expmap(w + d) ≈ expmap(w) * expmap(Jr(w) d)."""
    w = rng.normal(size=3) * 0.7
    Jr = np.asarray(lie.right_jacobian(jnp.asarray(w)))
    for _ in range(5):
        d = rng.normal(size=3) * 1e-6
        lhs = np.asarray(lie.expmap(jnp.asarray(w + d)))
        rhs = np.asarray(
            lie.quat_mul(lie.expmap(jnp.asarray(w)), lie.expmap(jnp.asarray(Jr @ d)))
        )
        assert (
            np.linalg.norm(
                np.asarray(lie.logmap(lie.quat_mul(lie.quat_conj(jnp.asarray(rhs)), jnp.asarray(lhs))))
            )
            < 1e-10
        )


def test_s2_tangential_basis(rng):
    x = rng.normal(size=(32, 3))
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    B = np.asarray(lie.s2_tangential_basis(jnp.asarray(x)))
    # columns orthonormal and orthogonal to x
    for i in range(32):
        np.testing.assert_allclose(B[i].T @ B[i], np.eye(2), atol=1e-12)
        np.testing.assert_allclose(B[i].T @ x[i], 0, atol=1e-12)


def test_slerp_endpoints(rng):
    q0 = lie.expmap(jnp.asarray(rng.normal(size=3)))
    q1 = lie.expmap(jnp.asarray(rng.normal(size=3)))
    np.testing.assert_allclose(np.asarray(lie.slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-12)
    d = np.abs(np.dot(np.asarray(lie.slerp(q0, q1, 1.0)), np.asarray(q1)))
    assert d > 1 - 1e-12
