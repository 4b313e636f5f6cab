"""Preintegration scan vs. a straightforward NumPy re-implementation of the
reference update (SURVEY.md §4.1), plus finite-difference bias-Jacobian checks."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from rd_vio_tpu.ops import preintegration as pre
from rd_vio_tpu.ops import lie


def _numpy_preintegrate(dts, ws, accs, bg, ba, cov_w, cov_a, cov_bg, cov_ba):
    """Literal NumPy transcription of the update equations
    (reference preintegrator.cpp:22-76) as an independent oracle."""
    q = np.array([0.0, 0.0, 0.0, 1.0])  # scipy xyzw
    p = np.zeros(3)
    v = np.zeros(3)
    cov = np.zeros((15, 15))
    t = 0.0
    J = {k: np.zeros((3, 3)) for k in ["dq_dbg", "dp_dbg", "dp_dba", "dv_dbg", "dv_dba"]}

    def hat(x):
        return np.array([[0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]])

    for dt, w_raw, a_raw in zip(dts, ws, accs):
        w = w_raw - bg
        a = a_raw - ba
        Rq = Rotation.from_quat(q).as_matrix()
        Rinc = Rotation.from_rotvec(w * dt).as_matrix()
        Jr = np.asarray(lie.right_jacobian(jnp.asarray(w * dt)))

        A = np.eye(9)
        A[0:3, 0:3] = Rinc.T
        A[6:9, 0:3] = -dt * Rq @ hat(a)
        A[3:6, 0:3] = -0.5 * dt * dt * Rq @ hat(a)
        A[3:6, 6:9] = dt * np.eye(3)
        B = np.zeros((9, 6))
        B[0:3, 0:3] = dt * Jr
        B[6:9, 3:6] = dt * Rq
        B[3:6, 3:6] = 0.5 * dt * dt * Rq
        Wn = np.zeros((6, 6))
        inv_dt = 1.0 / max(dt, 1e-7)
        Wn[0:3, 0:3] = cov_w * inv_dt
        Wn[3:6, 3:6] = cov_a * inv_dt
        cov[0:9, 0:9] = A @ cov[0:9, 0:9] @ A.T + B @ Wn @ B.T
        cov[9:12, 9:12] += cov_bg * dt
        cov[12:15, 12:15] += cov_ba * dt

        J["dp_dbg"] = J["dp_dbg"] + dt * J["dv_dbg"] - 0.5 * dt * dt * Rq @ hat(a) @ J["dq_dbg"]
        J["dp_dba"] = J["dp_dba"] + dt * J["dv_dba"] - 0.5 * dt * dt * Rq
        J["dv_dbg"] = J["dv_dbg"] - dt * Rq @ hat(a) @ J["dq_dbg"]
        J["dv_dba"] = J["dv_dba"] - dt * Rq
        J["dq_dbg"] = Rinc.T @ J["dq_dbg"] - dt * Jr

        p = p + dt * v + 0.5 * dt * dt * (Rq @ a)
        v = v + dt * (Rq @ a)
        q = (Rotation.from_quat(q) * Rotation.from_rotvec(w * dt)).as_quat()
        t += dt
    return t, q, p, v, cov, J


def _make_imu(rng, n=40):
    dts = rng.uniform(0.004, 0.006, size=n)
    ws = rng.normal(0, 0.4, size=(n, 3))
    accs = rng.normal(0, 1.0, size=(n, 3)) + np.array([0, 0, 9.80665])
    return dts, ws, accs


def test_matches_numpy_oracle(rng):
    dts, ws, accs = _make_imu(rng)
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.05, 0.02, -0.04])
    covs = [np.eye(3) * c for c in [2.9e-8, 4e-6, 3.8e-10, 9e-6]]
    d = pre.integrate(
        jnp.asarray(dts), jnp.asarray(ws), jnp.asarray(accs),
        jnp.asarray(bg), jnp.asarray(ba), *[jnp.asarray(c) for c in covs]
    )
    t, q, p, v, cov, J = _numpy_preintegrate(dts, ws, accs, bg, ba, *covs)
    assert abs(float(d.t) - t) < 1e-12
    q_ours = np.asarray(d.q)
    np.testing.assert_allclose(
        Rotation.from_quat(np.r_[q_ours[1:], q_ours[0]]).as_matrix(),
        Rotation.from_quat(q).as_matrix(),
        atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(d.p), p, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.v), v, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.cov), cov, atol=1e-18, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(d.dq_dbg), J["dq_dbg"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.dp_dbg), J["dp_dbg"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.dp_dba), J["dp_dba"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.dv_dbg), J["dv_dbg"], atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.dv_dba), J["dv_dba"], atol=1e-12)


def test_padding_is_noop(rng):
    dts, ws, accs = _make_imu(rng, n=20)
    covs = [jnp.eye(3) * c for c in [2.9e-8, 4e-6, 3.8e-10, 9e-6]]
    bg = jnp.zeros(3)
    ba = jnp.zeros(3)
    d1 = pre.integrate(jnp.asarray(dts), jnp.asarray(ws), jnp.asarray(accs), bg, ba, *covs)
    # pad with 12 zero-dt garbage samples
    dts_p = np.concatenate([dts, np.zeros(12)])
    ws_p = np.concatenate([ws, np.full((12, 3), 7.7)])
    accs_p = np.concatenate([accs, np.full((12, 3), -3.3)])
    d2 = pre.integrate(jnp.asarray(dts_p), jnp.asarray(ws_p), jnp.asarray(accs_p), bg, ba, *covs)
    np.testing.assert_allclose(np.asarray(d1.q), np.asarray(d2.q), atol=1e-15)
    np.testing.assert_allclose(np.asarray(d1.p), np.asarray(d2.p), atol=1e-15)
    np.testing.assert_allclose(np.asarray(d1.cov), np.asarray(d2.cov), atol=1e-20)


def test_bias_jacobians_fd(rng):
    """First-order bias correction must match re-integration at shifted bias."""
    dts, ws, accs = _make_imu(rng, n=30)
    covs = [jnp.eye(3) * 1e-6] * 4
    bg = jnp.asarray([0.01, -0.02, 0.005])
    ba = jnp.asarray([0.05, 0.02, -0.04])
    d0 = pre.integrate(jnp.asarray(dts), jnp.asarray(ws), jnp.asarray(accs), bg, ba, *covs)
    dbg = np.array([1e-5, -2e-5, 1.5e-5])
    dba = np.array([3e-5, 1e-5, -2e-5])
    d1 = pre.integrate(
        jnp.asarray(dts), jnp.asarray(ws), jnp.asarray(accs),
        bg + jnp.asarray(dbg), ba + jnp.asarray(dba), *covs
    )
    # predicted corrections
    p_pred = np.asarray(d0.p) + np.asarray(d0.dp_dbg) @ dbg + np.asarray(d0.dp_dba) @ dba
    v_pred = np.asarray(d0.v) + np.asarray(d0.dv_dbg) @ dbg + np.asarray(d0.dv_dba) @ dba
    q_pred = np.asarray(
        lie.quat_mul(d0.q, lie.expmap(jnp.asarray(np.asarray(d0.dq_dbg) @ dbg)))
    )
    np.testing.assert_allclose(p_pred, np.asarray(d1.p), atol=1e-9)
    np.testing.assert_allclose(v_pred, np.asarray(d1.v), atol=1e-9)
    dq = np.asarray(lie.logmap(lie.quat_mul(lie.quat_conj(jnp.asarray(q_pred)), d1.q)))
    assert np.linalg.norm(dq) < 1e-9


def test_sqrt_inv_cov_whitens(rng):
    A = rng.normal(size=(15, 15))
    cov = A @ A.T + 1e-3 * np.eye(15)
    U = np.asarray(pre.sqrt_inv_cov(jnp.asarray(cov)))
    np.testing.assert_allclose(U.T @ U, np.linalg.inv(cov), atol=1e-8, rtol=1e-6)
    assert np.allclose(U, np.triu(U))


def test_predict_gravity(rng):
    """predict() must reproduce ground truth for a constant-acceleration run."""
    n = 50
    dts = np.full(n, 0.005)
    ws = np.zeros((n, 3))
    a_body = np.array([0.3, -0.1, 9.80665 + 0.2])
    accs = np.tile(a_body, (n, 1))
    covs = [jnp.eye(3) * 1e-8] * 4
    d = pre.integrate(jnp.asarray(dts), jnp.asarray(ws), jnp.asarray(accs),
                      jnp.zeros(3), jnp.zeros(3), *covs)
    q0 = jnp.asarray([1.0, 0, 0, 0])
    p0 = jnp.asarray([1.0, 2.0, 3.0])
    v0 = jnp.asarray([0.1, 0.0, -0.1])
    q1, p1, v1, _, _ = pre.predict(d, q0, p0, v0, jnp.zeros(3), jnp.zeros(3))
    T = n * 0.005
    a_world = a_body + np.array([0, 0, -9.80665])
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0) + a_world * T, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p0) + np.asarray(v0) * T + 0.5 * a_world * T * T, atol=1e-10
    )


def test_host_mean_matches_scan(rng):
    """ops/preintegration_np (host mean-only path used by the per-frame
    predict/propagate hot path) must match the jitted scan's mean fields and
    predict() exactly."""
    from rd_vio_tpu.ops import preintegration_np as pre_np

    n = 37
    dts = np.abs(rng.normal(0.005, 0.001, n))
    ws = rng.normal(0, 0.8, (n, 3))
    accs = rng.normal(0, 2.0, (n, 3)) + [0, 0, 9.8]
    bg = rng.normal(0, 0.01, 3)
    ba = rng.normal(0, 0.05, 3)
    covs = [jnp.eye(3) * 1e-6] * 4

    # pad with zeros (exact no-op in both implementations)
    dts_p = np.concatenate([dts, np.zeros(11)])
    ws_p = np.concatenate([ws, np.zeros((11, 3))])
    accs_p = np.concatenate([accs, np.zeros((11, 3))])

    d = pre.integrate(jnp.asarray(dts_p), jnp.asarray(ws_p), jnp.asarray(accs_p),
                      jnp.asarray(bg), jnp.asarray(ba), *covs)
    t_h, q_h, p_h, v_h = pre_np.integrate_mean(dts_p, ws_p, accs_p, bg, ba)
    np.testing.assert_allclose(t_h, float(d.t), atol=1e-14)
    np.testing.assert_allclose(q_h, np.asarray(d.q), atol=1e-12)
    np.testing.assert_allclose(p_h, np.asarray(d.p), atol=1e-12)
    np.testing.assert_allclose(v_h, np.asarray(d.v), atol=1e-12)

    q0 = np.asarray([0.8, 0.1, -0.3, 0.5])
    q0 = q0 / np.linalg.norm(q0)
    p0 = np.array([1.0, -2.0, 0.5])
    v0 = np.array([0.2, 0.1, -0.4])
    qj, pj, vj, _, _ = pre.predict(d, jnp.asarray(q0), jnp.asarray(p0),
                                   jnp.asarray(v0), jnp.asarray(bg), jnp.asarray(ba))
    q2, p2, v2 = pre_np.predict_mean(t_h, q_h, p_h, v_h, q0, p0, v0)
    np.testing.assert_allclose(q2, np.asarray(qj), atol=1e-12)
    np.testing.assert_allclose(p2, np.asarray(pj), atol=1e-12)
    np.testing.assert_allclose(v2, np.asarray(vj), atol=1e-12)
