"""Host-side (NumPy) mean-only IMU preintegration.

The per-frame hot path only needs the *mean* delta (q, p, v) to predict the
next frame's state (reference preintegrator.cpp:72-75 mean rows + :102-112
predict); covariance and bias Jacobians are only consumed by the BA factors,
which integrate on-device in `ops/preintegration.py`. Running the mean
propagation on host removes one device dispatch + fetch per call — on
tunneled TPU deployments each host<->device interaction costs ~30 ms, far
more than this ~10-sample quaternion loop costs in Python.

Semantics match ops/preintegration.integrate + predict exactly (same update
order, same normalization); tests cross-check against the jitted scan.
"""

from __future__ import annotations

import numpy as np

GRAVITY = np.array([0.0, 0.0, -9.80665])


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _quat_rotate(q, v):
    from rd_vio_tpu.models.quat_np import _cross3

    w = q[0]
    u = q[1:]
    return v + 2.0 * _cross3(u, _cross3(u, v) + w * v)


def _expmap(rv):
    theta = np.linalg.norm(rv)
    half = 0.5 * theta
    if theta < 1e-12:
        # Taylor guard matching ops/lie.py small-angle branch
        w = 1.0 - half * half / 2.0
        xyz = 0.5 * rv
    else:
        w = np.cos(half)
        xyz = np.sin(half) / theta * rv
    return np.array([w, xyz[0], xyz[1], xyz[2]])


def integrate_mean(dts, ws, accs, bg, ba):
    """Mean-only preintegration over raw samples at bias (bg, ba).

    Returns (t, dq, dp, dv) matching PreintDelta's mean fields.
    """
    t = 0.0
    q = np.array([1.0, 0.0, 0.0, 0.0])
    p = np.zeros(3)
    v = np.zeros(3)
    for dt, w_raw, a_raw in zip(dts, ws, accs):
        if dt == 0.0:
            continue
        a = a_raw - ba
        qa = _quat_rotate(q, a)
        p = p + dt * v + 0.5 * dt * dt * qa
        v = v + dt * qa
        q = _quat_mul(q, _expmap((w_raw - bg) * dt))
        q = q / np.linalg.norm(q)
        t += dt
    return t, q, p, v


def predict_mean(t, dq, dp, dv, q, p, v):
    """Gravity-aware forward propagation by a mean delta
    (reference preintegrator.cpp:102-112)."""
    v_new = v + GRAVITY * t + _quat_rotate(q, dv)
    p_new = p + 0.5 * GRAVITY * t * t + v * t + _quat_rotate(q, dp)
    q_new = _quat_mul(q, dq)
    q_new = q_new / np.linalg.norm(q_new)
    return q_new, p_new, v_new


def interval_rotation_mean(dts, ws, accs, bg, ba):
    """Delta rotation quaternion of one IMU interval (native fast path:
    predict_mean from the identity state — its q output IS the mean dq)."""
    from rd_vio_tpu import native

    if native.available():
        q, _, _ = native.predict_mean(
            np.array([1.0, 0, 0, 0]), np.zeros(3), np.zeros(3),
            bg, ba, dts, ws, accs,
        )
        return q
    _, dq, _, _ = integrate_mean(dts, ws, accs, bg, ba)
    return dq


def predict_frame_mean(q0, p0, v0, bg, ba, dts, ws, accs):
    """integrate_mean + predict_mean in one call; returns (q, p, v).

    Uses the native C++ integrator when available (~20 us vs ~1.5 ms for the
    per-sample Python loop; this runs ~3x per frame on the host hot path),
    with this module's loop as the oracle/fallback."""
    from rd_vio_tpu import native

    if native.available():
        return native.predict_mean(q0, p0, v0, bg, ba, dts, ws, accs)
    t, dq, dp, dv = integrate_mean(dts, ws, accs, bg, ba)
    return predict_mean(t, dq, dp, dv, q0, p0, v0)


# ---------------------------------------------------------------------------
# full preintegration (mean + covariance + bias Jacobians + whitening) on host
# ---------------------------------------------------------------------------


def _quat_to_R(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def _right_jacobian(w):
    theta2 = float(w @ w)
    theta = np.sqrt(max(theta2, 1e-12))
    if theta2 < 1e-10:
        a = 0.5 - theta2 / 24.0
        b = 1.0 / 6.0 - theta2 / 120.0
    else:
        a = (1.0 - np.cos(theta)) / theta2
        b = (theta - np.sin(theta)) / (theta2 * theta)
    W = _hat(w)
    return np.eye(3) - a * W + b * (W @ W)


def _integrate_full_one(dts, ws, accs, bg, ba, cov_w, cov_a, cov_bg, cov_ba):
    """Sequential full preintegration of ONE padded factor (NumPy fallback of
    native/preintegrator.cpp; mirrors ops/preintegration.integrate_sequential
    = reference preintegrator.cpp:22-95)."""
    ES_Q, ES_P, ES_V, ES_BG, ES_BA = 0, 3, 6, 9, 12
    t = 0.0
    q = np.array([1.0, 0, 0, 0])
    p = np.zeros(3)
    v = np.zeros(3)
    cov = np.zeros((15, 15))
    dq_dbg = np.zeros((3, 3))
    dp_dbg = np.zeros((3, 3))
    dp_dba = np.zeros((3, 3))
    dv_dbg = np.zeros((3, 3))
    dv_dba = np.zeros((3, 3))
    for dt, w_raw, a_raw in zip(dts, ws, accs):
        if dt == 0.0:
            continue
        w = w_raw - bg
        a = a_raw - ba
        wdt = w * dt
        dq_inc = _expmap(wdt)
        R_inc_T = _quat_to_R(dq_inc).T
        Rk = _quat_to_R(q)
        Rk_hat_a = Rk @ _hat(a)
        Jr = _right_jacobian(wdt)

        A = np.eye(9)
        A[ES_Q:ES_Q + 3, ES_Q:ES_Q + 3] = R_inc_T
        A[ES_V:ES_V + 3, ES_Q:ES_Q + 3] = -dt * Rk_hat_a
        A[ES_P:ES_P + 3, ES_Q:ES_Q + 3] = -0.5 * dt * dt * Rk_hat_a
        A[ES_P:ES_P + 3, ES_V:ES_V + 3] += dt * np.eye(3)
        B = np.zeros((9, 6))
        B[ES_Q:ES_Q + 3, 0:3] = dt * Jr
        B[ES_V:ES_V + 3, 3:6] = dt * Rk
        B[ES_P:ES_P + 3, 3:6] = 0.5 * dt * dt * Rk
        inv_dt = 1.0 / max(dt, 1e-7)
        Wn = np.zeros((6, 6))
        Wn[0:3, 0:3] = cov_w * inv_dt
        Wn[3:6, 3:6] = cov_a * inv_dt
        cov9 = cov[:9, :9]
        cov[:9, :9] = A @ cov9 @ A.T + B @ Wn @ B.T
        cov[ES_BG:ES_BG + 3, ES_BG:ES_BG + 3] += cov_bg * dt
        cov[ES_BA:ES_BA + 3, ES_BA:ES_BA + 3] += cov_ba * dt

        dp_dbg = dp_dbg + dt * dv_dbg - 0.5 * dt * dt * Rk_hat_a @ dq_dbg
        dp_dba = dp_dba + dt * dv_dba - 0.5 * dt * dt * Rk
        dv_dbg = dv_dbg - dt * Rk_hat_a @ dq_dbg
        dv_dba = dv_dba - dt * Rk
        dq_dbg = R_inc_T @ dq_dbg - dt * Jr

        qa = _quat_rotate(q, a)
        p = p + dt * v + 0.5 * dt * dt * qa
        v = v + dt * qa
        q = _quat_mul(q, dq_inc)
        q = q / np.linalg.norm(q)
        t += dt

    if t <= 0.0:
        sic = np.eye(15)
    else:
        M = cov + 1e-14 * np.eye(15)
        try:
            L = np.linalg.cholesky(M)
            Li = np.linalg.inv(L)
            Minv = Li.T @ Li
            sic = np.linalg.cholesky(Minv).T
        except np.linalg.LinAlgError:
            sic = np.eye(15)
    return t, q, p, v, cov, dq_dbg, dp_dbg, dp_dba, dv_dbg, dv_dba, sic


def integrate_full_batch(dts, ws, accs, bg, ba, cov_w, cov_a, cov_bg, cov_ba):
    """Batched full preintegration on host (f64): native C++ when available,
    NumPy fallback otherwise. Shapes: dts (F, N); ws/accs (F, N, 3);
    bg/ba (F, 3). Returns a dict with leading axis F (see
    native.preintegrate_batch)."""
    from rd_vio_tpu import native

    if native.available():
        return native.preintegrate_batch(
            dts, ws, accs, bg, ba, cov_w, cov_a, cov_bg, cov_ba
        )
    F = dts.shape[0]
    out = {
        "t": np.zeros(F), "q": np.zeros((F, 4)), "p": np.zeros((F, 3)),
        "v": np.zeros((F, 3)), "cov": np.zeros((F, 15, 15)),
        "dq_dbg": np.zeros((F, 3, 3)), "dp_dbg": np.zeros((F, 3, 3)),
        "dp_dba": np.zeros((F, 3, 3)), "dv_dbg": np.zeros((F, 3, 3)),
        "dv_dba": np.zeros((F, 3, 3)), "sqrt_inv_cov": np.zeros((F, 15, 15)),
    }
    for f in range(F):
        vals = _integrate_full_one(
            dts[f], ws[f], accs[f], bg[f], ba[f], cov_w, cov_a, cov_bg, cov_ba
        )
        for k, val in zip(
            ["t", "q", "p", "v", "cov", "dq_dbg", "dp_dbg", "dp_dba",
             "dv_dbg", "dv_dba", "sqrt_inv_cov"], vals
        ):
            out[k][f] = val
    return out
