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
    w = q[0]
    u = q[1:]
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


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


def predict_frame_mean(q0, p0, v0, bg, ba, dts, ws, accs):
    """integrate_mean + predict_mean in one call; returns (q, p, v)."""
    t, dq, dp, dv = integrate_mean(dts, ws, accs, bg, ba)
    return predict_mean(t, dq, dp, dv, q0, p0, v0)
