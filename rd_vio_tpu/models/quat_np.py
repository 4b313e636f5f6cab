"""Tiny NumPy quaternion helpers (wxyz, Hamilton) for host bookkeeping.

Device math uses rd_vio_tpu.ops.lie; these mirror it for the host-side map
model where tensorizing would be overkill.
"""

from __future__ import annotations

import numpy as np


def qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def qconj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def _cross3(a, b):
    """Explicit 3-vector cross product: np.cross's moveaxis/broadcast
    machinery costs ~5x the arithmetic for the small arrays used here
    (round-3 host-path profile)."""
    a = np.asarray(a)
    b = np.asarray(b)
    return np.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def qrot(q, v):
    qv = np.asarray(q[1:])
    t = 2.0 * _cross3(qv, v)
    return np.asarray(v) + q[0] * t + _cross3(qv, t)


def qnorm(q):
    return q / np.linalg.norm(q)


def q_to_R(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def R_to_q(R):
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()
    return np.array([q[3], q[0], q[1], q[2]])


def q_from_two_vectors(a, b):
    """Quaternion rotating a onto b (Eigen FromTwoVectors semantics)."""
    a = np.asarray(a) / np.linalg.norm(a)
    b = np.asarray(b) / np.linalg.norm(b)
    c = np.cross(a, b)
    d = float(np.dot(a, b))
    if d < -1.0 + 1e-12:
        # opposite: rotate pi about any orthogonal axis
        axis = np.cross(a, [1.0, 0, 0])
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross(a, [0, 1.0, 0])
        axis /= np.linalg.norm(axis)
        return np.array([0.0, *axis])
    s = np.sqrt(2.0 * (1.0 + d))
    q = np.array([s / 2.0, *(c / s)])
    return q / np.linalg.norm(q)
