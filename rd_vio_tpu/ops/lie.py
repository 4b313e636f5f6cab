"""SO(3)/quaternion Lie-group operations, batch-friendly.

Behavioral reference: /root/reference/src/rdvio_geometry (lie_algebra.h:1-28,
src/lie_algebra.cpp:5-54). Re-derived from standard Lie-group identities and
written as vectorizable jnp functions (every op maps over leading batch dims
via vmap or plain broadcasting); small-angle branches use jnp.where with
Taylor-series fallbacks rather than data-dependent control flow so everything
stays jit/vmap-compatible.

Conventions:
- Quaternions are Hamilton, stored wxyz as shape (..., 4); always unit-norm.
- ``quat_rotate(q, v)`` applies the rotation R(q) @ v.
- Poses (q, p) map body to world: x_w = R(q) x_b + p.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def hat(w):
    """Skew-symmetric matrix of w: hat(w) @ v == cross(w, v). (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(a, b):
    """Hamilton product a*b, wxyz. (..., 4), (..., 4) -> (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate v by q: R(q) @ v. (..., 4), (..., 3) -> (..., 3)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """(..., 3, 3) -> (..., 4) wxyz. Branch-free Shepperd-style selection."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions (unnormalized), one per dominant component
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    # dominant diagonal decides which candidate is numerically safe
    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4)
    scores = jnp.stack([c0, c1, c2, c3], axis=-1)  # (..., 4)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def expmap(w):
    """Axis-angle rotation vector -> unit quaternion (reference lie_algebra.cpp:13-21).

    (..., 3) -> (..., 4). Small angles use the 2nd-order Taylor series.
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-10
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([cw, sinc_half * w], axis=-1))


def logmap(q):
    """Unit quaternion -> rotation vector, |axis|*angle in (-pi, pi]. (..., 4) -> (..., 3)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(vn < 1e-10, 2.0 / jnp.maximum(w, 0.5), angle / jnp.maximum(vn, _EPS))
    return scale * q[..., 1:]


def right_jacobian(w):
    """Right Jacobian of SO(3) at rotation vector w (reference lie_algebra.cpp:23-44).

    Jr(w) = I - (1-cos t)/t^2 hat(w) + (t - sin t)/t^3 hat(w)^2.
    (..., 3) -> (..., 3, 3), Taylor fallback for small angles.
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-10
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - a * W + b * W2


def left_jacobian(w):
    """Left Jacobian of SO(3): Jl(w) = Jr(-w)."""
    return right_jacobian(-w)


def s2_tangential_basis(x):
    """Orthonormal basis of the tangent plane at unit vector x
    (reference lie_algebra.cpp:46-54). (..., 3) -> (..., 3, 2).

    Branch-free: pick the seed axis least aligned with x.
    """
    ax = jnp.abs(x)
    # one-hot of the smallest |component|
    idx = jnp.argmin(ax, axis=-1)
    seed = jnp.eye(3, dtype=x.dtype)[idx]
    b0 = jnp.cross(x, seed)
    b0 = b0 / jnp.linalg.norm(b0, axis=-1, keepdims=True)
    b1 = jnp.cross(x, b0)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    return jnp.stack([b0, b1], axis=-1)


def slerp(q0, q1, t):
    """Spherical linear interpolation between unit quaternions (used for IMU
    timestamp interpolation, reference handler.cpp:62-69)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    # fall back to lerp when nearly parallel
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)
