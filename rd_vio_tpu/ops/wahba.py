"""Wahba / Kabsch rotation-only solver between bearing sets.

Behavioral reference: /root/reference/src/rdvio_geometry/include/rdvio/geometry/
wahba.h:8-27 (2-point SVD rotation solver: h(p2) = R h(p1)).

Generalized to N weighted correspondences so the same code serves the minimal
2-point RANSAC model and a weighted refit; batches over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_R(q):
    """Rotation matrix of a scalar-first unit quaternion; v' = R v = q v q*.
    Batched over leading dims: q (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def solve_rotation(p1, p2, weights=None):
    """Best rotation R with p2 ≈ R p1 in the least-squares (Wahba) sense.

    p1, p2: (..., N, 3) unit bearings. weights: optional (..., N).
    Returns R: (..., 3, 3).

    Davenport q-method: the optimal quaternion is the top eigenvector of the
    symmetric 4x4 K matrix built from the attitude-profile matrix B — a
    symmetric eigh instead of the reference's SVD (wahba.h:11-14). Equivalent
    optimum; eigh batches cleanly on TPU (XLA:TPU's batched f32 SVD
    miscompiles when fused with upstream ops, and eigh is faster anyway).
    """
    if weights is not None:
        p1w = p1 * weights[..., None]
    else:
        p1w = p1
    # attitude profile B = sum_i p2_i p1_i^T  (b = p2 ≈ R r, r = p1)
    B = jnp.einsum("...ni,...nj->...ij", p2, p1w)
    sigma = jnp.trace(B, axis1=-2, axis2=-1)
    S = B + jnp.swapaxes(B, -1, -2)
    z = jnp.stack(
        [
            B[..., 1, 2] - B[..., 2, 1],
            B[..., 2, 0] - B[..., 0, 2],
            B[..., 0, 1] - B[..., 1, 0],
        ],
        axis=-1,
    )
    eye3 = jnp.eye(3, dtype=p1.dtype)
    K = jnp.concatenate(
        [
            jnp.concatenate([sigma[..., None, None], z[..., None, :]], axis=-1),
            jnp.concatenate(
                [z[..., :, None], S - sigma[..., None, None] * eye3], axis=-1
            ),
        ],
        axis=-2,
    )  # (..., 4, 4) symmetric
    _, vecs = jnp.linalg.eigh(K)
    q = vecs[..., :, -1]  # top eigenvector, scalar-first [w, xyz]
    # Davenport's K yields the attitude-matrix (conjugate) convention;
    # negate the vector part to get R with p2 = R p1 = q p1 q*.
    q = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return quat_to_R(q)


def rotation_angular_error(R, p1, p2):
    """Angle (radians) between R p1 and p2 per correspondence.

    Used for the rotation-RANSAC inlier test and the pure-rotation detector's
    misalignment percentile (reference frame.cpp:115-131)."""
    Rp1 = jnp.einsum("...ij,...nj->...ni", R, p1)
    cosang = jnp.clip(jnp.sum(Rp1 * p2, axis=-1), -1.0, 1.0)
    return jnp.arccos(cosang)
