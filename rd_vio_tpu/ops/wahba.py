"""Wahba / Kabsch rotation-only solver between bearing sets.

Behavioral reference: /root/reference/src/rdvio_geometry/include/rdvio/geometry/
wahba.h:8-27 (2-point SVD rotation solver: h(p2) = R h(p1)).

Generalized to N weighted correspondences so the same code serves the minimal
2-point RANSAC model and a weighted refit; batches over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_rotation(p1, p2, weights=None):
    """Best rotation R with p2 ≈ R p1 in the least-squares (Wahba) sense.

    p1, p2: (..., N, 3) unit bearings. weights: optional (..., N).
    Returns R: (..., 3, 3).
    """
    if weights is not None:
        p1w = p1 * weights[..., None]
    else:
        p1w = p1
    # cov = sum_i p1_i p2_i^T  (note order matches reference wahba.h:11-14)
    cov = jnp.einsum("...ni,...nj->...ij", p1w, p2)
    U, _, Vt = jnp.linalg.svd(cov)
    V = jnp.swapaxes(Vt, -1, -2)
    det = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    D = jnp.ones(p1.shape[:-2] + (3,), dtype=p1.dtype)
    D = D.at[..., 2].set(jnp.where(det >= 0.0, 1.0, -1.0))
    return (V * D[..., None, :]) @ jnp.swapaxes(U, -1, -2)


def rotation_angular_error(R, p1, p2):
    """Angle (radians) between R p1 and p2 per correspondence.

    Used for the rotation-RANSAC inlier test and the pure-rotation detector's
    misalignment percentile (reference frame.cpp:115-131)."""
    Rp1 = jnp.einsum("...ij,...nj->...ni", R, p1)
    cosang = jnp.clip(jnp.sum(Rp1 * p2, axis=-1), -1.0, 1.0)
    return jnp.arccos(cosang)
