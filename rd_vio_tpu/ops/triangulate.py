"""DLT triangulation, 2-view and masked N-view, batch-friendly.

Behavioral reference: /root/reference/src/rdvio_geometry/include/rdvio/geometry/
stereo.h:71-95 (SVD-based DLT) and src/rdvio_map/src/track.cpp:46-76
(N-view triangulation + cheirality check).

TPU-first design notes: the homogeneous least-squares problem min |A h|, |h|=1
is solved via the symmetric eigendecomposition of the 4x4 normal matrix A^T A
(batched `eigh` maps well to XLA; avoids tall-skinny SVD). Rows are weighted by
a validity mask so fixed-capacity observation arrays triangulate without
dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from rd_vio_tpu.ops.lie import quat_to_matrix, s2_tangential_basis


def _smallest_eigvec(M):
    """Eigenvector of the smallest eigenvalue of symmetric M (..., n, n)."""
    w, v = jnp.linalg.eigh(M)  # ascending eigenvalues
    return v[..., :, 0]


def triangulate_homogeneous(bearings, q_cw, p_cw, mask=None):
    """Triangulate one world point from N camera views.

    Args:
      bearings: (N, 3) unit bearings in each camera frame.
      q_cw: (N, 4) world-to-camera rotations (x_c = R(q_cw) x_w + p_cw).
      p_cw: (N, 3) world-to-camera translations.
      mask: optional (N,) row validity.

    Returns:
      (point_w (3,), ok) where ok requires positive depth in every valid view.
    """
    R = quat_to_matrix(q_cw)  # (N, 3, 3)
    P = jnp.concatenate([R, p_cw[..., None]], axis=-1)  # (N, 3, 4)
    # Two tangent-plane constraint rows per view: s^T (R x + p) = 0.
    S = s2_tangential_basis(bearings)  # (N, 3, 2)
    rows = jnp.einsum("nij,nik->njk", S, P).reshape(-1, 4)  # (2N, 4)
    if mask is not None:
        rows = rows * mask.astype(rows.dtype).repeat(2)[:, None]
    M = rows.T @ rows
    h = _smallest_eigvec(M)
    w = h[3]
    # guard near-zero homogeneous scale
    point = h[:3] / jnp.where(jnp.abs(w) < 1e-12, jnp.sign(w) * 1e-12 + 1e-15, w)
    depths = jnp.einsum("nij,j->ni", R, point)[..., 2] + p_cw[..., 2]
    valid = mask.astype(bool) if mask is not None else jnp.ones(bearings.shape[0], bool)
    n_valid = jnp.sum(valid)
    ok = jnp.all(jnp.where(valid, depths > 0, True)) & (n_valid >= 2) & jnp.isfinite(point).all()
    return point, ok


def triangulate_two_view(b1, b2, q_cw1, p_cw1, q_cw2, p_cw2):
    """Two-view DLT (reference stereo.h:71-83). Batched over leading dims of b1/b2
    with shared poses.

    b1, b2: (..., 3) bearings; poses world-to-camera.
    Returns (point_w (..., 3), ok (...,)).
    """
    R1, R2 = quat_to_matrix(q_cw1), quat_to_matrix(q_cw2)
    P1 = jnp.concatenate([R1, p_cw1[..., None]], axis=-1)  # (3, 4)
    P2 = jnp.concatenate([R2, p_cw2[..., None]], axis=-1)
    S1 = s2_tangential_basis(b1)  # (..., 3, 2)
    S2 = s2_tangential_basis(b2)
    r1 = jnp.einsum("...ij,ik->...jk", S1, P1)  # (..., 2, 4)
    r2 = jnp.einsum("...ij,ik->...jk", S2, P2)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 4, 4)
    M = jnp.swapaxes(A, -1, -2) @ A
    h = _smallest_eigvec(M)
    w = h[..., 3:4]
    point = h[..., :3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    z1 = jnp.einsum("ij,...j->...i", R1, point)[..., 2] + p_cw1[2]
    z2 = jnp.einsum("ij,...j->...i", R2, point)[..., 2] + p_cw2[2]
    ok = (z1 > 0) & (z2 > 0) & jnp.isfinite(point).all(axis=-1)
    return point, ok
