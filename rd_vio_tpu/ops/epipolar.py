"""Essential-matrix estimation and decomposition, batched for hypothesis banks.

Behavioral reference: /root/reference/src/rdvio_geometry/src/essential.cpp
(5-point Nistér solver + SVD decomposition, essential.cpp:9-283) and
essential.h:14-19 (geometric error).

TPU-first deviation (documented in SURVEY.md §2/§7 "hard parts"): the
reference's Nistér 5-point solver requires a 10x10 *nonsymmetric*
eigendecomposition, which XLA:TPU does not provide. We instead use the
normalized **8-point** linear solver (Hartley) as the minimal solver inside the
batched RANSAC — with hundreds of KLT tracks and the high inlier ratios of VIO
frontends the 8-point sample is the standard choice (cf. ORB-SLAM). The
hypothesis count of the batched RANSAC is raised accordingly (config
``ransac_hypotheses``). All solves are symmetric-eigh based so hypothesis banks
batch cleanly over the leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def _homog(p):
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def solve_essential_8pt(p1, p2):
    """Linear 8-point essential solver on normalized image points.

    Args:
      p1, p2: (..., N>=8, 2) normalized points with p2^T E p1 = 0.
    Returns:
      E: (..., 3, 3), projected onto the essential manifold (s, s, 0).
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )  # (..., N, 9)
    M = jnp.swapaxes(A, -1, -2) @ A  # (..., 9, 9)
    w, v = jnp.linalg.eigh(M)
    e = v[..., :, 0]
    E = e.reshape(e.shape[:-1] + (3, 3))
    # Project to the essential manifold (singular values (s, s, 0)) via eigh
    # of E^T E instead of SVD: sigma_i = sqrt(eigval_i), u_i = E v_i / sigma_i.
    # Equivalent to the SVD projection up to sign (E and -E are the same
    # epipolar constraint); XLA:TPU's batched f32 SVD miscompiles when fused
    # with upstream ops, and eigh is faster.
    lam, V = jnp.linalg.eigh(jnp.swapaxes(E, -1, -2) @ E)  # ascending
    v1 = V[..., :, 2]
    v2 = V[..., :, 1]
    s1 = jnp.sqrt(jnp.maximum(lam[..., 2], 0.0))
    s2 = jnp.sqrt(jnp.maximum(lam[..., 1], 0.0))
    eps = jnp.asarray(1e-20, E.dtype)
    u1 = jnp.einsum("...ij,...j->...i", E, v1) / jnp.maximum(s1, eps)[..., None]
    u2 = jnp.einsum("...ij,...j->...i", E, v2) / jnp.maximum(s2, eps)[..., None]
    s = 0.5 * (s1 + s2)
    return s[..., None, None] * (
        u1[..., :, None] * v1[..., None, :] + u2[..., :, None] * v2[..., None, :]
    )


def decompose_essential(E):
    """E -> two rotations + translation direction (reference essential.cpp:222-283).

    Returns (R1, R2, T) with the four candidate poses being
    (R1, T), (R1, -T), (R2, T), (R2, -T). Batched over leading dims.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    dU = jnp.linalg.det(U)
    dV = jnp.linalg.det(Vt)
    U = U * dU[..., None, None]
    Vt = Vt * dV[..., None, None]
    W = jnp.asarray([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    T = U[..., :, 2]
    return R1, R2, T


def essential_geometric_error(E, p1, p2):
    """Point-to-epipolar-line squared distance of p2 against E p1
    (reference essential.h:14-19). Batched: E (..., 3, 3), p1/p2 (..., N, 2)."""
    Ep1 = jnp.einsum("...ij,...nj->...ni", E, _homog(p1))
    r = jnp.sum(_homog(p2) * Ep1, axis=-1)
    denom = Ep1[..., 0] ** 2 + Ep1[..., 1] ** 2
    return r * r / jnp.maximum(denom, 1e-18)


def essential_geometric_error_sym(E, p1, p2):
    """Symmetric epipolar error: max of the two directed line distances
    (used by the tracker's epipolar check, reference
    sliding_window_tracker.cpp:469-500 computes both directions)."""
    e12 = essential_geometric_error(E, p1, p2)
    e21 = essential_geometric_error(jnp.swapaxes(E, -1, -2), p2, p1)
    return 0.5 * (e12 + e21)


def essential_from_pose(R_21, t_21):
    """E with p2^T E p1 = 0 for x_2 = R_21 x_1 + t_21: E = [t]x R."""
    tx, ty, tz = t_21[..., 0], t_21[..., 1], t_21[..., 2]
    z = jnp.zeros_like(tx)
    T_hat = jnp.stack(
        [
            jnp.stack([z, -tz, ty], axis=-1),
            jnp.stack([tz, z, -tx], axis=-1),
            jnp.stack([-ty, tx, z], axis=-1),
        ],
        axis=-2,
    )
    return T_hat @ R_21
