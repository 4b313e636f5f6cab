"""Perspective-n-Point solvers (DLT-P6P + Gauss-Newton polish), batched.

Behavioral reference: /root/reference/src/rdvio_geometry/include/rdvio/geometry/
pnp.h (solve_pnp_6pt at pnp.h:24,63 delegates to OpenCV EPnP; wrappers
find_pnp_matrix* at pnp.h:96-203).

TPU-first deviation (SURVEY.md §7 hard part (b)): OpenCV's EPnP is replaced by
a DLT P6P (12-dim homogeneous least squares via eigh of the 12x12 normal
matrix, nearest-rotation extraction by SVD) followed by a fixed-iteration
Gauss-Newton refinement on SO(3)xR^3 — deterministic, batched over hypothesis
banks, eigh/SVD only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops.lie import expmap, hat, quat_rotate, quat_mul, matrix_to_quat


def solve_pnp_dlt(x_world, p_norm):
    """DLT PnP from N>=6 points. x_world: (..., N, 3), p_norm: (..., N, 2).

    Returns (R_cw, t_cw) with x_cam = R_cw x_world + t_cw.
    """
    X, Y, Z = x_world[..., 0], x_world[..., 1], x_world[..., 2]
    u, v = p_norm[..., 0], p_norm[..., 1]
    zero = jnp.zeros_like(X)
    one = jnp.ones_like(X)
    r1 = jnp.stack(
        [X, Y, Z, one, zero, zero, zero, zero, -u * X, -u * Y, -u * Z, -u],
        axis=-1,
    )
    r2 = jnp.stack(
        [zero, zero, zero, zero, X, Y, Z, one, -v * X, -v * Y, -v * Z, -v],
        axis=-1,
    )
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2N, 12)
    M = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(M)
    p = vecs[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    Rraw = P[..., :, :3]
    traw = P[..., :, 3]
    # scale and sign: mean projected depth must be positive
    U, S, Vt = jnp.linalg.svd(Rraw)
    scale = jnp.mean(S, axis=-1)
    R = U @ Vt
    detR = jnp.linalg.det(R)
    R = R * detR[..., None, None]
    sign_fix = detR  # +-1
    t = traw * (sign_fix / jnp.maximum(scale, 1e-12))[..., None]
    depths = jnp.einsum("...ij,...nj->...ni", R, x_world)[..., 2] + t[..., None, 2]
    flip = jnp.mean(depths, axis=-1) < 0
    R = jnp.where(flip[..., None, None], -R, R)
    # note: flipping all of P changes det(R); re-orthogonalize sign via det
    detR = jnp.linalg.det(R)
    R = R * detR[..., None, None]
    t = jnp.where(flip[..., None], -t, t) * detR[..., None]
    return R, t


def refine_pnp(R_cw, t_cw, x_world, p_norm, weights=None, iters: int = 5):
    """Fixed-iteration Gauss-Newton on SO(3)xR^3 minimizing reprojection error.

    Batched over leading dims of R_cw/t_cw (points may broadcast).
    """
    q0 = matrix_to_quat(R_cw)

    def step(_, qt):
        q, t = qt
        x_cam = quat_rotate(q[..., None, :], x_world) + t[..., None, :]
        z = jnp.maximum(x_cam[..., 2:3], 1e-6)
        pred = x_cam[..., :2] / z
        r = pred - p_norm  # (..., N, 2)
        # d pred / d x_cam
        iz = 1.0 / z[..., 0]
        Jp = jnp.stack(
            [
                jnp.stack([iz, jnp.zeros_like(iz), -pred[..., 0] * iz], axis=-1),
                jnp.stack([jnp.zeros_like(iz), iz, -pred[..., 1] * iz], axis=-1),
            ],
            axis=-2,
        )  # (..., N, 2, 3)
        # d x_cam / d (dtheta, dt): x_cam = exp(dtheta) R x + t + dt
        # => d/d dtheta = -hat(R x) evaluated at x_cam - t... use -hat(Rx)
        Rx = x_cam - t[..., None, :]
        JR = -hat(Rx)  # (..., N, 3, 3) wrt left-perturbation of rotation
        Jt = jnp.broadcast_to(
            jnp.eye(3, dtype=x_world.dtype), JR.shape
        )
        Jx = jnp.concatenate([JR, Jt], axis=-1)  # (..., N, 3, 6)
        J = Jp @ Jx  # (..., N, 2, 6)
        if weights is not None:
            wgt = weights[..., None, None]
            Jw = J * wgt
            rw = r[..., None] * wgt
        else:
            Jw = J
            rw = r[..., None]
        Jf = Jw.reshape(Jw.shape[:-3] + (-1, 6))
        rf = rw.reshape(rw.shape[:-3] + (-1, 1))
        H = jnp.swapaxes(Jf, -1, -2) @ Jf + 1e-9 * jnp.eye(6, dtype=Jf.dtype)
        g = jnp.swapaxes(Jf, -1, -2) @ rf
        delta = -_cho_solve(H, g)[..., 0]  # Cholesky-based: LU is f32-only on TPU
        dq = expmap(delta[..., :3])
        q_new = quat_mul(dq, q)
        t_new = t + delta[..., 3:]
        return q_new, t_new

    q, t = jax.lax.fori_loop(0, iters, step, (q0, t_cw))
    from rd_vio_tpu.ops.lie import quat_to_matrix

    return quat_to_matrix(q), t


def _cho_solve(H, g):
    L = jnp.linalg.cholesky(H)
    y = jax.scipy.linalg.solve_triangular(L, g, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )


def pnp_reprojection_error(R_cw, t_cw, x_world, p_norm):
    """Squared normalized-plane reprojection error per point; points behind the
    camera are given an infinite error so they can never count as inliers."""
    x_cam = jnp.einsum("...ij,...nj->...ni", R_cw, x_world) + t_cw[..., None, :]
    z = x_cam[..., 2]
    pred = x_cam[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-12, 1e-12, z[..., None])
    err = jnp.sum((pred - p_norm) ** 2, axis=-1)
    return jnp.where(z > 1e-6, err, jnp.inf)
