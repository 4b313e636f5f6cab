"""Homography estimation (normalized 4-point DLT) and analytic decomposition.

Behavioral reference: /root/reference/src/rdvio_geometry/src/homography.cpp
(DLT at homography.cpp:100-157, Malis-Vargas analytic decomposition with
pure-rotation detection at homography.cpp:6-96, ||H^T H - I|| < 1e-3).

Batched, branch-free re-derivation: the three diagonal-dominance cases of the
decomposition are computed unconditionally and selected with jnp.where so a
whole hypothesis bank decomposes in one call.
"""

from __future__ import annotations

import jax.numpy as jnp


def _homog(p):
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def solve_homography_dlt(p1, p2, weights=None):
    """DLT homography from N>=4 correspondences, p2 ~ H p1.

    Hartley-normalized internally. p1, p2: (..., N, 2). Returns (..., 3, 3).
    """

    def normalize(p):
        mean = jnp.mean(p, axis=-2, keepdims=True)
        d = jnp.linalg.norm(p - mean, axis=-1, keepdims=True)
        scale = jnp.sqrt(jnp.asarray(2.0, p.dtype)) / jnp.maximum(
            jnp.mean(d, axis=-2, keepdims=True), 1e-12
        )
        pn = (p - mean) * scale
        s = scale[..., 0, 0]
        mx, my = mean[..., 0, 0], mean[..., 0, 1]
        zero = jnp.zeros_like(s)
        one = jnp.ones_like(s)
        T = jnp.stack(
            [
                jnp.stack([s, zero, -s * mx], axis=-1),
                jnp.stack([zero, s, -s * my], axis=-1),
                jnp.stack([zero, zero, one], axis=-1),
            ],
            axis=-2,
        )
        return pn, T

    p1n, T1 = normalize(p1)
    p2n, T2 = normalize(p2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    # rows for x2 * (h3 . p1) - (h1 . p1) = 0 and y2 * (h3 . p1) - (h2 . p1) = 0
    r1 = jnp.stack(
        [-x1, -y1, -one, zero, zero, zero, x2 * x1, x2 * y1, x2], axis=-1
    )
    r2 = jnp.stack(
        [zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], axis=-1
    )
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2N, 9)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=-1)[..., None]
        A = A * w
    M = jnp.swapaxes(A, -1, -2) @ A
    w_, v = jnp.linalg.eigh(M)
    h = v[..., :, 0]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # denormalize: H = T2^-1 Hn T1. T2 = [[s,0,-s mx],[0,s,-s my],[0,0,1]] has
    # the closed-form inverse below (avoids LU, which is f32-only on TPU).
    s = T2[..., 0, 0]
    mx = -T2[..., 0, 2] / s
    my = -T2[..., 1, 2] / s
    inv_s = 1.0 / s
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    T2_inv = jnp.stack(
        [
            jnp.stack([inv_s, zero, mx], axis=-1),
            jnp.stack([zero, inv_s, my], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    H = T2_inv @ Hn @ T1
    return H / H[..., 2:3, 2:3]


def homography_geometric_error(H, p1, p2):
    """Squared transfer error |p2 - pi(H p1)|^2 (reference homography.h:17-21)."""
    q = jnp.einsum("...ij,...nj->...ni", H, _homog(p1))
    qn = q[..., :2] / jnp.where(jnp.abs(q[..., 2:3]) < 1e-12, 1e-12, q[..., 2:3])
    return jnp.sum((p2 - qn) ** 2, axis=-1)


def decompose_homography(H):
    """Malis-Vargas analytic decomposition (reference homography.cpp:6-96).

    Returns (R1, R2, T1, T2, n1, n2, is_pure_rotation). When pure rotation is
    detected (||Hn^T Hn - I||_max <= 1e-3 after scaling by the middle singular
    value) the two rotations equal the orthogonal polar factor of H and
    T/n are zero — matching the reference's rotation-only branch.
    Batched over leading dims.
    """
    sv = jnp.linalg.svd(H, compute_uv=False)
    Hn = H / sv[..., 1:2][..., None]
    S = jnp.swapaxes(Hn, -1, -2) @ Hn - jnp.eye(3, dtype=H.dtype)
    pure_rot = jnp.max(jnp.abs(S), axis=(-2, -1)) <= 1e-3

    # --- pure-rotation branch: nearest rotation by SVD polar factor ---
    U, _, Vt = jnp.linalg.svd(H)
    Rrot = U @ Vt
    Rrot = jnp.where(
        jnp.linalg.det(Rrot)[..., None, None] < 0, -Rrot, Rrot
    )

    # --- general branch (computed unconditionally; guarded sqrt args) ---
    s00, s01, s02 = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    s11, s12, s22 = S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]
    # opposite minors M_S(i,i) of S and their square roots
    Ms00 = s12 * s12 - s11 * s22
    Ms11 = s02 * s02 - s00 * s22
    Ms22 = s01 * s01 - s00 * s11
    m00 = jnp.sqrt(jnp.maximum(Ms00, 0.0))
    m11 = jnp.sqrt(jnp.maximum(Ms11, 0.0))
    m22 = jnp.sqrt(jnp.maximum(Ms22, 0.0))
    tr = s00 + s11 + s22
    nu = 2.0 * jnp.sqrt(jnp.maximum(1.0 + tr - (Ms00 + Ms11 + Ms22), 0.0))
    te2 = 2.0 + tr - nu

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) < 1e-12, jnp.where(b < 0, -1e-12, 1e-12), b)

    sgn = lambda x: jnp.where(x < 0, -1.0, 1.0)

    # case A: s00 dominant
    eA = sgn(s01 * s02 - s00 * s12)
    n1A = jnp.stack([s00, s01 + m22, s02 + eA * m11], axis=-1)
    n2A = jnp.stack([s00, s01 - m22, s02 - eA * m11], axis=-1)
    t1A = safe_div(jnp.linalg.norm(n1A, axis=-1, keepdims=True) * n2A, s00[..., None])
    t2A = safe_div(jnp.linalg.norm(n2A, axis=-1, keepdims=True) * n1A, s00[..., None])
    # case B: s11 dominant
    eB = sgn(s11 * s02 - s01 * s12)
    n1B = jnp.stack([s01 + m22, s11, s12 - eB * m00], axis=-1)
    n2B = jnp.stack([s01 - m22, s11, s12 + eB * m00], axis=-1)
    t1B = safe_div(jnp.linalg.norm(n1B, axis=-1, keepdims=True) * n2B, s11[..., None])
    t2B = safe_div(jnp.linalg.norm(n2B, axis=-1, keepdims=True) * n1B, s11[..., None])
    # case C: s22 dominant
    eC = sgn(s12 * s02 - s01 * s22)
    n1C = jnp.stack([s02 + eC * m11, s12 + m00, s22], axis=-1)
    n2C = jnp.stack([s02 - eC * m11, s12 - m00, s22], axis=-1)
    t1C = safe_div(jnp.linalg.norm(n1C, axis=-1, keepdims=True) * n2C, s22[..., None])
    t2C = safe_div(jnp.linalg.norm(n2C, axis=-1, keepdims=True) * n1C, s22[..., None])

    caseA = ((s00 > s11) & (s00 > s22))[..., None]
    caseB = ((s11 > s00) & (s11 > s22))[..., None] & ~caseA
    n1 = jnp.where(caseA, n1A, jnp.where(caseB, n1B, n1C))
    n2 = jnp.where(caseA, n2A, jnp.where(caseB, n2B, n2C))
    ts1 = jnp.where(caseA, t1A, jnp.where(caseB, t1B, t1C))
    ts2 = jnp.where(caseA, t2A, jnp.where(caseB, t2B, t2C))

    n1 = n1 / jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), 1e-12)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-12)
    ts1 = ts1 - te2[..., None] * n1
    ts2 = ts2 - te2[..., None] * n2
    inv_nu = safe_div(jnp.ones_like(nu), nu)[..., None, None]
    eye = jnp.eye(3, dtype=H.dtype)
    R1 = Hn @ (eye - inv_nu * ts1[..., :, None] * n1[..., None, :])
    R2 = Hn @ (eye - inv_nu * ts2[..., :, None] * n2[..., None, :])
    T1 = jnp.einsum("...ij,...j->...i", R1, 0.5 * ts1)
    T2 = jnp.einsum("...ij,...j->...i", R2, 0.5 * ts2)

    pr = pure_rot[..., None, None]
    R1 = jnp.where(pr, Rrot, R1)
    R2 = jnp.where(pr, Rrot, R2)
    zero3 = jnp.zeros_like(T1)
    T1 = jnp.where(pure_rot[..., None], zero3, T1)
    T2 = jnp.where(pure_rot[..., None], zero3, T2)
    n1 = jnp.where(pure_rot[..., None], zero3, n1)
    n2 = jnp.where(pure_rot[..., None], zero3, n2)
    return R1, R2, T1, T2, n1, n2, pure_rot
