"""Pyramidal Lucas-Kanade keypoint tracking, batched over keypoints.

Behavioral reference: cv::calcOpticalFlowPyrLK as used by
/root/reference/src/rdvio_extra/src/opencv_image.cpp:75-154 — 21x21 window,
3 pyramid levels, 30 iterations, initial-flow seeding, border and
max-displacement (rows/4) rejection, and the reverse-flow check (backtrack
error > 0.5 px => reject).

TPU-first: every keypoint's patch gather/iteration runs as one vmapped program
over [N] keypoints x fixed 21x21 windows; pyramid levels are a Python loop
(static). The 2x2 normal system is solved in closed form. A Pallas variant
can later fuse the patch gathers; the XLA gather version is already batched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HALF = 10  # 21x21 window


def _sample_bilinear(img, ys, xs):
    """Bilinear sample img (H, W) at float coords; clamps to valid range."""
    H, W = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x0i + 1]
    v10 = img[y0i + 1, x0i]
    v11 = img[y0i + 1, x0i + 1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _grad(img):
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def _lk_level(img_prev, gx, gy, img_next, pt_prev, flow, iters: int):
    """One pyramid level for one keypoint. pt_prev: (2,) [x, y] at this level;
    flow: (2,) current estimate of (next - prev). Returns (flow, min_eig)."""
    dy, dx = jnp.meshgrid(
        jnp.arange(-HALF, HALF + 1, dtype=img_prev.dtype),
        jnp.arange(-HALF, HALF + 1, dtype=img_prev.dtype),
        indexing="ij",
    )
    ys0 = pt_prev[1] + dy
    xs0 = pt_prev[0] + dx
    I = _sample_bilinear(img_prev, ys0, xs0)
    Ix = _sample_bilinear(gx, ys0, xs0)
    Iy = _sample_bilinear(gy, ys0, xs0)
    a = jnp.sum(Ix * Ix)
    b = jnp.sum(Ix * Iy)
    c = jnp.sum(Iy * Iy)
    det = a * c - b * b
    tr = a + c
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (
        (2 * HALF + 1) ** 2
    )
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    def body(_, fl):
        ys = pt_prev[1] + fl[1] + dy
        xs = pt_prev[0] + fl[0] + dx
        J = _sample_bilinear(img_next, ys, xs)
        r = I - J
        b1 = jnp.sum(Ix * r)
        b2 = jnp.sum(Iy * r)
        dxy = inv_det * jnp.stack([c * b1 - b * b2, a * b2 - b * b1])
        return fl + dxy

    flow = jax.lax.fori_loop(0, iters, body, flow)
    return flow, min_eig


@functools.partial(jax.jit, static_argnames=("iters", "min_eig_thresh"))
def lk_track_pyramid(
    pyr_prev, pyr_next, pts_prev, pts_pred, valid,
    iters: int = 30, min_eig_thresh: float = 1e-4,
):
    """Track pts_prev (N, 2 [x, y]) from pyr_prev to pyr_next.

    pyr_*: list of (H, W) f32 images, fine-to-coarse (from build_pyramid).
    pts_pred: initial guess for the tracked position (IMU-predicted flow).

    Returns (pts_next (N, 2), status (N,) bool). Border / max-displacement /
    min-eigenvalue / non-finite rejection included; the reverse-flow check is
    `lk_reverse_check`.
    """
    levels = len(pyr_prev)
    H, W = pyr_prev[0].shape
    grads = [_grad(p) for p in pyr_prev]

    scale_top = 2.0 ** (levels - 1)
    flow0 = (pts_pred - pts_prev) / scale_top

    def track_one(pt, fl0):
        fl = fl0
        eig = jnp.asarray(jnp.inf, pyr_prev[0].dtype)
        for L in reversed(range(levels)):
            s = 2.0**L
            fl = fl * (2.0 if L != levels - 1 else 1.0)
            fl, eig_l = _lk_level(
                pyr_prev[L], grads[L][0], grads[L][1], pyr_next[L],
                pt / s, fl, iters,
            )
            eig = jnp.minimum(eig, eig_l) if L == 0 else eig
        return pt + fl, eig

    pts_next, eigs = jax.vmap(track_one)(
        pts_prev.astype(jnp.float32), flow0.astype(jnp.float32)
    )

    disp = jnp.linalg.norm(pts_next - pts_prev, axis=-1)
    inb = (
        (pts_next[:, 0] >= HALF) & (pts_next[:, 0] < W - HALF)
        & (pts_next[:, 1] >= HALF) & (pts_next[:, 1] < H - HALF)
    )
    status = (
        valid
        & inb
        & jnp.isfinite(pts_next).all(axis=-1)
        & (disp < H / 4.0)  # reference opencv_image.cpp max displacement rows/4
        & (eigs > min_eig_thresh)
    )
    return pts_next, status


@functools.partial(jax.jit, static_argnames=("iters", "max_err"))
def lk_reverse_check(
    pyr_prev, pyr_next, pts_prev, pts_next, status,
    iters: int = 30, max_err: float = 0.5,
):
    """Reverse-flow consistency (reference opencv_image.cpp:130-150): track
    back from pts_next and require the backtrack lands within max_err px."""
    back, st_b = lk_track_pyramid(pyr_next, pyr_prev, pts_next, pts_prev, status, iters=iters)
    err = jnp.linalg.norm(back - pts_prev, axis=-1)
    return status & st_b & (err <= max_err)
