"""Pyramidal Lucas-Kanade keypoint tracking, batched over keypoints.

Behavioral reference: cv::calcOpticalFlowPyrLK as used by
/root/reference/src/rdvio_extra/src/opencv_image.cpp:75-154 — 21x21 window,
3 pyramid levels, 30 iterations (epsilon 0.01 termination), initial-flow
seeding, border and max-displacement (rows/4) rejection, and the
reverse-flow check (backtrack error > 0.5 px => reject).

TPU-first design (round 3 — "windowed" form): per pyramid level each
keypoint's search window (SW x SW around the initial guess) is extracted
ONCE with a single batched dynamic-slice, after which every LK iteration is
pure batched linear algebra — the bilinear patch resample J is a separable
two-sided matmul `Wy @ S @ Wx^T` with 2-nonzero-per-row weight matrices
built from iota comparisons. No gathers inside the iteration loop, static
shapes throughout, and a `lax.while_loop` epsilon exit (all-converged) so
the typical IMU-predicted track costs ~5 iterations instead of 30.

The flow update per level is implicitly clamped to ±(MARGIN+1) px around the
initial guess (the window edge); larger true motions fail the displacement /
reverse-flow checks exactly like OpenCV tracks that leave the search range.

The previous per-sample gather formulation is kept as
`lk_track_pyramid_gather` for A/B benchmarking (scripts/bench_klt.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HALF = 10  # 21x21 window
WIN = 2 * HALF + 1  # 21
EXT = WIN + 2  # template + 1px ring for central-difference gradients
MARGIN = 8  # per-level search slack around the initial guess (px)
SW = EXT + 1 + 2 * MARGIN  # 40: search window side (+1 for bilinear)
PADB = HALF + 2 + MARGIN  # edge padding so in-image windows never clamp


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


# ---------------------------------------------------------------------------
# windowed matmul form (default)
# ---------------------------------------------------------------------------

def _blend_matrix(offset, rows: int):
    """(rows, SW) bilinear row-selection matrix: row r has (1-f) at i+r and
    f at i+r+1, where offset = i + f (i integer part clamped in-window)."""
    i = jnp.clip(jnp.floor(offset), 0.0, float(SW - rows - 1))
    f = jnp.clip(offset - i, 0.0, 1.0)
    ii = i.astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, SW), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, SW), 0)
    d = col - row - ii
    return jnp.where(d == 0, 1.0 - f, 0.0) + jnp.where(d == 1, f, 0.0)


def _extract_windows(img_pad, cy, cx):
    """Batched (SW, SW) window extraction from the PADB-edge-padded image.
    cy/cx: float center coords in padded frame. Returns (S, oy, ox)."""
    Hp, Wp = img_pad.shape
    oy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - (HALF + 1) - MARGIN,
                  0, Hp - SW)
    ox = jnp.clip(jnp.floor(cx).astype(jnp.int32) - (HALF + 1) - MARGIN,
                  0, Wp - SW)
    S = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(img_pad, (y, x), (SW, SW))
    )(oy, ox)
    return S, oy, ox


def prepare_level(img_prev_pad, img_next_pad, pts, guess):
    """Shared per-level setup for the windowed trackers (XLA and Pallas):
    search-window extraction, bilinear template + gradients, LK normal
    matrix. pts/guess: (N, 2) in padded-frame coords.

    Returns (S2, I, Ix, Iy, a, b, c, inv_det, min_eig, oy2, ox2)."""
    f32 = jnp.float32
    px, py = pts[:, 0], pts[:, 1]
    gx0, gy0 = guess[:, 0], guess[:, 1]

    S1, oy1, ox1 = _extract_windows(img_prev_pad, py, px)
    S2, oy2, ox2 = _extract_windows(img_next_pad, gy0, gx0)

    # template: EXT x EXT bilinear patch (one-px ring for gradients)
    ty = py - (HALF + 1) - oy1.astype(f32)
    tx = px - (HALF + 1) - ox1.astype(f32)
    Wy_t = jax.vmap(lambda o: _blend_matrix(o, EXT))(ty)
    Wx_t = jax.vmap(lambda o: _blend_matrix(o, EXT))(tx)
    I_ext = jnp.einsum("nrs,nst,nut->nru", Wy_t, S1, Wx_t,
                       preferred_element_type=f32)
    I = I_ext[:, 1:-1, 1:-1]
    Ix = 0.5 * (I_ext[:, 1:-1, 2:] - I_ext[:, 1:-1, :-2])
    Iy = 0.5 * (I_ext[:, 2:, 1:-1] - I_ext[:, :-2, 1:-1])

    a = jnp.sum(Ix * Ix, axis=(1, 2))
    b = jnp.sum(Ix * Iy, axis=(1, 2))
    c = jnp.sum(Iy * Iy, axis=(1, 2))
    det = a * c - b * b
    tr = a + c
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (
        WIN * WIN
    )
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    return S2, I, Ix, Iy, a, b, c, inv_det, min_eig, oy2, ox2


def _lk_level_windowed(img_prev_pad, img_next_pad, pts, guess, valid,
                       iters: int, eps: float):
    """One pyramid level for all keypoints (padded-frame coords).

    pts: (N, 2) template centers; guess: (N, 2) initial estimate of the
    tracked position. Returns (tracked (N, 2), min_eig (N,))."""
    f32 = jnp.float32
    px, py = pts[:, 0], pts[:, 1]
    S2, I, Ix, Iy, a, b, c, inv_det, min_eig, oy2, ox2 = prepare_level(
        img_prev_pad, img_next_pad, pts, guess
    )

    flow0 = guess - pts

    def body(carry):
        it, flow, active = carry
        qx = px + flow[:, 0]
        qy = py + flow[:, 1]
        uy = qy - HALF - oy2.astype(f32)
        ux = qx - HALF - ox2.astype(f32)
        Wy = jax.vmap(lambda o: _blend_matrix(o, WIN))(uy)
        Wx = jax.vmap(lambda o: _blend_matrix(o, WIN))(ux)
        J = jnp.einsum("nrs,nst,nut->nru", Wy, S2, Wx,
                       preferred_element_type=f32)
        r = I - J
        g1 = jnp.sum(Ix * r, axis=(1, 2))
        g2 = jnp.sum(Iy * r, axis=(1, 2))
        dx = inv_det * (c * g1 - b * g2)
        dy = inv_det * (a * g2 - b * g1)
        step = jnp.stack([dx, dy], axis=-1)
        flow = flow + jnp.where(active[:, None], step, 0.0)
        active = active & (jnp.sum(step * step, axis=-1) >= eps * eps)
        return it + 1, flow, active

    def cond(carry):
        it, _, active = carry
        return (it < iters) & jnp.any(active)

    _, flow, _ = jax.lax.while_loop(cond, body, (0, flow0, valid))
    tracked = pts + flow
    return tracked, min_eig


@functools.partial(
    jax.jit, static_argnames=("iters", "min_eig_thresh", "eps")
)
def lk_track_pyramid(
    pyr_prev, pyr_next, pts_prev, pts_pred, valid,
    iters: int = 30, min_eig_thresh: float = 1e-4, eps: float = 0.01,
):
    """Track pts_prev (N, 2 [x, y]) from pyr_prev to pyr_next.

    pyr_*: list of (H, W) f32 images, fine-to-coarse (from build_pyramid).
    pts_pred: initial guess for the tracked position (IMU-predicted flow).

    Returns (pts_next (N, 2), status (N,) bool). Border / max-displacement /
    min-eigenvalue / non-finite rejection included; the reverse-flow check is
    `lk_reverse_check`.
    """
    f32 = jnp.float32
    levels = len(pyr_prev)
    H, W = pyr_prev[0].shape
    # edge padding reproduces the clamped-bilinear border semantics while
    # keeping window extraction clamp-free for any in-image keypoint
    pad = lambda a: jnp.pad(a.astype(f32), PADB, mode="edge")  # noqa: E731

    pts = pts_prev.astype(f32)
    scale_top = 2.0 ** (levels - 1)
    guess = pts / scale_top + (pts_pred.astype(f32) - pts) / scale_top

    min_eig = None
    for L in reversed(range(levels)):
        s = 2.0**L
        pl_pts = pts / s
        tracked, min_eig = _lk_level_windowed(
            pad(pyr_prev[L]), pad(pyr_next[L]),
            pl_pts + PADB, guess + PADB, valid, iters, eps,
        )
        tracked = tracked - PADB
        guess = tracked * 2.0 if L > 0 else tracked

    pts_next = guess
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
        & (min_eig > min_eig_thresh)
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


@functools.partial(jax.jit, static_argnames=("iters", "max_err"))
def lk_track_fwd_rev(
    pyr_prev, pyr_next, pts_prev, pts_pred, valid,
    iters: int = 30, max_err: float = 0.5,
):
    """Forward track + reverse-flow check fused into ONE device program
    (one dispatch, one fetch per frame on latency-bound links)."""
    tracked, status = lk_track_pyramid(
        pyr_prev, pyr_next, pts_prev, pts_pred, valid, iters=iters
    )
    back, st_b = lk_track_pyramid(
        pyr_next, pyr_prev, tracked, pts_prev, status, iters=iters
    )
    err = jnp.linalg.norm(back - pts_prev, axis=-1)
    return tracked, status & st_b & (err <= max_err)


# ---------------------------------------------------------------------------
# legacy per-sample gather form (kept for A/B benchmarking)
# ---------------------------------------------------------------------------

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
def lk_track_pyramid_gather(
    pyr_prev, pyr_next, pts_prev, pts_pred, valid,
    iters: int = 30, min_eig_thresh: float = 1e-4,
):
    """Legacy formulation: vmapped per-sample bilinear gathers every
    iteration (round-1/2 default). Same rejection rules as the windowed
    tracker; no epsilon exit."""
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
        & (disp < H / 4.0)
        & (eigs > min_eig_thresh)
    )
    return pts_next, status
