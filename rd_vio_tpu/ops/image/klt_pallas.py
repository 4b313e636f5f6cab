"""Pallas TPU kernel for single-level Lucas-Kanade keypoint refinement.

The hot inner loop of the KLT tracker (SURVEY.md §2 L5 / BASELINE.json
"KLT patch-correlation at speed-of-light"): per keypoint, gather a 21x21
patch + gradients from the previous image, then iterate the 2x2 LK update
against the next image.

Design (v1): both pyramid-level images and their gradients stay VMEM-resident
for the whole grid (constant index_map -> no re-DMA per keypoint program);
each grid step refines one keypoint with dynamic-sliced 22x22 windows and
closed-form 2x2 solves. The multi-level wrapper composes this kernel
coarse-to-fine like ops/image/klt.py. Falls back to interpret mode off-TPU.

A follow-up optimization is to block keypoints (8-16 per program) and
double-buffer HBM patch DMA for images larger than VMEM; at EuRoC size
(752x480 f32 = 1.4 MB/plane) whole-plane residency is the faster layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALF = 10
WIN = 2 * HALF + 1  # 21
PAD = WIN + 1  # 22 window so bilinear needs no extra fetch


def _bilinear_patch(win, ax, ay):
    """Interpolate a (WIN, WIN) patch at fractional offset (ax, ay) from a
    (PAD, PAD) window."""
    w00 = (1 - ay) * (1 - ax)
    w01 = (1 - ay) * ax
    w10 = ay * (1 - ax)
    w11 = ay * ax
    return (
        w00 * win[:WIN, :WIN]
        + w01 * win[:WIN, 1:PAD]
        + w10 * win[1:PAD, :WIN]
        + w11 * win[1:PAD, 1:PAD]
    )


def _lk_kernel(iters: int, pts_ref, pred_ref, valid_ref, img1_ref, gx_ref,
               gy_ref, img2_ref, out_ref):
    i = pl.program_id(0)
    H, W = img1_ref.shape

    px = pts_ref[i, 0]
    py = pts_ref[i, 1]

    # integer corner + fractional offset of the template patch
    fx0 = jnp.floor(px - HALF)
    fy0 = jnp.floor(py - HALF)
    x0 = jnp.clip(fx0.astype(jnp.int32), 0, W - PAD)
    y0 = jnp.clip(fy0.astype(jnp.int32), 0, H - PAD)
    ax = px - HALF - x0.astype(px.dtype)
    ay = py - HALF - y0.astype(py.dtype)
    ax = jnp.clip(ax, 0.0, 1.0)
    ay = jnp.clip(ay, 0.0, 1.0)

    winI = img1_ref[pl.ds(y0, PAD), pl.ds(x0, PAD)]
    winGx = gx_ref[pl.ds(y0, PAD), pl.ds(x0, PAD)]
    winGy = gy_ref[pl.ds(y0, PAD), pl.ds(x0, PAD)]
    I = _bilinear_patch(winI, ax, ay)
    Ix = _bilinear_patch(winGx, ax, ay)
    Iy = _bilinear_patch(winGy, ax, ay)

    a = jnp.sum(Ix * Ix)
    b = jnp.sum(Ix * Iy)
    c = jnp.sum(Iy * Iy)
    det = a * c - b * b
    tr = a + c
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (WIN * WIN)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    gx_init = pred_ref[i, 0] - px
    gy_init = pred_ref[i, 1] - py

    def body(_, flow):
        fxx, fyy = flow
        qx = px + fxx - HALF
        qy = py + fyy - HALF
        qx0 = jnp.clip(jnp.floor(qx).astype(jnp.int32), 0, W - PAD)
        qy0 = jnp.clip(jnp.floor(qy).astype(jnp.int32), 0, H - PAD)
        bx = jnp.clip(qx - qx0.astype(qx.dtype), 0.0, 1.0)
        by = jnp.clip(qy - qy0.astype(qy.dtype), 0.0, 1.0)
        winJ = img2_ref[pl.ds(qy0, PAD), pl.ds(qx0, PAD)]
        J = _bilinear_patch(winJ, bx, by)
        r = I - J
        g1 = jnp.sum(Ix * r)
        g2 = jnp.sum(Iy * r)
        dx = inv_det * (c * g1 - b * g2)
        dy = inv_det * (a * g2 - b * g1)
        return (fxx + dx, fyy + dy)

    fx_fin, fy_fin = jax.lax.fori_loop(0, iters, body, (gx_init, gy_init))

    ok = valid_ref[i] & (min_eig > 1e-4)
    out_ref[i, 0] = px + fx_fin
    out_ref[i, 1] = py + fy_fin
    out_ref[i, 2] = min_eig
    out_ref[i, 3] = ok.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def lk_level_pallas(img_prev, gx, gy, img_next, pts, pred, valid,
                    iters: int = 30, interpret: bool = False):
    """One pyramid level for all keypoints. pts/pred: (N, 2) [x, y] f32.

    Returns (N, 4): tracked x, y, min_eig, ok."""
    n = pts.shape[0]
    return pl.pallas_call(
        functools.partial(_lk_kernel, iters),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=interpret,
    )(pts.astype(jnp.float32), pred.astype(jnp.float32), valid,
      img_prev.astype(jnp.float32), gx, gy, img_next.astype(jnp.float32))


def _auto_interpret(interpret):
    """None -> compiled on TPU, interpret elsewhere (CPU tests)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def lk_track_pyramid_pallas(pyr_prev, pyr_next, pts_prev, pts_pred, valid,
                            iters: int = 30, interpret: bool | None = False):
    """Multi-level pyramidal LK using the Pallas level kernel, mirroring
    ops/image/klt.py::lk_track_pyramid's interface."""
    from rd_vio_tpu.ops.image.klt import _grad

    interpret = _auto_interpret(interpret)
    levels = len(pyr_prev)
    H, W = pyr_prev[0].shape

    # Edge-pad every level by HALF+1 so any in-image point carries a fully
    # contained 22x22 window: the kernel clamps the window ORIGIN, which
    # decenters border patches and corrupts the coarse flow (amplified 2^L
    # at the base) — padding reproduces the XLA tracker's per-sample
    # border-replicate semantics at window granularity.
    B = HALF + 1
    pad = lambda a: jnp.pad(a, B, mode="edge")  # noqa: E731
    pyr_p = [pad(p) for p in pyr_prev]
    pyr_n = [pad(p) for p in pyr_next]
    grads = []
    for p in pyr_prev:
        gx, gy = _grad(p)
        grads.append((pad(gx), pad(gy)))

    used = [L for L in range(levels) if min(pyr_prev[L].shape) >= 1.5 * PAD]
    top = max(used)

    scale_top = 2.0**top
    pts = pts_prev.astype(jnp.float32)
    cur = pts / scale_top + (pts_pred.astype(jnp.float32) - pts) / scale_top

    min_eig = None
    for L in reversed(used):
        s = 2.0**L
        pl_pts = pts / s
        out = lk_level_pallas(
            pyr_p[L], grads[L][0], grads[L][1], pyr_n[L],
            pl_pts + B, cur + B, valid, iters=iters, interpret=interpret,
        )
        tracked = out[:, :2] - B
        min_eig = out[:, 2]
        if L > 0:
            cur = tracked * 2.0
        else:
            cur = tracked
    pts_next = cur
    disp = jnp.linalg.norm(pts_next - pts_prev, axis=-1)
    inb = (
        (pts_next[:, 0] >= HALF) & (pts_next[:, 0] < W - HALF)
        & (pts_next[:, 1] >= HALF) & (pts_next[:, 1] < H - HALF)
    )
    status = (
        valid & inb & jnp.isfinite(pts_next).all(axis=-1)
        & (disp < H / 4.0) & (min_eig > 1e-4)
    )
    return pts_next, status


def lk_reverse_check_pallas(pyr_prev, pyr_next, pts_prev, pts_next, status,
                            iters: int = 30, max_err: float = 0.5,
                            interpret: bool | None = False):
    """Reverse-flow consistency with the Pallas tracker (same semantics as
    ops/image/klt.py::lk_reverse_check / reference opencv_image.cpp:130-150)."""
    back, st_b = lk_track_pyramid_pallas(
        pyr_next, pyr_prev, pts_next, pts_prev, status,
        iters=iters, interpret=interpret,
    )
    err = jnp.linalg.norm(back - pts_prev, axis=-1)
    return status & st_b & (err <= max_err)
