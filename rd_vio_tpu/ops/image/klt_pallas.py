"""Pallas TPU kernel for pyramidal Lucas-Kanade keypoint tracking.

The hot inner loop of the KLT tracker (SURVEY.md §2 L5 / BASELINE.json
"KLT patch-correlation at speed-of-light"): per keypoint, a 21x21 template
patch + gradients iterated against the next image.

Design (v3 — round 3; replaces the one-keypoint-per-program v1, which
failed Mosaic lowering on real TPU hardware): the *windowed* formulation
shared with the XLA tracker (ops/image/klt.py). Per pyramid level:

  - window extraction + template/gradient/normal-matrix setup runs ONCE in
    XLA (`klt.prepare_level` — a single batched gather; identical math for
    both backends);
  - the Pallas kernel owns the LK iteration loop: grid over BLOCKs of
    keypoints, per keypoint a `lax.while_loop` with scalar carries and an
    eps step exit (true per-keypoint early termination — no lockstep
    straggler cost). Each step materializes the bilinear resample as
    `Wy @ S2 @ Wx^T` where the (WIN, SW) blend matrices are built from
    broadcasted-iota comparisons — static shapes, MXU matmuls, NO dynamic
    slicing (this Mosaic version cannot prove alignment of dynamic VMEM
    slices: "cannot statically prove that index ... is a multiple of 8");
  - search windows / templates ride in VMEM blocks; scalars (flow seeds,
    window origins, normal-matrix entries, valid) ride in SMEM; outputs are
    scalar SMEM stores.

Falls back to interpret mode off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rd_vio_tpu.ops.image.klt import HALF, PADB, SW, WIN, prepare_level

BLOCK = 8  # keypoints per program


def _imap2(i):
    # index maps must return uniformly-typed int32: this package enables
    # jax_enable_x64, under which a literal 0 traces as int64 and Mosaic
    # rejects the mixed (i32, i64) index-map signature
    # ("failed to legalize operation 'func.return'")
    return i, jnp.int32(0)


def _imap3(i):
    return i, jnp.int32(0), jnp.int32(0)


def _blend_matrix_k(offset):
    """(WIN, SW) bilinear row-selection matrix from a scalar offset
    (in-kernel version of klt._blend_matrix)."""
    i = jnp.clip(jnp.floor(offset), 0.0, float(SW - WIN - 1))
    f = jnp.clip(offset - i, 0.0, 1.0)
    ii = i.astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (WIN, SW), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (WIN, SW), 0)
    d = col - row - ii
    return jnp.where(d == 0, 1.0 - f, 0.0) + jnp.where(d == 1, f, 0.0)


def _lk_iter_kernel(iters: int, eps: float,
                    sc_ref, s2_ref, i_ref, ix_ref, iy_ref, out_ref):
    """LK iterations for one BLOCK of keypoints.

    sc_ref: SMEM (BLOCK, 10) f32 rows
        [px, py, f0x, f0y, oy2, ox2, a, b, c, inv_det]  (valid via inv_det=0)
    s2_ref: VMEM (BLOCK, SW, SW) search windows (next image)
    i/ix/iy_ref: VMEM (BLOCK, WIN, WIN) template patch + gradients
    out_ref: SMEM (BLOCK, 2) tracked [x, y] (padded coords)."""
    f32 = jnp.float32
    eps2 = eps * eps

    for b in range(BLOCK):
        px = sc_ref[b, 0]
        py = sc_ref[b, 1]
        f0x = sc_ref[b, 2]
        f0y = sc_ref[b, 3]
        oy2 = sc_ref[b, 4]
        ox2 = sc_ref[b, 5]
        a = sc_ref[b, 6]
        bb = sc_ref[b, 7]
        c = sc_ref[b, 8]
        inv_det = sc_ref[b, 9]

        S2 = s2_ref[b]
        I = i_ref[b]
        Ix = ix_ref[b]
        Iy = iy_ref[b]

        def body(carry):
            it, flx, fly, _ = carry
            uy = py + fly - HALF - oy2
            ux = px + flx - HALF - ox2
            Wy = _blend_matrix_k(uy)
            Wx = _blend_matrix_k(ux)
            JS = jnp.dot(Wy, S2, preferred_element_type=f32)  # (WIN, SW)
            J = jnp.dot(JS, Wx.T, preferred_element_type=f32)  # (WIN, WIN)
            r = I - J
            g1 = jnp.sum(Ix * r)
            g2 = jnp.sum(Iy * r)
            dx = inv_det * (c * g1 - bb * g2)
            dy = inv_det * (a * g2 - bb * g1)
            return (it + jnp.int32(1), flx + dx, fly + dy,
                    dx * dx + dy * dy)

        def cond(carry):
            it, _, _, step2 = carry
            return (it < iters) & (step2 >= eps2)

        # invalid slots carry inv_det == 0 -> zero step -> exits after one
        # iteration; start active
        _, flx, fly, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), f0x, f0y, jnp.asarray(1e9, f32))
        )

        out_ref[b, 0] = px + flx
        out_ref[b, 1] = py + fly


@functools.partial(jax.jit, static_argnames=("iters", "eps", "interpret"))
def lk_level_pallas(img_prev_pad, img_next_pad, pts, guess, valid,
                    iters: int = 30, eps: float = 0.01,
                    interpret: bool = False):
    """One pyramid level for all keypoints.

    img_*_pad: PADB-edge-padded (H, W) f32 level images; pts/guess: (N, 2)
    [x, y] f32 in padded coords (N a multiple of BLOCK).

    Returns (N, 4): tracked x, y, min_eig, ok."""
    f32 = jnp.float32
    n = pts.shape[0]
    assert n % BLOCK == 0, n
    pts = pts.astype(f32)
    guess = guess.astype(f32)
    S2, I, Ix, Iy, a, b, c, inv_det, min_eig, oy2, ox2 = prepare_level(
        img_prev_pad.astype(f32), img_next_pad.astype(f32), pts, guess
    )
    # fold validity into inv_det: zero -> zero LK step -> immediate exit
    inv_det = jnp.where(valid, inv_det, 0.0)
    sc = jnp.stack(
        [pts[:, 0], pts[:, 1],
         guess[:, 0] - pts[:, 0], guess[:, 1] - pts[:, 1],
         oy2.astype(f32), ox2.astype(f32), a, b, c, inv_det],
        axis=-1,
    )

    grid = (n // BLOCK,)
    vmem = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM
    tracked = pl.pallas_call(
        functools.partial(_lk_iter_kernel, iters, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK, 10), _imap2, memory_space=smem),
            pl.BlockSpec((BLOCK, SW, SW), _imap3, memory_space=vmem),
            pl.BlockSpec((BLOCK, WIN, WIN), _imap3, memory_space=vmem),
            pl.BlockSpec((BLOCK, WIN, WIN), _imap3, memory_space=vmem),
            pl.BlockSpec((BLOCK, WIN, WIN), _imap3, memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((BLOCK, 2), _imap2, memory_space=smem),
        out_shape=jax.ShapeDtypeStruct((n, 2), f32),
        interpret=interpret,
    )(sc, S2, I, Ix, Iy)
    ok = valid & (min_eig > 1e-4)
    return jnp.concatenate(
        [tracked, min_eig[:, None], ok.astype(f32)[:, None]], axis=-1
    )


def _auto_interpret(interpret):
    """None -> compiled on TPU, interpret elsewhere (CPU tests)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.jit, static_argnames=("iters", "eps", "interpret"))
def lk_track_pyramid_pallas(pyr_prev, pyr_next, pts_prev, pts_pred, valid,
                            iters: int = 30, eps: float = 0.01,
                            interpret: bool | None = False):
    """Multi-level pyramidal LK using the Pallas level kernel, mirroring
    ops/image/klt.py::lk_track_pyramid's interface (windowed formulation,
    same rejection rules)."""
    interpret = _auto_interpret(interpret)
    f32 = jnp.float32
    levels = len(pyr_prev)
    H, W = pyr_prev[0].shape
    n = pts_prev.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK

    pad_img = lambda a: jnp.pad(a.astype(f32), PADB, mode="edge")  # noqa: E731
    pad_kp = lambda a: jnp.pad(a, ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1))  # noqa: E731

    pts = pad_kp(pts_prev.astype(f32))
    valid_p = pad_kp(valid)
    scale_top = 2.0 ** (levels - 1)
    guess = pts / scale_top + (pad_kp(pts_pred.astype(f32)) - pts) / scale_top

    min_eig = None
    for L in reversed(range(levels)):
        s = 2.0**L
        pl_pts = pts / s
        out = lk_level_pallas(
            pad_img(pyr_prev[L]), pad_img(pyr_next[L]),
            pl_pts + PADB, guess + PADB, valid_p,
            iters=iters, eps=eps, interpret=interpret,
        )
        tracked = out[:, :2] - PADB
        min_eig = out[:, 2]
        guess = tracked * 2.0 if L > 0 else tracked

    pts_next = guess[:n]
    min_eig = min_eig[:n]
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


@functools.partial(jax.jit, static_argnames=("iters", "max_err", "interpret"))
def lk_track_fwd_rev_pallas(
    pyr_prev, pyr_next, pts_prev, pts_pred, valid,
    iters: int = 30, max_err: float = 0.5, interpret: bool | None = False,
):
    """Forward track + reverse-flow check fused into ONE device program
    (mirror of klt.lk_track_fwd_rev)."""
    tracked, status = lk_track_pyramid_pallas(
        pyr_prev, pyr_next, pts_prev, pts_pred, valid,
        iters=iters, interpret=interpret,
    )
    back, st_b = lk_track_pyramid_pallas(
        pyr_next, pyr_prev, tracked, pts_prev, status,
        iters=iters, interpret=interpret,
    )
    err = jnp.linalg.norm(back - pts_prev, axis=-1)
    return tracked, status & st_b & (err <= max_err)
