"""Fused per-frame frontend device program.

One jitted call per camera frame covering everything the feature tracker needs
from the device (reference flow: frame.cpp:74-172 + preintegration/predict):

  1. preintegrate the frame's IMU interval + gravity-aware state prediction,
  2. essential-RANSAC match mask,
  3. 2-pt rotation RANSAC + 70th-percentile misalignment (pure-rotation
     detector),
  4. track-length-priority Poisson-disk re-filter,

returning a single pytree so the host pays ONE dispatch + ONE fetch per frame
(on tunneled TPU deployments each host<->device interaction costs ~30 ms — the
fusion is the difference between ~1 fps and tens of fps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops import poisson_disk, preintegration as pre, ransac


@functools.partial(
    jax.jit,
    static_argnames=("num_hypotheses", "min_dist", "width", "height"),
)
def ft_step(
    # imu interval (padded)
    dts, ws, accs,
    # previous frame state
    q0, p0, v0, bg0, ba0,
    cov_w, cov_a, cov_bg, cov_ba,
    # matches (KP_CAP padded): bearings in prev/next frame + validity
    b1, b2, valid,
    next_pix,  # (KP, 2) tracked pixel positions
    order,  # (KP,) priority permutation (host argsort by track length)
    trash,  # (KP,) tracks marked trash (never re-inserted)
    key,
    rot_thresh,  # radians, rotation-RANSAC inlier bound input
    num_hypotheses: int,
    min_dist: float,
    width: float,
    height: float,
):
    """Returns dict with predicted state, final keep mask, and misalignment."""
    # --- 1. preintegrate + predict -------------------------------------
    delta = pre.integrate(dts, ws, accs, bg0, ba0, cov_w, cov_a, cov_bg, cov_ba)
    q1, p1n, v1, _, _ = pre.predict(delta, q0, p0, v0, bg0, ba0)

    # --- 2. essential RANSAC mask (threshold 1.0 — reference frame.cpp:108) --
    k1, k2 = jax.random.split(key)
    pn1 = b1[:, :2] / b1[:, 2:]
    pn2 = b2[:, :2] / b2[:, 2:]
    res_e = ransac.ransac_essential(
        k1, pn1, pn2, valid, threshold=1.0, num_hypotheses=num_hypotheses
    )
    status = valid & res_e.inlier_mask

    # --- 3. rotation RANSAC + misalignment percentile ------------------
    res_r = ransac.ransac_rotation(
        k2, b1, b2, valid, threshold=rot_thresh, num_hypotheses=num_hypotheses
    )
    Rb1 = jnp.einsum("ij,nj->ni", res_r.model, b1)
    ang = jnp.degrees(jnp.arccos(jnp.clip(jnp.sum(Rb1 * b2, axis=-1), -1.0, 1.0)))
    rmask = res_r.inlier_mask & valid
    n_in = jnp.sum(rmask)
    ang_sorted = jnp.sort(jnp.where(rmask, ang, jnp.inf))
    idx70 = jnp.clip(n_in * 7 // 10, 0, ang.shape[0] - 1)
    misalign = jnp.where(n_in > 0, ang_sorted[idx70], 0.0)

    # --- 4. Poisson re-filter by track-length priority -----------------
    pd_val = status[order] & ~trash[order]
    acc = poisson_disk.poisson_disk_filter(
        next_pix[order], pd_val, min_distance=min_dist, width=width, height=height
    )
    keep = jnp.zeros_like(status).at[order].set(acc)
    final = status & keep & ~trash

    return {
        "q": q1, "p": p1n, "v": v1,
        "mask": final,
        "misalign": misalign,
    }
