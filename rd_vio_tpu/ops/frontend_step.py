"""Fused per-frame frontend device program.

One jitted call per camera frame covering everything the feature tracker needs
from the device (reference flow: frame.cpp:74-172):

  1. essential-RANSAC match mask,
  2. 2-pt rotation RANSAC + 70th-percentile misalignment (pure-rotation
     detector),

returning a single pytree so the host pays ONE dispatch + ONE fetch per frame.
The track-length-priority Poisson re-filter runs host-side after the fetch
(see ft_step docstring).
State prediction (preintegrate + gravity propagation) happens host-side in
`ops/preintegration_np.py` — it is a ~10-sample mean-only loop, and keeping it
off the device removes a sequential 64-step f64 scan from this program.

All math here runs in float32: the RANSAC inlier thresholds are loose
(chi-square px bounds / radian misalignment bounds), so f32 residuals decide
the same masks while running ~5x faster than f64 on TPUs without native
double-precision units (v5e/v6e emulate f64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops import ransac


def ft_masks(b1, b2, valid, key, rot_thresh, num_hypotheses: int):
    """Trace-level body shared by `ft_step` (standalone program) and the
    device-resident frontend loop (ops/frontend_loop.py): essential-RANSAC
    match mask + rotation-RANSAC misalignment percentile."""
    f32 = jnp.float32
    b1 = b1.astype(f32)
    b2 = b2.astype(f32)

    # --- 1. essential RANSAC mask (threshold 1.0 — reference frame.cpp:108) --
    k1, k2 = jax.random.split(key)
    pn1 = b1[:, :2] / b1[:, 2:]
    pn2 = b2[:, :2] / b2[:, 2:]
    res_e = ransac.ransac_essential(
        k1, pn1, pn2, valid, threshold=1.0, num_hypotheses=num_hypotheses
    )
    status = valid & res_e.inlier_mask

    # --- 2. rotation RANSAC + misalignment percentile ------------------
    res_r = ransac.ransac_rotation(
        k2, b1, b2, valid, threshold=rot_thresh, num_hypotheses=num_hypotheses
    )
    Rb1 = jnp.einsum("ij,nj->ni", res_r.model.astype(f32), b1)
    ang = jnp.degrees(jnp.arccos(jnp.clip(jnp.sum(Rb1 * b2, axis=-1), -1.0, 1.0)))
    rmask = res_r.inlier_mask & valid
    n_in = jnp.sum(rmask)
    ang_sorted = jnp.sort(jnp.where(rmask, ang, jnp.inf))
    idx70 = jnp.clip(n_in * 7 // 10, 0, ang.shape[0] - 1)
    misalign = jnp.where(n_in > 0, ang_sorted[idx70], 0.0)

    return {
        "mask": status,
        "misalign": misalign,
    }


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ft_step(
    # matches (KP_CAP padded): bearings in prev/next frame + validity
    b1, b2, valid,
    key,
    rot_thresh,  # radians, rotation-RANSAC inlier bound input
    num_hypotheses: int,
):
    """Returns dict with the essential-RANSAC status mask and the rotation
    misalignment percentile. The track-length-priority Poisson re-filter
    (reference frame.cpp:134-161) runs on HOST after the fetch
    (ops/poisson_disk.poisson_disk_filter_np): it is a short sequential grid
    loop, and the single TPU serializes all programs, so keeping it in this
    program would cost ~5-8 ms of device scan time per frame."""
    return ft_masks(b1, b2, valid, key, rot_thresh, num_hypotheses)
