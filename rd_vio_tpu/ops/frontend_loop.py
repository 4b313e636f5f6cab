"""Device-resident per-frame frontend loop: the keypoint state machine lives
ON the TPU, the host consumes results one frame stale.

Motivation (round 3). The per-frame frontend — pyramidal LK fwd+rev, the
essential/rotation RANSAC masks, the track-length-priority Poisson re-filter
and (every Nth frame) GFTT detection — is the pipeline's bottleneck stage.
The round-2 formulation dispatched one fused program per frame and BLOCKED on
its fetch, so every frame paid device-time + a full host<->device round trip
(~30 ms on a tunneled chip) on the critical path.

The fix is to remove the host from the frame-to-frame data dependency
entirely.  The tracked keypoint set for the pair (N -> N+1) depends only on
the keypoint set after pair (N-1 -> N) — and that state can stay on the
device.  `ft_loop_step` is one jitted program

    state_N, fetch_N = ft_loop_step(state_{N-1}, pyr_{N-1}, pyr_N, ...)

whose `state` output feeds the next call WITHOUT a host fetch: XLA queues the
chain asynchronously, so at steady state there is always a program in flight
and the dispatch-to-fetch latency is hidden behind the frame interval.  The
host fetches `fetch_{N-1}` when frame N+1 arrives (the program has had a full
frame interval to finish), does its track bookkeeping one frame stale, and
feeds back only a tiny `host_drop` mask (tracks the optimizer trashed) into a
later dispatch.

Everything the reference does per frame (frame.cpp:74-172 + the
opencv_image.cpp:75-154 LK and :38-73 detection) happens inside the program:

  1. IMU-predicted initial flow (frame.cpp:82-93) — from the host-supplied
     camera-frame delta rotation,
  2. pyramidal LK forward + reverse-flow check (opencv_image.cpp:75-154),
  3. essential-RANSAC mask + 2-pt rotation RANSAC misalignment percentile
     (frame.cpp:108-131) — shared trace body ops/frontend_step.ft_masks,
  4. track-length-priority Poisson-disk re-filter (frame.cpp:134-161) —
     the device grid-scan ops/poisson_disk.poisson_disk_filter,
  5. on detection frames: Harris GFTT spaced against the survivors
     (opencv_image.cpp:38-73) with new corners merged into free slots.

Slot semantics: a slot is a keypoint currently being tracked. `cont[i]`
(fetch) means slot i survived from the previous frame (same physical track);
`born[i]` means slot i was filled by a fresh detection this frame.  Slot
lifetimes/pixels are all in the fetch payload, so the host can mirror the
full track graph with no device round trip of its own.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops.frontend_step import ft_masks
from rd_vio_tpu.ops.image import klt as klt_mod
from rd_vio_tpu.ops.poisson_disk import poisson_disk_filter


class FTLoopState(NamedTuple):
    """Device-resident keypoint state (capacity C slots)."""

    pix: jax.Array  # (C, 2) f32 pixel position in the latest frame
    valid: jax.Array  # (C,) bool slot alive
    life: jax.Array  # (C,) int32 consecutive-tracked length (track.m_life)


def init_state(cap: int) -> FTLoopState:
    return FTLoopState(
        pix=jnp.zeros((cap, 2), jnp.float32),
        valid=jnp.zeros((cap,), bool),
        life=jnp.zeros((cap,), jnp.int32),
    )


def _bearing(pix, K):
    x = (pix[:, 0] - K[0, 2]) / K[0, 0]
    y = (pix[:, 1] - K[1, 2]) / K[1, 1]
    b = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return b / jnp.linalg.norm(b, axis=-1, keepdims=True)


def _project(b, K):
    z = jnp.maximum(b[:, 2], 1e-6)
    return jnp.stack(
        [b[:, 0] / z * K[0, 0] + K[0, 2], b[:, 1] / z * K[1, 1] + K[1, 2]],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=(
    "detect", "max_points", "min_dist", "num_hypotheses", "use_pallas",
    "interpret"))
def ft_loop_step(
    state: FTLoopState,
    pyr_prev, pyr_next,  # pyramids (device-resident, from preprocess)
    R_pred,  # (3, 3) f32 camera-frame delta rotation (IMU initial flow)
    key,  # PRNG key for the RANSAC banks
    host_drop,  # (C,) bool — tracks the host/optimizer retired (stale ok)
    K,  # (3, 3) f32 intrinsics
    rot_thresh,  # radians — rotation-RANSAC inlier bound
    detect: bool,  # detection frame? (static: cadence is static config)
    max_points: int,
    min_dist: float,
    num_hypotheses: int,
    use_pallas: bool = False,
    interpret=False,
):
    """One frame step of the device-resident frontend. Returns
    (new_state, fetch) where `fetch` is the host bookkeeping payload:

      pix (C, 2)    keypoint pixel in the NEW frame (valid slots)
      valid (C,)    slot alive after this frame
      cont (C,)     slot survived tracking from the previous frame
      born (C,)     slot newly filled by a detection this frame
      life (C,)     updated consecutive-tracked length
      misalign ()   rotation-RANSAC 70th-percentile misalignment (degrees)
    """
    f32 = jnp.float32
    C = state.pix.shape[0]
    K = K.astype(f32)
    H, W = pyr_next[0].shape

    valid = state.valid & ~host_drop

    # 1. IMU-predicted initial flow
    b1 = _bearing(state.pix, K)
    pred_pix = _project(b1 @ R_pred.astype(f32).T, K)
    pred_pix = jnp.where(valid[:, None], pred_pix, state.pix)

    # 2. pyramidal LK fwd + reverse check
    if use_pallas:
        from rd_vio_tpu.ops.image import klt_pallas as klp

        tracked, st = klp.lk_track_fwd_rev_pallas(
            pyr_prev, pyr_next, state.pix, pred_pix, valid,
            interpret=interpret)
    else:
        tracked, st = klt_mod.lk_track_fwd_rev(
            pyr_prev, pyr_next, state.pix, pred_pix, valid)

    # 3. RANSAC masks + pure-rotation misalignment
    b2 = _bearing(tracked, K)
    out = ft_masks(b1, b2, st, key, rot_thresh, num_hypotheses)
    status = st & out["mask"]

    # 4. track-length-priority Poisson re-filter (priority = life desc,
    #    slot index asc as the deterministic tiebreak)
    key_sort = -state.life * C + jnp.arange(C, dtype=jnp.int32)
    order = jnp.argsort(key_sort)
    acc_o = poisson_disk_filter(
        tracked[order], status[order],
        min_distance=float(min_dist), width=float(W), height=float(H),
    )
    acc = jnp.zeros((C,), bool).at[order].set(acc_o)
    cont = status & acc

    new_pix = jnp.where(cont[:, None], tracked, 0.0)
    new_life = jnp.where(cont, state.life + 1, 0)
    born = jnp.zeros((C,), bool)

    # 5. detection frames: GFTT spaced against survivors, merged into free
    #    slots (first-free-slot order)
    if detect:
        from rd_vio_tpu.ops.image.gftt import detect_gftt

        preset = jnp.where(cont[:, None], tracked, jnp.float32(-1e6))
        det_pix, det_val, _ = detect_gftt(
            pyr_next[0], preset, cont,
            max_points=int(max_points), min_dist=float(min_dist),
        )
        M = det_pix.shape[0]
        free = ~cont
        # index of the k-th free slot: ascending sort of (slot index | C)
        free_slots = jnp.sort(jnp.where(free, jnp.arange(C), C))
        n_free = jnp.sum(free.astype(jnp.int32))
        k = jnp.arange(M)
        place = det_val & (k < n_free)
        # out-of-range targets (C) drop out of the scatter
        target = jnp.where(place, free_slots[jnp.minimum(k, C - 1)], C)
        new_pix = new_pix.at[target].set(det_pix.astype(f32), mode="drop")
        born = born.at[target].set(place, mode="drop")
        new_life = jnp.where(born, 1, new_life)

    new_valid = cont | born
    new_state = FTLoopState(
        pix=jnp.where(new_valid[:, None], new_pix, 0.0),
        valid=new_valid, life=new_life,
    )
    fetch = {
        "pix": new_state.pix,
        "valid": new_valid,
        "cont": cont,
        "born": born,
        "life": new_life,
        "misalign": out["misalign"],
    }
    return new_state, fetch
