"""Real-pixel image backend: CLAHE preprocess + pyramid + GFTT + pyramidal LK.

Plays the role of the reference's `extra::OpenCvImage`
(src/rdvio_extra/src/opencv_image.cpp) behind the abstract Image seam
(types.h:153-177): preprocess = CLAHE + 3-level pyramid (:156-161), detect =
GFTT + Poisson spacing + border (:38-73), track = fwd/bwd pyramidal LK
(:75-154). All kernels are jitted JAX programs from rd_vio_tpu.ops.image.

Round-3 latency shape: on a remote-attached chip every blocking fetch costs a
~30 ms round trip, so the per-frame work is fused into ONE program + ONE
fetch: forward LK + reverse-flow check + (on detection frames) Harris GFTT
spaced against the surviving tracked points (`track_and_detect`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from rd_vio_tpu.ops.image import clahe as clahe_mod
from rd_vio_tpu.ops.image import gftt as gftt_mod
from rd_vio_tpu.ops.image import klt as klt_mod
from rd_vio_tpu.ops.image import pyramid as pyr_mod


@functools.partial(jax.jit, static_argnames=("tx", "ty", "clip", "levels",
                                             "clahe_on"))
def _preprocess_fused(img, tx: int, ty: int, clip: float, levels: int,
                      clahe_on: bool):
    """One program per frame: u8->f32 cast + CLAHE (tile-padded) + pyramid.
    Accepting the camera-native uint8 keeps the per-frame host->device
    transfer at 1 byte/px (4x less tunnel bandwidth than f32)."""
    x = img.astype(jnp.float32)
    if clahe_on:
        H, W = x.shape
        Hp = -(-H // ty) * ty
        Wp = -(-W // tx) * tx
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, Hp - H), (0, Wp - W)), mode="edge")
        x = clahe_mod.clahe(x, tx, ty, clip)
        x = x[:H, :W]
    return tuple(pyr_mod.build_pyramid(x, levels))


@functools.partial(jax.jit, static_argnames=(
    "max_points", "min_dist", "use_pallas", "interpret"))
def _track_detect_fused(pyr_prev, pyr_next, p, g, v,
                        max_points: int, min_dist: float,
                        use_pallas: bool, interpret):
    """Fused per-frame frontend program: LK fwd+rev + GFTT on the new frame
    spaced against the surviving tracked points. One dispatch, one fetch."""
    if use_pallas:
        from rd_vio_tpu.ops.image import klt_pallas as klp

        tracked, status = klp.lk_track_fwd_rev_pallas(
            pyr_prev, pyr_next, p, g, v, interpret=interpret)
    else:
        tracked, status = klt_mod.lk_track_fwd_rev(pyr_prev, pyr_next, p, g, v)
    # detection preset = tracked survivors (fwd+rev ok). This is a slightly
    # conservative superset of the final accepted set (the host Poisson
    # re-filter may drop a few more), matching the reference's semantics of
    # spacing detections against current keypoints (opencv_image.cpp:38-73).
    preset = jnp.where(status[:, None], tracked, jnp.float32(-1e6))
    pix, val, _ = gftt_mod.detect_gftt(
        pyr_next[0], preset, status,
        max_points=max_points, min_dist=min_dist,
    )
    return tracked, status, pix, val


class ProcessedImage:
    """Opaque image handle: preprocessed pyramid + release hook
    (reference OpenCvImage release_image_buffer, opencv_image.cpp:200-208)."""

    __slots__ = ("pyramid", "shape")

    def __init__(self, pyramid, shape):
        self.pyramid = pyramid
        self.shape = shape

    def release(self):
        self.pyramid = None


class JaxImageBackend:
    """ImageBackend over real pixel arrays."""

    # pyramids are device-resident => the device-resident frontend loop
    # (ops/frontend_loop) can chain frame pairs without host fetches
    supports_device_loop = True

    def __init__(self, config, levels: int = 3, kp_cap: int = 512,
                 clahe_enabled: bool = True):
        self.config = config
        self.levels = levels
        self.kp_cap = kp_cap  # fixed tracking batch capacity
        self.clahe_enabled = clahe_enabled
        # "xla" (batched-gather programs) or "pallas" (VMEM-resident kernel,
        # ops/image/klt_pallas; interpret-mode fallback off-TPU)
        self.klt_backend = getattr(config, "klt_backend", "xla")
        if self.klt_backend not in ("xla", "pallas"):
            raise ValueError(f"unknown klt_backend {self.klt_backend!r}")

    # -- preprocessing --------------------------------------------------
    def preprocess(self, img: np.ndarray) -> ProcessedImage:
        """img: (H, W) grayscale in [0, 255]; uint8 uploads byte-exact (4x
        less transfer than f32), other dtypes are cast host-side."""
        cfg = self.config
        if img.dtype != np.uint8:
            img = np.asarray(img, np.float32)
        pyr = _preprocess_fused(
            jnp.asarray(img),
            tx=int(cfg.feature_tracker_clahe_width),
            ty=int(cfg.feature_tracker_clahe_height),
            clip=float(cfg.feature_tracker_clahe_clip_limit),
            levels=self.levels, clahe_on=self.clahe_enabled,
        )
        return ProcessedImage(pyr, img.shape)

    # -- ImageBackend protocol ------------------------------------------
    def detect(self, image: ProcessedImage, existing_pix, max_points, min_dist):
        cap = 256
        ex = np.zeros((cap, 2), np.float32)
        ev = np.zeros(cap, bool)
        n = min(len(existing_pix), cap)
        if n:
            ex[:n] = existing_pix[:n]
            ev[:n] = True
        pix, valid, _ = gftt_mod.detect_gftt(
            image.pyramid[0], jnp.asarray(ex), jnp.asarray(ev),
            max_points=int(max_points), min_dist=float(min_dist),
        )
        return np.asarray(pix)[np.asarray(valid)]

    def _check_cap(self, n: int) -> int:
        if n > self.kp_cap:
            import logging

            logging.getLogger(__name__).warning(
                "image backend keypoint capacity exceeded (%d > kp_cap=%d); "
                "extra keypoints lost this frame (raise kp_cap)",
                n, self.kp_cap,
            )
        return min(n, self.kp_cap)

    def track(self, prev_image: ProcessedImage, next_image: ProcessedImage,
              prev_pix, pred_pix) -> Tuple[np.ndarray, np.ndarray]:
        n = len(prev_pix)
        cap = self.kp_cap
        p = np.zeros((cap, 2), np.float32)
        g = np.zeros((cap, 2), np.float32)
        v = np.zeros(cap, bool)
        nn = self._check_cap(n)
        p[:nn] = prev_pix[:nn]
        g[:nn] = pred_pix[:nn]
        v[:nn] = True
        if self.klt_backend == "pallas":
            from rd_vio_tpu.ops.image import klt_pallas as klp

            tracked, status = klp.lk_track_fwd_rev_pallas(
                prev_image.pyramid, next_image.pyramid,
                jnp.asarray(p), jnp.asarray(g), jnp.asarray(v),
                interpret=None,
            )
        else:
            tracked, status = klt_mod.lk_track_fwd_rev(
                prev_image.pyramid, next_image.pyramid,
                jnp.asarray(p), jnp.asarray(g), jnp.asarray(v),
            )
        # one blocking fetch for both results (latency-bound link)
        tracked, status = jax.device_get((tracked, status))
        return self._fit(np.asarray(tracked), n), self._fit(
            np.asarray(status), n)

    @staticmethod
    def _fit(a: np.ndarray, n: int) -> np.ndarray:
        """Return exactly n rows: slice, or zero-pad (status False / pixel 0)
        for over-capacity slots already warned about in _check_cap."""
        if len(a) >= n:
            return a[:n]
        pad = np.zeros((n - len(a),) + a.shape[1:], a.dtype)
        return np.concatenate([a, pad], axis=0)

    def track_and_detect(self, prev_image: ProcessedImage,
                         next_image: ProcessedImage, prev_pix, pred_pix,
                         max_points: int, min_dist: float):
        """Fused per-frame step (one dispatch + one fetch): LK fwd+rev plus
        GFTT detection on the new frame. Returns (next_pix (N, 2),
        status (N,), new_pix (M, 2))."""
        n = len(prev_pix)
        cap = self.kp_cap
        p = np.zeros((cap, 2), np.float32)
        g = np.zeros((cap, 2), np.float32)
        v = np.zeros(cap, bool)
        nn = self._check_cap(n)
        p[:nn] = prev_pix[:nn]
        g[:nn] = pred_pix[:nn]
        v[:nn] = True
        use_pallas = self.klt_backend == "pallas"
        interpret = None if use_pallas else False
        tracked, status, pix, val = jax.device_get(_track_detect_fused(
            prev_image.pyramid, next_image.pyramid,
            jnp.asarray(p), jnp.asarray(g), jnp.asarray(v),
            max_points=int(max_points), min_dist=float(min_dist),
            use_pallas=use_pallas, interpret=interpret,
        ))
        return (self._fit(np.asarray(tracked), n),
                self._fit(np.asarray(status), n),
                np.asarray(pix)[np.asarray(val)])
