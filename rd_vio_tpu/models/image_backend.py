"""Real-pixel image backend: CLAHE preprocess + pyramid + GFTT + pyramidal LK.

Plays the role of the reference's `extra::OpenCvImage`
(src/rdvio_extra/src/opencv_image.cpp) behind the abstract Image seam
(types.h:153-177): preprocess = CLAHE + 3-level pyramid (:156-161), detect =
GFTT + Poisson spacing + border (:38-73), track = fwd/bwd pyramidal LK
(:75-154). All kernels are jitted JAX programs from rd_vio_tpu.ops.image.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from rd_vio_tpu.ops.image import clahe as clahe_mod
from rd_vio_tpu.ops.image import gftt as gftt_mod
from rd_vio_tpu.ops.image import klt as klt_mod
from rd_vio_tpu.ops.image import pyramid as pyr_mod


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
        """img: (H, W) grayscale in [0, 255]."""
        cfg = self.config
        x = jnp.asarray(img, jnp.float32)
        if self.clahe_enabled:
            H, W = x.shape
            tx = cfg.feature_tracker_clahe_width
            ty = cfg.feature_tracker_clahe_height
            # pad to tile-divisible size, CLAHE, crop back
            Hp = ((H + ty - 1) // ty) * ty
            Wp = ((W + tx - 1) // tx) * tx
            if (Hp, Wp) != (H, W):
                x = jnp.pad(x, ((0, Hp - H), (0, Wp - W)), mode="edge")
            x = clahe_mod.clahe(x, tx, ty, cfg.feature_tracker_clahe_clip_limit)
            x = x[:H, :W]
        pyr = pyr_mod.build_pyramid(x, self.levels)
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

    def track(self, prev_image: ProcessedImage, next_image: ProcessedImage,
              prev_pix, pred_pix) -> Tuple[np.ndarray, np.ndarray]:
        n = len(prev_pix)
        cap = self.kp_cap
        p = np.zeros((cap, 2), np.float32)
        g = np.zeros((cap, 2), np.float32)
        v = np.zeros(cap, bool)
        nn = min(n, cap)
        p[:nn] = prev_pix[:nn]
        g[:nn] = pred_pix[:nn]
        v[:nn] = True
        if self.klt_backend == "pallas":
            from rd_vio_tpu.ops.image import klt_pallas as klp

            tracked, status = klp.lk_track_pyramid_pallas(
                prev_image.pyramid, next_image.pyramid,
                jnp.asarray(p), jnp.asarray(g), jnp.asarray(v),
                interpret=None,
            )
            status = klp.lk_reverse_check_pallas(
                prev_image.pyramid, next_image.pyramid,
                jnp.asarray(p), tracked, status, interpret=None,
            )
        else:
            tracked, status = klt_mod.lk_track_pyramid(
                prev_image.pyramid, next_image.pyramid,
                jnp.asarray(p), jnp.asarray(g), jnp.asarray(v),
            )
            status = klt_mod.lk_reverse_check(
                prev_image.pyramid, next_image.pyramid, jnp.asarray(p), tracked, status
            )
        return np.asarray(tracked)[:n], np.asarray(status)[:n]
