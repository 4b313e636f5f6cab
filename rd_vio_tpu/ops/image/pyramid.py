"""Gaussian image pyramid for pyramidal LK (f32).

Behavioral reference: OpenCV buildOpticalFlowPyramid as used by
/root/reference/src/rdvio_extra/src/opencv_image.cpp:156-161 (3 levels,
21x21 LK window). Standard 5-tap [1 4 6 4 1]/16 smoothing + 2x decimation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KERNEL5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


def _sep_blur(img):
    """Separable 5-tap blur with edge replication. img: (H, W) f32."""
    k = _KERNEL5
    pad = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img_v = sum(pad[i : i + img.shape[0], :] * k[i] for i in range(5))
    pad = jnp.pad(img_v, ((0, 0), (2, 2)), mode="edge")
    return sum(pad[:, i : i + img.shape[1]] * k[i] for i in range(5))


def downsample2(img):
    """Blur + 2x decimation (pyrDown)."""
    return _sep_blur(img)[::2, ::2]


def build_pyramid(img, levels: int = 3):
    """Returns [img, half, quarter, ...] — `levels + 1` images, f32."""
    img = img.astype(jnp.float32)
    out = [img]
    for _ in range(levels):
        out.append(downsample2(out[-1]))
    return out
