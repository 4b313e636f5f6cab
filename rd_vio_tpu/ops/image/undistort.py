"""Image undistortion via precomputed remap tables.

Behavioral reference: /root/reference/src/rdvio_extra/include/rdvio/extra/
image_undistorter.h:16-84 (radtan + equidistant remap tables; the examples use
cv::undistort equivalently, dataset.hpp:232-236).

The remap table maps each undistorted output pixel to its source coordinate in
the distorted input (forward distortion model); application is one bilinear
gather, jit-compiled once per calibration.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from rd_vio_tpu.ops import camera


def build_remap(K, dist, model: str, width: int, height: int):
    """Host-precomputed (map_y, map_x) f32 arrays of shape (H, W)."""
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    pix = np.stack([xs, ys], axis=-1).reshape(-1, 2)
    p_norm = np.asarray(camera.remove_k(jnp.asarray(pix), jnp.asarray(K)))
    distort = camera.distort_radtan if model == "radtan" else camera.distort_equidistant
    pd = np.asarray(distort(jnp.asarray(p_norm), jnp.asarray(dist)))
    src = np.asarray(camera.apply_k(jnp.asarray(pd), jnp.asarray(K)))
    map_x = src[:, 0].reshape(height, width).astype(np.float32)
    map_y = src[:, 1].reshape(height, width).astype(np.float32)
    return map_y, map_x


@jax.jit
def remap_bilinear(img, map_y, map_x):
    """Sample img at (map_y, map_x) bilinearly; out-of-range -> 0."""
    H, W = img.shape
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    wx = map_x - x0
    wy = map_y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    v = (
        img[y0i, x0i] * (1 - wy) * (1 - wx)
        + img[y0i, x0i + 1] * (1 - wy) * wx
        + img[y0i + 1, x0i] * wy * (1 - wx)
        + img[y0i + 1, x0i + 1] * wy * wx
    )
    inside = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)
    return jnp.where(inside, v, 0.0)
