"""CLAHE — contrast-limited adaptive histogram equalization (f32 / u8).

Behavioral reference: cv::CLAHE with clip limit 6.0 and an 8x8 tile grid as
used by /root/reference/src/rdvio_extra/src/opencv_image.cpp:156-160 and config
feature_tracker_clahe_* (types.h:115-117).

TPU-first design: per-tile 256-bin histograms via a one-hot matmul reduction
(MXU-friendly), vectorized clip + excess redistribution (OpenCV semantics:
one-pass clip, uniform redistribution of the excess), per-tile CDF LUTs, and
bilinearly interpolated LUT application via a gather over (tile, bin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y", "clip_limit"))
def clahe(img, tiles_x: int = 8, tiles_y: int = 8, clip_limit: float = 6.0):
    """img: (H, W) u8-valued array (any float/int dtype, range [0, 255]).
    Returns f32 (H, W) in [0, 255].

    H, W must be divisible by the tile grid (callers pad); EuRoC 752x480 with
    8x8 tiles gives 94x60 tiles.
    """
    H, W = img.shape
    th, tw = H // tiles_y, W // tiles_x
    n_tiles = tiles_x * tiles_y
    tile_px = th * tw

    u8 = jnp.clip(img, 0, 255).astype(jnp.int32)
    tiles = u8.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(n_tiles, tile_px)

    # per-tile histogram via one-hot reduction
    onehot = jax.nn.one_hot(tiles, 256, dtype=jnp.float32)  # (T, px, 256)
    hist = jnp.sum(onehot, axis=1)  # (T, 256)

    # clip + uniform redistribution (OpenCV: limit = clip * tile_px / 256)
    limit = jnp.maximum(clip_limit * tile_px / 256.0, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / 256.0

    # CDF -> LUT (OpenCV CLAHE uses scale = 255 / tile_px on the raw cdf)
    cdf = jnp.cumsum(hist, axis=-1)
    lut = jnp.clip(jnp.round(cdf * (255.0 / tile_px)), 0, 255)  # (T, 256)
    lut = lut.reshape(tiles_y, tiles_x, 256)

    # bilinear interpolation between the 4 neighboring tile LUTs
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / th - 0.5
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, tiles_y - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, tiles_x - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tiles_y - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles_x - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]

    def sample(yi, xi):
        # lut[yi[r], xi[c], img[r, c]] as a flat gather
        flat = lut.reshape(-1, 256)
        tidx = yi[:, None] * tiles_x + xi[None, :]
        return flat[tidx, u8]

    v00 = sample(y0, x0)
    v01 = sample(y0, x1)
    v10 = sample(y1, x0)
    v11 = sample(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(jnp.float32)
