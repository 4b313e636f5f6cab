"""Bicubic intensity evaluation with analytic gradients.

Behavioral reference: /root/reference/src/rdvio_extra/src/opencv_image.cpp:19-36
(`OpenCvImage::evaluate` via ceres::BiCubicInterpolator — Catmull-Rom cubic
convolution over a 4x4 neighborhood, returning intensity and d(intensity)/du
scaled by the per-level coordinate scale). Unused by the reference's main
tracking path; provided for API completeness (direct photometric methods).

TPU-first: batched over query points; the 4x4 neighborhood gather is one
vectorized dynamic-slice per point and the cubic convolution is two small
matmuls against the Catmull-Rom basis (MXU-trivial, VPU-bound in practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Catmull-Rom cubic convolution kernel (a = -0.5), the BiCubicInterpolator
# kernel used by Ceres: weights for samples at offsets {-1, 0, 1, 2} as
# cubic polynomials in the fractional coordinate f.
_CR = jnp.asarray(
    [
        # 1, f, f^2, f^3 coefficients per tap
        [0.0, -0.5, 1.0, -0.5],
        [1.0, 0.0, -2.5, 1.5],
        [0.0, 0.5, 2.0, -1.5],
        [0.0, 0.0, -0.5, 0.5],
    ]
)


def _weights(f):
    """(..., 4) Catmull-Rom weights and their derivatives at fraction f."""
    p = jnp.stack([jnp.ones_like(f), f, f * f, f * f * f], axis=-1)
    dp = jnp.stack(
        [jnp.zeros_like(f), jnp.ones_like(f), 2.0 * f, 3.0 * f * f], axis=-1
    )
    return p @ _CR.T.astype(p.dtype), dp @ _CR.T.astype(p.dtype)


@functools.partial(jax.jit, static_argnames=())
def evaluate_bicubic(img, pts):
    """Bicubic intensity + gradient at float pixel coords.

    img: (H, W) f32; pts: (N, 2) [x, y]. Returns (value (N,), grad (N, 2)
    [d/dx, d/dy]). Coordinates are clamped to the valid interpolation
    domain (matching the interpolator's edge clamping)."""
    f32 = jnp.float32
    img = img.astype(f32)
    H, W = img.shape
    x = jnp.clip(pts[:, 0].astype(f32), 1.0, W - 2.0 - 1e-4)
    y = jnp.clip(pts[:, 1].astype(f32), 1.0, H - 2.0 - 1e-4)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = x0.astype(jnp.int32) - 1
    yi = y0.astype(jnp.int32) - 1

    patch = jax.vmap(
        lambda r, c: jax.lax.dynamic_slice(img, (r, c), (4, 4))
    )(yi, xi)  # (N, 4, 4)

    wx, dwx = _weights(fx)  # (N, 4)
    wy, dwy = _weights(fy)

    val = jnp.einsum("nr,nrc,nc->n", wy, patch, wx)
    gx = jnp.einsum("nr,nrc,nc->n", wy, patch, dwx)
    gy = jnp.einsum("nr,nrc,nc->n", dwy, patch, wx)
    return val, jnp.stack([gx, gy], axis=-1)


def evaluate_pyramid(pyramid, pts, level: int):
    """Reference-evaluate semantics at a pyramid level: query coords are in
    LEVEL-0 pixels, scaled into the level (opencv_image.cpp:19-36), and the
    returned gradient is rescaled back to level-0 units."""
    s = 0.5 ** level
    val, g = evaluate_bicubic(pyramid[level], jnp.asarray(pts) * s)
    return val, g * s
