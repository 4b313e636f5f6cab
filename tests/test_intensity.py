"""Bicubic intensity evaluation (ops/image/intensity) vs scipy's cubic
spline interpolation and finite-difference gradients."""

import numpy as np
import jax.numpy as jnp

from rd_vio_tpu.ops.image.intensity import evaluate_bicubic, evaluate_pyramid
from rd_vio_tpu.ops.image import pyramid


def _img(rng, H=60, W=80):
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.standard_normal((H, W)), 2.0)
    return ((img - img.min()) / np.ptp(img) * 255.0).astype(np.float32)


def test_matches_exact_at_integer_coords(rng):
    img = _img(rng)
    pts = np.stack([rng.integers(2, 77, 50), rng.integers(2, 57, 50)],
                   axis=-1).astype(np.float64)
    val, _ = evaluate_bicubic(jnp.asarray(img), jnp.asarray(pts))
    ref = img[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    np.testing.assert_allclose(np.asarray(val), ref, atol=1e-3)


def test_matches_mapcoordinates_cubic(rng):
    from scipy.ndimage import map_coordinates

    img = _img(rng)
    pts = np.stack([rng.uniform(3, 76, 200), rng.uniform(3, 56, 200)], -1)
    val, _ = evaluate_bicubic(jnp.asarray(img), jnp.asarray(pts))
    # Catmull-Rom is not identical to scipy's B-spline cubic, but on a
    # smooth (Gaussian-filtered) image both approximate the same function
    ref = map_coordinates(img.astype(np.float64), [pts[:, 1], pts[:, 0]],
                          order=3, mode="nearest")
    err = np.abs(np.asarray(val) - ref)
    assert np.median(err) < 0.15, np.median(err)


def test_gradient_finite_difference(rng):
    # unit intensity scale + a wider FD step: at 0-255 scale and eps=1e-3
    # the f32 rounding of the values (~1e-5 relative) dominates the FD
    img = _img(rng) / 255.0
    pts = np.stack([rng.uniform(5, 74, 100), rng.uniform(5, 54, 100)], -1)
    # keep pts +- eps inside one integer cell so FD never straddles a knot
    pts = np.floor(pts) + np.clip(pts - np.floor(pts), 0.1, 0.9)
    _, g = evaluate_bicubic(jnp.asarray(img), jnp.asarray(pts))
    eps = 1e-2
    for axis in (0, 1):
        d = np.zeros(2)
        d[axis] = eps
        vp, _ = evaluate_bicubic(jnp.asarray(img), jnp.asarray(pts + d))
        vm, _ = evaluate_bicubic(jnp.asarray(img), jnp.asarray(pts - d))
        fd = (np.asarray(vp) - np.asarray(vm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[:, axis], fd, atol=2e-3)


def test_pyramid_level_scaling(rng):
    img = _img(rng, H=64, W=96)
    pyr = pyramid.build_pyramid(jnp.asarray(img), 3)
    pts = np.stack([rng.uniform(12, 84, 30), rng.uniform(12, 52, 30)], -1)
    # level-1 query of a level-0 coordinate equals a direct query of the
    # level-1 image at halved coordinates, with gradient halved back
    v1, g1 = evaluate_pyramid(pyr, pts, 1)
    v1d, g1d = evaluate_bicubic(pyr[1], jnp.asarray(pts) * 0.5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v1d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g1d) * 0.5,
                               atol=1e-6)
