"""Pallas LK kernel vs the XLA reference implementation (interpret mode on
CPU; the compiled path runs on TPU in bench/e2e)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rd_vio_tpu.ops.image import klt, klt_pallas, pyramid
from tests.test_image_kernels import _render


def test_pallas_level_matches_xla(rng):
    img1, blobs = _render(rng, n_blobs=80)
    img2, _ = _render(rng, n_blobs=80, shift=(2.1, -1.4))
    i1 = jnp.asarray(img1, jnp.float32)
    i2 = jnp.asarray(img2, jnp.float32)
    gx, gy = klt._grad(i1)
    pts = blobs[(blobs[:, 0] > 30) & (blobs[:, 0] < 290)]
    pts = pts[(pts[:, 1] > 30) & (pts[:, 1] < 210)][:24]
    n = len(pts)
    out = klt_pallas.lk_level_pallas(
        i1, gx, gy, i2, jnp.asarray(pts, jnp.float32),
        jnp.asarray(pts, jnp.float32), jnp.ones(n, bool),
        iters=30, interpret=True,
    )
    out = np.asarray(out)
    # recovers the planted shift
    err = out[:, :2] - (pts + [2.1, -1.4])
    ok = out[:, 3] > 0
    assert ok.mean() > 0.8
    assert np.median(np.abs(err[ok]).max(axis=-1)) < 0.3


def test_pallas_pyramid_matches_xla(rng):
    shift = (3.7, -2.2)
    img1, blobs = _render(rng, n_blobs=80)
    img2, _ = _render(rng, n_blobs=80, shift=shift)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pyr2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    pts = blobs[(blobs[:, 0] > 30) & (blobs[:, 0] < 290)]
    pts = pts[(pts[:, 1] > 30) & (pts[:, 1] < 210)][:24]
    n = len(pts)

    tr_ref, st_ref = klt.lk_track_pyramid(
        pyr1, pyr2, jnp.asarray(pts), jnp.asarray(pts), jnp.ones(n, bool)
    )
    tr_pal, st_pal = klt_pallas.lk_track_pyramid_pallas(
        pyr1, pyr2, jnp.asarray(pts), jnp.asarray(pts), jnp.ones(n, bool),
        interpret=True,
    )
    st_ref = np.asarray(st_ref)
    st_pal = np.asarray(st_pal)
    both = st_ref & st_pal
    assert both.mean() > 0.7
    # same flows within a fraction of a pixel
    d = np.linalg.norm(np.asarray(tr_pal)[both] - np.asarray(tr_ref)[both], axis=-1)
    assert np.median(d) < 0.2
