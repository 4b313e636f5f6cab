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
    pad = lambda a: jnp.pad(  # noqa: E731
        jnp.asarray(a, jnp.float32), klt_pallas.PADB, mode="edge")
    pts = blobs[(blobs[:, 0] > 30) & (blobs[:, 0] < 290)]
    pts = pts[(pts[:, 1] > 30) & (pts[:, 1] < 210)][:24]
    n = len(pts)
    ppts = jnp.asarray(pts, jnp.float32) + klt_pallas.PADB
    out = klt_pallas.lk_level_pallas(
        pad(img1), pad(img2), ppts, ppts,
        jnp.ones(n, bool), iters=30, interpret=True,
    )
    out = np.asarray(out)
    # recovers the planted shift
    err = (out[:, :2] - klt_pallas.PADB) - (pts + [2.1, -1.4])
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


def test_backend_flag_selects_pallas(rng):
    """JaxImageBackend(klt_backend='pallas') tracks equivalently to the XLA
    backend through the full preprocess/track/reverse-check path."""
    from rd_vio_tpu.config import Config
    from rd_vio_tpu.models.image_backend import JaxImageBackend

    shift = (2.6, -1.3)
    img1, blobs = _render(rng, n_blobs=80)
    img2, _ = _render(rng, n_blobs=80, shift=shift)
    pts = blobs[(blobs[:, 0] > 30) & (blobs[:, 0] < 290)]
    pts = pts[(pts[:, 1] > 30) & (pts[:, 1] < 210)][:16].astype(np.float32)

    cfg = Config()
    outs = {}
    for be in ("xla", "pallas"):
        cfg.klt_backend = be
        backend = JaxImageBackend(cfg, kp_cap=16)
        a = backend.preprocess(img1)
        b = backend.preprocess(img2)
        outs[be] = backend.track(a, b, pts, pts)

    st = outs["xla"][1] & outs["pallas"][1]
    assert st.mean() > 0.6
    d = np.linalg.norm(outs["pallas"][0][st] - outs["xla"][0][st], axis=-1)
    assert np.median(d) < 0.2
