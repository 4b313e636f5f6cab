"""M3 tests: image kernels on synthetic imagery (SURVEY.md §4.3 — real-image
comparisons come with the EuRoC harness; here we verify behavior on rendered
patterns with known ground truth)."""

import numpy as np
import jax.numpy as jnp

from rd_vio_tpu.ops.image import clahe, gftt, klt, pyramid


def _render(rng, H=240, W=320, n_blobs=60, shift=(0.0, 0.0), seed=42):
    """Smooth random blob image; shift moves the whole pattern. Blob layout is
    seeded independently of `rng` so shifted pairs share content."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.zeros((H, W))
    cx = rng.uniform(20, W - 20, n_blobs)
    cy = rng.uniform(20, H - 20, n_blobs)
    amp = rng.uniform(60, 200, n_blobs)
    sig = rng.uniform(2.0, 5.0, n_blobs)
    for i in range(n_blobs):
        img += amp[i] * np.exp(
            -(((xs - cx[i] - shift[0]) ** 2 + (ys - cy[i] - shift[1]) ** 2)
              / (2 * sig[i] ** 2))
        )
    return np.clip(img, 0, 255), np.stack([cx, cy], axis=-1)


def test_pyramid_shapes(rng):
    img, _ = _render(rng)
    pyr = pyramid.build_pyramid(jnp.asarray(img), levels=3)
    assert len(pyr) == 4
    assert pyr[1].shape == (120, 160)
    assert pyr[3].shape == (30, 40)
    # downsampling preserves mean brightness approximately
    assert abs(float(pyr[2].mean()) - img.mean()) < 10.0


def test_clahe_improves_contrast(rng):
    # low-contrast image: values squeezed into [100, 140]
    img, _ = _render(rng)
    low = 100 + (img / 255.0) * 40.0
    out = np.asarray(clahe.clahe(jnp.asarray(low), 8, 8, 6.0))
    assert out.shape == low.shape
    assert out.std() > low.std() * 1.5  # contrast stretched
    assert out.min() >= 0 and out.max() <= 255


def test_clahe_uniform_is_stable(rng):
    img = np.full((240, 320), 128.0)
    out = np.asarray(clahe.clahe(jnp.asarray(img), 8, 8, 6.0))
    assert np.isfinite(out).all()
    assert out.std() < 20.0


def test_gftt_finds_corners(rng):
    # checkerboard has unambiguous corners
    H, W = 240, 320
    ys, xs = np.mgrid[0:H, 0:W]
    img = (((ys // 24) + (xs // 24)) % 2 * 200.0).astype(np.float64)
    pix, valid, scores = gftt.detect_gftt(
        jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool),
        max_points=100, min_dist=10.0, border=8,
    )
    pix = np.asarray(pix)[np.asarray(valid)]
    assert len(pix) > 20
    # all detections near checkerboard crossings (multiples of 24)
    off = np.abs(((pix + 12) % 24) - 12)
    assert np.median(off.max(axis=-1)) < 3.0


def test_gftt_respects_existing(rng):
    img, _ = _render(rng, n_blobs=40)
    pix1, val1, _ = gftt.detect_gftt(
        jnp.asarray(img), jnp.zeros((1, 2)), jnp.zeros(1, bool),
        max_points=50, min_dist=20.0,
    )
    p1 = np.asarray(pix1)[np.asarray(val1)]
    # re-detect with the first batch preset: new detections keep distance
    pix2, val2, _ = gftt.detect_gftt(
        jnp.asarray(img), jnp.asarray(pix1), val1,
        max_points=50, min_dist=20.0,
    )
    p2 = np.asarray(pix2)[np.asarray(val2)]
    if len(p2):
        d = np.linalg.norm(p2[:, None] - p1[None], axis=-1).min(axis=1)
        assert d.min() >= 20.0 - 1e-3


def test_klt_tracks_known_shift(rng):
    shift = (3.7, -2.2)
    img1, blobs = _render(rng, n_blobs=80)
    img2, _ = _render(rng, n_blobs=80, shift=shift)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pyr2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    pts = blobs[(blobs[:, 0] > 30) & (blobs[:, 0] < 290)][:40]
    pts = pts[(pts[:, 1] > 30) & (pts[:, 1] < 210)]
    n = len(pts)
    assert n >= 15
    tracked, status = klt.lk_track_pyramid(
        pyr1, pyr2, jnp.asarray(pts), jnp.asarray(pts), jnp.ones(n, bool)
    )
    st = np.asarray(status)
    assert st.mean() > 0.7
    err = np.asarray(tracked)[st] - (pts[st] + np.asarray(shift))
    assert np.median(np.linalg.norm(err, axis=-1)) < 0.25


def test_klt_reverse_check_rejects_occlusion(rng):
    img1, blobs = _render(rng, n_blobs=80)
    img2 = img1.copy()
    img2[:, 160:] = 0.0  # wipe right half: those tracks must die
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pyr2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    pts = blobs[(blobs[:, 1] > 30) & (blobs[:, 1] < 210)]
    pts = pts[(pts[:, 0] > 30) & (pts[:, 0] < 290)][:40]
    n = len(pts)
    tracked, status = klt.lk_track_pyramid(
        pyr1, pyr2, jnp.asarray(pts), jnp.asarray(pts), jnp.ones(n, bool)
    )
    status2 = klt.lk_reverse_check(pyr1, pyr2, jnp.asarray(pts), tracked, status)
    st = np.asarray(status2)
    right = pts[:, 0] > 180
    left = pts[:, 0] < 140
    assert st[right].mean() < 0.3  # wiped-region tracks rejected
    assert st[left].mean() > 0.6  # surviving region keeps tracking
