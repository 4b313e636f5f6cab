"""Host twin of the per-frame mask program: ft_step_np must make the same
decisions as the device ft_step on identical inputs.

Note the essential mask at this call site is intentionally loose (reference
frame.cpp:108-114 / stereo.cpp:59 uses bound 2*3.84*1.0^2 in normalized
units — it only removes catastrophic mismatches; the strict rejection lives
in IMU-PARSAC and landmark validation), so the tests check host/device
agreement and solver quality at tight thresholds, not absolute rejection at
the production bound."""

import numpy as np
import jax

from rd_vio_tpu.ops.frontend_step import ft_step
from rd_vio_tpu.ops.frontend_step_np import (
    essential_geometric_error_np,
    ft_step_np,
    sample_indices_np,
    solve_essential_8pt_np,
)


def _make_scene(rng, n=256, n_out=30, pure_rotation=False):
    """Bearings before/after a known motion, with planted outliers."""
    from scipy.spatial.transform import Rotation

    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    R = Rotation.from_rotvec([0.02, 0.05, -0.03]).as_matrix()
    t = np.zeros(3) if pure_rotation else np.array([0.3, -0.1, 0.05])
    b1 = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    p2 = (pts - t) @ R.T
    b2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
    out_idx = rng.choice(n, size=n_out, replace=False)
    b2[out_idx] = rng.normal(size=(n_out, 3))
    b2[out_idx, 2] = np.abs(b2[out_idx, 2]) + 0.5
    b2[out_idx] /= np.linalg.norm(b2[out_idx], axis=-1, keepdims=True)
    valid = np.ones(n, bool)
    is_out = np.zeros(n, bool)
    is_out[out_idx] = True
    return b1.astype(np.float32), b2.astype(np.float32), valid, is_out


def test_essential_solver_separates_outliers():
    """At a tight bound the host 8-pt RANSAC pieces isolate planted outliers."""
    rng = np.random.default_rng(0)
    b1, b2, valid, is_out = _make_scene(rng)
    pn1 = b1[:, :2] / b1[:, 2:]
    pn2 = b2[:, :2] / b2[:, 2:]
    gen = np.random.default_rng(42)
    idx = sample_indices_np(gen, valid & ~is_out, 128, 8)  # clean samples
    E = solve_essential_8pt_np(pn1[idx], pn2[idx])
    err = essential_geometric_error_np(E, pn1[None], pn2[None]) + \
        essential_geometric_error_np(np.swapaxes(E, -1, -2), pn2[None], pn1[None])
    best = int(np.argmax((err < 1e-6).sum(axis=-1)))
    e = err[best]
    assert np.median(e[~is_out]) < 1e-6
    assert np.median(e[is_out]) > 1e-3


def test_host_matches_device_decisions():
    rng = np.random.default_rng(1)
    b1, b2, valid, is_out = _make_scene(rng)
    key = jax.random.PRNGKey(3)
    host = ft_step_np(b1, b2, valid, key, np.radians(10.0), num_hypotheses=256)
    dev = jax.device_get(ft_step(b1, b2, valid, key,
                                 np.float32(np.radians(10.0)),
                                 num_hypotheses=256))
    hm, dm = np.asarray(host["mask"]), np.asarray(dev["mask"])
    # PRNG streams differ so masks need not be identical, but at the
    # production bound host and device must agree on ~all points
    assert (hm == dm).mean() > 0.95


def test_pure_rotation_detector_agreement():
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(11)
    for pure in (True, False):
        b1, b2, valid, _ = _make_scene(rng, n_out=10, pure_rotation=pure)
        host = ft_step_np(b1, b2, valid, key, np.radians(10.0), num_hypotheses=256)
        dev = jax.device_get(ft_step(b1, b2, valid, key,
                                     np.float32(np.radians(10.0)),
                                     num_hypotheses=256))
        h_mis, d_mis = float(host["misalign"]), float(dev["misalign"])
        if pure:
            assert h_mis < 0.1 and d_mis < 0.1
        else:
            assert h_mis > 0.5 and d_mis > 0.5


def test_degenerate_few_points():
    key = jax.random.PRNGKey(5)
    b = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (16, 1))
    valid = np.zeros(16, bool)
    valid[:3] = True
    out = ft_step_np(b, b, valid, key, np.radians(10.0), num_hypotheses=32)
    assert out["mask"].shape == (16,)
