"""Tests for the batched RANSAC / PARSAC / IMU-PARSAC engines and the
Poisson-disk filter on synthetic data with planted outliers."""

import numpy as np
import jax
import jax.numpy as jnp

from rd_vio_tpu.ops import lie, parsac, poisson_disk, ransac


def _scene(rng, n=120, outlier_frac=0.3):
    pts = np.concatenate(
        [rng.uniform(-1, 1, size=(n, 2)), rng.uniform(3, 8, size=(n, 1))], axis=1
    )
    rv = np.array([0.04, -0.02, 0.03])
    R = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray(rv))))
    t = np.array([0.5, -0.2, 0.1])
    x2 = pts @ R.T + t
    p1 = pts[:, :2] / pts[:, 2:]
    p2 = x2[:, :2] / x2[:, 2:]
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, size=n_out, replace=False)
    p2_noisy = p2.copy()
    p2_noisy[out_idx] += rng.uniform(0.05, 0.3, size=(n_out, 2)) * rng.choice(
        [-1, 1], size=(n_out, 2)
    )
    gt_inlier = np.ones(n, bool)
    gt_inlier[out_idx] = False
    return pts, R, t, p1, p2_noisy, gt_inlier


def test_ransac_essential_inliers(rng):
    pts, R, t, p1, p2, gt = _scene(rng)
    key = jax.random.PRNGKey(648)
    res = ransac.ransac_essential(
        key, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
        threshold=1.5 / 450.0, num_hypotheses=512,
    )
    mask = np.asarray(res.inlier_mask)
    # all true inliers recovered, no planted outlier admitted
    assert mask[gt].mean() > 0.95
    assert mask[~gt].mean() < 0.1


def test_ransac_rotation_pure(rng):
    n = 80
    b1 = rng.normal(size=(n, 3))
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    b1[:, 2] = np.abs(b1[:, 2]) + 0.5
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    R = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray([0.03, 0.05, -0.02]))))
    b2 = b1 @ R.T
    bad = rng.choice(n, size=20, replace=False)
    b2[bad] = rng.normal(size=(20, 3))
    b2[bad] /= np.linalg.norm(b2[bad], axis=-1, keepdims=True)
    res = ransac.ransac_rotation(
        jax.random.PRNGKey(1), jnp.asarray(b1), jnp.asarray(b2),
        jnp.ones(n, bool), threshold=np.radians(1.0), num_hypotheses=256,
    )
    gt = np.ones(n, bool)
    gt[bad] = False
    mask = np.asarray(res.inlier_mask)
    assert mask[gt].all()
    np.testing.assert_allclose(np.asarray(res.model), R, atol=1e-6)


def test_ransac_pnp(rng):
    pts, R, t, p1, p2, gt = _scene(rng, n=100, outlier_frac=0.25)
    x_cam_pts = p2  # observations in cam2 of world points pts
    res = ransac.ransac_pnp(
        jax.random.PRNGKey(2), jnp.asarray(pts), jnp.asarray(x_cam_pts),
        jnp.ones(len(pts), bool), threshold=1.0 / 450.0, num_hypotheses=512,
    )
    model = np.asarray(res.model)
    np.testing.assert_allclose(model[:, :3], R, atol=1e-4)
    np.testing.assert_allclose(model[:, 3], t, atol=1e-4)
    mask = np.asarray(res.inlier_mask)
    assert mask[gt].mean() > 0.95 and mask[~gt].mean() < 0.1


def test_ransac_masked_points_never_sampled(rng):
    pts, R, t, p1, p2, gt = _scene(rng, n=64, outlier_frac=0.0)
    valid = np.ones(64, bool)
    valid[40:] = False
    p2_garbage = p2.copy()
    p2_garbage[40:] = 1e6  # must be ignored
    res = ransac.ransac_essential(
        jax.random.PRNGKey(3), jnp.asarray(p1), jnp.asarray(p2_garbage),
        jnp.asarray(valid), threshold=1.5 / 450.0, num_hypotheses=128,
    )
    mask = np.asarray(res.inlier_mask)
    assert not mask[40:].any()
    assert mask[:40].mean() > 0.9


def test_imu_parsac_pnp_static_dynamic(rng):
    """Dynamic points (coherent wrong motion) must be excluded when the IMU
    prior supports the static model."""
    pts, R, t, p1, p2, gt = _scene(rng, n=150, outlier_frac=0.0)
    # make 40 points "dynamic": consistent secondary motion
    dyn = np.arange(110, 150)
    p2 = p2.copy()
    p2[dyn] += np.array([0.08, 0.03])
    gt = np.ones(150, bool)
    gt[dyn] = False
    lens = np.full(150, 10.0)
    res = parsac.imu_parsac_pnp(
        jax.random.PRNGKey(4), jnp.asarray(pts), jnp.asarray(p2),
        jnp.ones(150, bool), jnp.asarray(lens),
        jnp.asarray(R), jnp.asarray(t),  # perfect IMU prior
        parsac.default_bin_confidences(), threshold=1.5 / 450.0,
        dynamic_prob=0.15, num_hypotheses=512,
    )
    assert bool(res.prior_ok)
    mask = np.asarray(res.inlier_mask)
    assert mask[gt].mean() > 0.9
    assert mask[dyn].mean() < 0.1
    model = np.asarray(res.model)
    np.testing.assert_allclose(model[:, :3], R, atol=1e-3)


def test_imu_parsac_gate_failure(rng):
    """A wildly wrong IMU prior must trip the gate: identity + all-inliers
    (reference imu_parsac.h:66-69)."""
    pts, R, t, p1, p2, gt = _scene(rng, n=100, outlier_frac=0.0)
    R_bad = np.asarray(lie.quat_to_matrix(lie.expmap(jnp.asarray([1.5, 1.0, 0.5]))))
    t_bad = np.array([50.0, 50.0, 50.0])
    res = parsac.imu_parsac_pnp(
        jax.random.PRNGKey(5), jnp.asarray(pts), jnp.asarray(p2),
        jnp.ones(100, bool), jnp.full((100,), 5.0),
        jnp.asarray(R_bad), jnp.asarray(t_bad),
        parsac.default_bin_confidences(), threshold=1.5 / 450.0,
        dynamic_prob=0.15, num_hypotheses=128,
    )
    assert not bool(res.prior_ok)
    np.testing.assert_allclose(np.asarray(res.model)[:, :3], np.eye(3))
    assert np.asarray(res.inlier_mask).all()


def test_parsac_essential_bin_confidences(rng):
    pts, R, t, p1, p2, gt = _scene(rng, n=200, outlier_frac=0.2)
    res = parsac.parsac_essential(
        jax.random.PRNGKey(6), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(200, bool), parsac.default_bin_confidences(),
        threshold=1.5 / 450.0, num_hypotheses=512,
    )
    conf = np.asarray(res.bin_confidences)
    assert conf.shape == (400,)
    assert (conf >= 0).all() and (conf <= 1 + 1e-9).all()
    mask = np.asarray(res.inlier_mask)
    assert mask[gt].mean() > 0.9


def test_poisson_disk_spacing(rng):
    n = 300
    pts = rng.uniform(0, 400, size=(n, 2))
    acc = np.asarray(
        poisson_disk.poisson_disk_filter(
            jnp.asarray(pts), jnp.ones(n, bool), min_distance=20.0,
            width=400.0, height=400.0,
        )
    )
    kept = pts[acc]
    assert len(kept) > 10
    d = np.linalg.norm(kept[:, None] - kept[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 20.0 - 1e-9


def test_poisson_disk_preset(rng):
    pts = np.array([[100.0, 100.0], [105.0, 100.0], [150.0, 150.0]])
    acc = np.asarray(
        poisson_disk.poisson_disk_filter(
            jnp.asarray(pts), jnp.ones(3, bool), min_distance=20.0,
            width=400.0, height=400.0, preset_count=1,
        )
    )
    assert acc[0]  # preset always kept
    assert not acc[1]  # too close to preset
    assert acc[2]
