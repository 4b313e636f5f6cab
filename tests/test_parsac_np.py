"""Host twin of PARSAC / IMU-PARSAC (ops/parsac_np) must make the same
decisions as the device programs (ops/parsac) on planted static/dynamic
scenes — the PRNG streams differ, so equivalence is decision-level."""

import numpy as np
import jax
import jax.numpy as jnp

from rd_vio_tpu.ops import parsac, parsac_np


def _pnp_scene(rng, n=200, n_dyn=40, noise=0.0):
    """3D points + normalized observations from a known camera, with a block
    of 'dynamic' points moved coherently (the RD-VIO failure mode)."""
    from scipy.spatial.transform import Rotation

    x_w = rng.uniform([-3, -3, 3], [3, 3, 9], size=(n, 3))
    R_cw = Rotation.from_rotvec([0.04, -0.06, 0.02]).as_matrix()
    t_cw = np.array([0.1, 0.05, -0.2])
    dyn = np.zeros(n, bool)
    dyn[rng.choice(n, n_dyn, replace=False)] = True
    x_obs = x_w.copy()
    x_obs[dyn] += np.array([0.8, 0.3, 0.0])  # coherent object motion
    x_c = x_obs @ R_cw.T + t_cw
    p = x_c[:, :2] / x_c[:, 2:]
    if noise:
        p += rng.normal(scale=noise, size=p.shape)
    lens = rng.integers(1, 30, size=n).astype(float)
    valid = np.ones(n, bool)
    return x_w, p, valid, lens, R_cw, t_cw, dyn


def test_imu_parsac_host_vs_device_labels():
    rng = np.random.default_rng(0)
    x_w, p, valid, lens, R_cw, t_cw, dyn = _pnp_scene(rng)
    key = jax.random.PRNGKey(9)
    thr = 1.0 / 400.0  # ~1 px at f=400
    kw = dict(threshold=thr, dynamic_prob=0.15, norm_scale=1.0,
              num_hypotheses=256)
    conf0 = parsac.default_bin_confidences()
    host = parsac_np.imu_parsac_pnp_np(
        key, x_w, p, valid, lens, R_cw, t_cw, np.asarray(conf0), **kw
    )
    dev = parsac.imu_parsac_pnp(
        key, jnp.asarray(x_w), jnp.asarray(p), jnp.asarray(valid),
        jnp.asarray(lens), jnp.asarray(R_cw), jnp.asarray(t_cw), conf0, **kw
    )
    hm = np.asarray(host.inlier_mask)
    dm = np.asarray(dev.inlier_mask)
    assert bool(host.prior_ok) and bool(dev.prior_ok)
    # static points labeled inliers, dynamic points outliers — both paths
    assert hm[~dyn].mean() > 0.95 and dm[~dyn].mean() > 0.95
    assert hm[dyn].mean() < 0.1 and dm[dyn].mean() < 0.1
    assert (hm == dm).mean() > 0.95
    # posterior bin confidences broadly agree (same winning-model geometry)
    np.testing.assert_allclose(
        np.asarray(host.bin_confidences), np.asarray(dev.bin_confidences),
        atol=0.35,
    )


def test_imu_parsac_prior_gate_fallback():
    """A wildly wrong IMU prior must degrade to identity + all-inliers on
    both paths (reference imu_parsac.h:170-198)."""
    rng = np.random.default_rng(1)
    x_w, p, valid, lens, R_cw, t_cw, _ = _pnp_scene(rng, n_dyn=0)
    bad_R = np.eye(3)
    bad_t = np.array([50.0, 50.0, 50.0])
    key = jax.random.PRNGKey(2)
    kw = dict(threshold=1.0 / 400.0, dynamic_prob=0.15, norm_scale=1.0,
              num_hypotheses=128)
    conf0 = parsac.default_bin_confidences()
    host = parsac_np.imu_parsac_pnp_np(
        key, x_w, p, valid, lens, bad_R, bad_t, np.asarray(conf0), **kw
    )
    dev = parsac.imu_parsac_pnp(
        key, jnp.asarray(x_w), jnp.asarray(p), jnp.asarray(valid),
        jnp.asarray(lens), jnp.asarray(bad_R), jnp.asarray(bad_t), conf0, **kw
    )
    assert not bool(host.prior_ok) and not bool(dev.prior_ok)
    assert np.asarray(host.inlier_mask).all()
    assert np.asarray(dev.inlier_mask)[valid].all()


def test_essential_chain_host_vs_device():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    K, N = 3, 160
    P1 = np.zeros((K, N, 2))
    P2 = np.zeros((K, N, 2))
    VAL = np.zeros((K, N), bool)
    EN = np.array([True, False, True])
    outs = []
    for k in range(K):
        pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(N, 3))
        R = Rotation.from_rotvec(rng.normal(scale=0.03, size=3)).as_matrix()
        t = rng.normal(scale=0.2, size=3)
        p2c = (pts - t) @ R.T
        out = np.zeros(N, bool)
        out[rng.choice(N, 25, replace=False)] = True
        p2c[out] += rng.normal(scale=1.0, size=(25, 3))
        P1[k] = pts[:, :2] / pts[:, 2:]
        P2[k] = p2c[:, :2] / np.maximum(p2c[:, 2:], 0.1)
        VAL[k] = True
        outs.append(out)
    key = jax.random.PRNGKey(4)
    thr = 3.0 / 400.0
    hm, hc = parsac_np.parsac_essential_chain_np(
        key, P1, P2, VAL, EN, np.full(400, 0.5), thr, num_hypotheses=256
    )
    dm, dc = parsac.parsac_essential_chain(
        key, jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(VAL),
        jnp.asarray(EN), jnp.full(400, 0.5), thr, num_hypotheses=256
    )
    dm = np.asarray(dm)
    for k in range(K):
        if not EN[k]:
            assert not hm[k].any()  # host skips disabled checks outright
            continue
        # decision quality per path (PRNG streams differ, and PARSAC's
        # coverage score can pick different near-tie models, so per-point
        # agreement is only asserted loosely)
        for m in (hm[k], dm[k]):
            assert m[~outs[k]].mean() > 0.6   # inliers kept
            assert m[outs[k]].mean() < 0.25   # planted outliers rejected
    # first check starts from the identical flat prior on both paths
    assert (hm[0] == dm[0]).mean() > 0.9
