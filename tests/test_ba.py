"""M1 tests: factor Jacobians by finite difference, BA convergence on a
synthetic window, fixed-state masks, marginalization algebra (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.estimation import ba, factors as F, marginalization
from rd_vio_tpu.estimation.state import ES_SIZE, FrameStates, retract
from tests import helpers

W = 6


def _problem(pixel_noise=0.0, seed=648):
    seq = synthetic.generate(duration=6.0, pixel_noise=pixel_noise, seed=seed,
                             n_landmarks=500, max_keypoints=100)
    return helpers.build_window_problem(seq, f0=10, W=W, L_max=192, O_max=1024)


def test_gt_residuals_near_zero():
    states, invd, pb, n_lm, n_obs = _problem()
    assert n_lm > 30 and n_obs > 100
    r_v, _, _ = ba.linearize_reprojection(states, invd, pb)
    rv = np.asarray(r_v)[np.asarray(pb.reproj.valid)]
    assert np.abs(rv).max() < 1e-6  # perfect observations
    r_m, _ = ba.linearize_imu(states, pb)
    # numeric-differentiation IMU: small but nonzero whitened residual
    assert np.abs(np.asarray(r_m)).max() < 5.0
    cost = float(ba.compute_cost(states, invd, pb))
    assert np.isfinite(cost)


def _fd_check(linearize, states, invd, pb, rows_valid, atol=1e-5):
    """Directional FD check of d(residual)/d(window delta)."""
    rng = np.random.default_rng(0)
    d = rng.standard_normal((W, ES_SIZE)) * 1e-6
    r0, J = linearize(states, invd, pb)[:2] if invd is not None else linearize(states, pb)
    # J may be (N, r, D); flatten rows
    Jf = np.asarray(J).reshape(-1, W * ES_SIZE)
    r0f = np.asarray(r0).reshape(-1)
    s_plus = retract(states, jnp.asarray(d))
    if invd is not None:
        r1 = linearize(s_plus, invd, pb)[0]
    else:
        r1 = linearize(s_plus, pb)[0]
    r1f = np.asarray(r1).reshape(-1)
    pred = Jf @ d.reshape(-1)
    m = np.asarray(rows_valid)
    np.testing.assert_allclose(
        (r1f - r0f)[m], pred[m], atol=atol * 1e-6 / 1e-6, rtol=2e-4
    )


def test_reprojection_jacobian_fd():
    states, invd, pb, *_ = _problem()
    valid2 = np.repeat(np.asarray(pb.reproj.valid), 2)
    _fd_check(
        lambda s, i, p: ba.linearize_reprojection(s, i, p),
        states, invd, pb, valid2,
    )


def test_imu_jacobian_fd():
    states, invd, pb, *_ = _problem()
    valid15 = np.repeat(np.asarray(pb.imu.valid), 15)
    _fd_check(lambda s, p: ba.linearize_imu(s, p), states, None, pb, valid15)


def test_prior_jacobian_fd():
    states, invd, pb, *_ = _problem()
    # perturb away from the linearization point so the FD is informative
    rng = np.random.default_rng(1)
    states = retract(states, jnp.asarray(rng.standard_normal((W, ES_SIZE)) * 0.01))
    valid = np.ones(W * ES_SIZE, bool)
    _fd_check(lambda s, p: ba.linearize_prior(s, p), states, None, pb, valid)


def test_reprojection_invdepth_jacobian_fd():
    states, invd, pb, *_ = _problem()
    r0, _, Jl = ba.linearize_reprojection(states, invd, pb)
    eps = 1e-7
    r1, _, _ = ba.linearize_reprojection(states, invd + eps, pb)
    fd = (np.asarray(r1) - np.asarray(r0)) / eps
    lm = np.asarray(pb.reproj.lm)
    valid = np.asarray(pb.reproj.valid)
    np.testing.assert_allclose(
        fd[valid], np.asarray(Jl)[valid], atol=1e-3, rtol=1e-4
    )


def test_ba_converges_from_perturbation():
    states_gt, invd_gt, pb, n_lm, _ = _problem()
    rng = np.random.default_rng(7)
    d = np.zeros((W, ES_SIZE))
    d[1:, 0:3] = rng.standard_normal((W - 1, 3)) * 0.02  # rotations
    d[1:, 3:6] = rng.standard_normal((W - 1, 3)) * 0.05  # positions
    d[1:, 6:9] = rng.standard_normal((W - 1, 3)) * 0.05  # velocities
    states0 = retract(states_gt, jnp.asarray(d))
    invd0 = invd_gt * (1.0 + 0.2 * rng.standard_normal(invd_gt.shape) * np.asarray(pb.opt_lm))
    invd0 = jnp.maximum(invd0, 1e-3)
    # gauge: fix frame 0 pose + motion (over a 0.3 s window velocity/accel-bias
    # trade-off is weakly observable — in the full system the marginalization
    # prior pins it; here frame 0 plays that role)
    pb = pb._replace(
        opt_pose=pb.opt_pose.at[0].set(False),
        opt_motion=pb.opt_motion.at[0].set(False),
    )
    res = ba.solve_ba(states0, invd0, pb, max_iterations=20)
    assert float(res.cost) < float(res.initial_cost) * 1e-3
    p_err = np.linalg.norm(np.asarray(res.states.p) - np.asarray(states_gt.p), axis=-1)
    assert p_err.max() < 5e-3, p_err
    lm_mask = np.asarray(pb.opt_lm)
    invd_err = np.abs(np.asarray(res.inv_depth) - np.asarray(invd_gt))[lm_mask]
    assert invd_err.max() < 1e-3


def test_ba_respects_fixed_states():
    states_gt, invd_gt, pb, *_ = _problem()
    rng = np.random.default_rng(8)
    d = np.zeros((W, ES_SIZE))
    d[1:, 3:6] = rng.standard_normal((W - 1, 3)) * 0.03
    states0 = retract(states_gt, jnp.asarray(d))
    pb = pb._replace(
        opt_pose=jnp.asarray([False] + [True] * (W - 1)),
        opt_motion=jnp.asarray([False] + [True] * (W - 1)),
    )
    res = ba.solve_ba(states0, invd_gt, pb, max_iterations=5)
    np.testing.assert_allclose(np.asarray(res.states.q[0]), np.asarray(states0.q[0]))
    np.testing.assert_allclose(np.asarray(res.states.p[0]), np.asarray(states0.p[0]))
    np.testing.assert_allclose(np.asarray(res.states.v[0]), np.asarray(states0.v[0]))


def test_marginalization_prior_algebra():
    """S^T S must equal the Schur complement of the accumulated info matrix,
    and S^T infovec its gradient (defining property of the sqrt prior)."""
    states, invd, pb, *_ = _problem()
    # put some residual into the system so infovec is non-trivial
    rng = np.random.default_rng(3)
    states_p = retract(states, jnp.asarray(rng.standard_normal((W, ES_SIZE)) * 0.003))

    prior_new = marginalization.marginalize_frame0(states_p, invd, pb)

    # independent NumPy reconstruction of the expected info system
    r_p, J_p = ba.linearize_prior(states_p, pb)
    r_m, Jc_m = ba.linearize_imu(states_p, pb)
    r_v, Jc_v, Jl_v = ba.linearize_reprojection(states_p, invd, pb)
    wv = np.asarray(pb.reproj.valid, float)[:, None]
    Jv = (np.asarray(Jc_v) * wv[..., None]).reshape(-1, W * 15)
    rv = (np.asarray(r_v) * wv).reshape(-1)
    Jlv = (np.asarray(Jl_v) * wv).reshape(-1)
    wm = np.asarray(pb.imu.valid, float)[:, None]
    Jm = (np.asarray(Jc_m) * wm[..., None]).reshape(-1, W * 15)
    rm = (np.asarray(r_m) * wm).reshape(-1)
    J_all = np.concatenate([np.asarray(J_p), Jm, Jv])
    r_all = np.concatenate([np.asarray(r_p), rm, rv])
    info = J_all.T @ J_all
    vec = J_all.T @ r_all
    lm_rows = np.repeat(np.asarray(pb.reproj.lm), 2)
    L = invd.shape[0]
    Hll = np.zeros(L)
    bl = np.zeros(L)
    Hcl = np.zeros((L, W * 15))
    np.add.at(Hll, lm_rows, Jlv * Jlv)
    np.add.at(bl, lm_rows, Jlv * rv)
    np.add.at(Hcl, lm_rows, Jlv[:, None] * Jv)
    good = Hll > 1e-12
    inv_Hll = np.where(good, 1.0 / np.maximum(Hll, 1e-300), 0.0)
    info -= Hcl.T @ (Hcl * inv_Hll[:, None])
    vec -= Hcl.T @ (bl * inv_Hll)
    C = info[:15, :15]
    B = info[15:, :15]
    P = np.linalg.pinv(C, rcond=1e-10)
    info_rest = info[15:, 15:] - B @ P @ B.T
    vec_rest = vec[15:] - B @ P @ vec[:15]

    S = np.asarray(prior_new.sqrt_inv_cov)
    iv = np.asarray(prior_new.infovec)
    D_rest = (W - 1) * 15
    # eigen clipping only drops ~zero modes; compare the reconstructions
    np.testing.assert_allclose(
        (S.T @ S)[:D_rest, :D_rest], info_rest, atol=1e-4 * max(1.0, np.abs(info_rest).max())
    )
    np.testing.assert_allclose(
        (S.T @ iv)[:D_rest], vec_rest, atol=1e-5 * max(1.0, np.abs(vec_rest).max())
    )
    # shifted linearization points
    np.testing.assert_allclose(
        np.asarray(prior_new.q_lin[: W - 1]), np.asarray(states_p.q[1:]), atol=0
    )
