"""M5 tests: landmark-sharded distributed Schur BA on the virtual 8-device CPU
mesh must match the single-device solver (SURVEY.md §4.5)."""

import numpy as np
import jax
import jax.numpy as jnp

from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.estimation import ba
from rd_vio_tpu.estimation.state import ES_SIZE, retract
from rd_vio_tpu.parallel import dist_ba
from tests import helpers

W = 6


def _problem():
    seq = synthetic.generate(duration=6.0, n_landmarks=500, max_keypoints=100)
    states, invd, pb, n_lm, n_obs = helpers.build_window_problem(
        seq, f0=10, W=W, L_max=192, O_max=1024
    )
    pb = pb._replace(
        opt_pose=pb.opt_pose.at[0].set(False),
        opt_motion=pb.opt_motion.at[0].set(False),
    )
    return states, invd, pb


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device():
    states_gt, invd_gt, pb = _problem()
    rng = np.random.default_rng(5)
    d = np.zeros((W, ES_SIZE))
    d[1:, 0:3] = rng.standard_normal((W - 1, 3)) * 0.01
    d[1:, 3:6] = rng.standard_normal((W - 1, 3)) * 0.03
    states0 = retract(states_gt, jnp.asarray(d))
    invd0 = jnp.maximum(invd_gt * 1.05, 1e-3)

    mesh = dist_ba.make_vio_mesh(8)
    invd_s, pb_s, _ = dist_ba.relayout_for_sharding(invd0, pb, 8)
    invd_dev, pb_dev = dist_ba.shard_problem(mesh, invd_s, pb_s)
    s_dist, invd_dist, cost_dist = dist_ba.solve_ba_sharded(
        states0, invd_dev, pb_dev, mesh, max_iterations=8
    )

    # single-device reference on the SAME relaid-out problem
    res = ba.solve_ba(states0, invd_s, pb_s, max_iterations=8)

    np.testing.assert_allclose(
        np.asarray(s_dist.p), np.asarray(res.states.p), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(s_dist.q), np.asarray(res.states.q), atol=1e-8
    )
    opt = np.asarray(pb_s.opt_lm)
    np.testing.assert_allclose(
        np.asarray(invd_dist)[opt], np.asarray(res.inv_depth)[opt], atol=1e-8
    )
    # and both converge towards ground truth
    p_err = np.linalg.norm(np.asarray(s_dist.p) - np.asarray(states_gt.p), axis=-1)
    assert p_err.max() < 5e-3


def test_relayout_preserves_problem():
    """The relaid-out problem must describe the same optimization: identical
    cost at the same state."""
    states, invd, pb = _problem()
    c0 = float(ba.compute_cost(states, invd, pb))
    invd_s, pb_s, _ = dist_ba.relayout_for_sharding(invd, pb, 8)
    c1 = float(ba.compute_cost(states, invd_s, pb_s))
    assert abs(c0 - c1) < 1e-9 * max(1.0, abs(c0))
