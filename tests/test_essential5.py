"""Nistér/Stewénius 5-point essential solver (ops/essential5, host):
exactness on minimal samples, robustness under RANSAC with outliers, and
the initializer integration flag."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from rd_vio_tpu.ops.essential5 import ransac_essential_5pt, solve_essential_5pt


def _pair(rng, n, R, t):
    pts = rng.uniform([-1, -1, 3], [1, 1, 8], size=(n, 3))
    p1 = pts[:, :2] / pts[:, 2:]
    x2 = (pts - t) @ R.T
    p2 = x2[:, :2] / x2[:, 2:]
    return p1, p2


def test_exact_minimal_solve():
    rng = np.random.default_rng(0)
    hits = 0
    for _ in range(20):
        R = Rotation.from_rotvec(rng.normal(scale=0.3, size=3)).as_matrix()
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        p1, p2 = _pair(rng, 5, R, t)
        h1 = np.concatenate([p1, np.ones((5, 1))], 1)
        h2 = np.concatenate([p2, np.ones((5, 1))], 1)
        best = min(
            (np.abs(np.einsum("ni,ij,nj->n", h2, E, h1)).max()
             for E in solve_essential_5pt(p1, p2)),
            default=np.inf,
        )
        hits += best < 1e-9
    assert hits == 20


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    R = Rotation.from_rotvec([0.05, -0.1, 0.02]).as_matrix()
    t = np.array([0.6, 0.1, -0.2])
    t /= np.linalg.norm(t)
    p1, p2 = _pair(rng, 150, R, t)
    out = np.zeros(150, bool)
    out[rng.choice(150, 30, replace=False)] = True
    p2[out] += rng.normal(scale=0.1, size=(30, 2))
    E, mask = ransac_essential_5pt(
        rng, p1, p2, np.ones(150, bool), threshold=2.0 / 400.0, num_samples=64
    )
    assert E is not None
    assert mask[~out].mean() > 0.95
    assert mask[out].mean() < 0.2


def test_degenerate_too_few_points():
    rng = np.random.default_rng(2)
    E, mask = ransac_essential_5pt(
        rng, np.zeros((4, 2)), np.zeros((4, 2)), np.ones(4, bool), 0.01
    )
    assert E is None and not mask.any()


def test_initializer_5pt_flag_tracks():
    """Full pipeline bootstrap with the 5-point path enabled."""
    from rd_vio_tpu.config import Config
    from rd_vio_tpu.datasets import synthetic
    from rd_vio_tpu.models import builders
    from rd_vio_tpu.models.feature_tracker import SyntheticBackend
    from rd_vio_tpu.models.odometry import Odometry
    from rd_vio_tpu.utils.trajectory import ate_rmse

    seq = synthetic.generate(duration=5.0, n_landmarks=700, max_keypoints=90,
                             excitation=0.05, pixel_noise=0.3)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 64
    cfg.initializer_use_5pt = True
    caps = builders.Caps(W=13, L=128, O=768, P=512, Fi=16, R=64,
                         IMU=64, IMU_KF=384)
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps)
    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    est_t, est_p, states = [], [], []
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
            states.append(odo.state())
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None:
                    est_t.append(ls[0])
                    est_p.append(ls[2])
    odo.join()
    assert 1 in states, "5pt init never reached tracking"
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(t, 6)] for t in est_t])
    assert ate_rmse(np.asarray(est_p), gt) < 0.08
