"""Config.window_solver_dtype = "float64" restores the all-double window
solve (the reference's precision) through the same fused keyframe programs.

Small capacities keep the extra f64 executables cheap to compile."""

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils.trajectory import ate_rmse


def test_f64_window_solver_tracks():
    seq = synthetic.generate(duration=4.0, n_landmarks=700, max_keypoints=90)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 64
    cfg.window_solver_dtype = "float64"
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

    assert 1 in states, "never reached tracking"
    first = states.index(1)
    assert all(s == 1 for s in states[first:]), "tracking was lost"
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(t, 6)] for t in est_t])
    assert ate_rmse(np.asarray(est_p), gt) < 0.05


def _soak_run(dtype: str, duration: float = 60.0):
    """One long-horizon synthetic run; returns (times, est, gt, prior)."""
    seq = synthetic.generate(duration=duration, n_landmarks=900,
                             max_keypoints=70)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 64
    cfg.feature_tracker_max_keypoint_detection = 70
    cfg.window_solver_dtype = dtype
    caps = builders.Caps(W=13, L=96, O=512, P=384, Fi=16, R=64,
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
    assert 1 in states, f"{dtype}: never reached tracking"
    first = states.index(1)
    assert all(s == 1 for s in states[first:]), \
        f"{dtype}: tracking lost mid-soak (re-bootstrap = divergence)"
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(t, 6)] for t in est_t])
    prior = odo.frontend.swt.prior
    return np.asarray(est_t), np.asarray(est_p), gt, prior


def test_f32_window_solve_60s_soak():
    """SURVEY.md §7(f) long-horizon numerical hygiene: over a 60 s sequence
    (hundreds of marginalizations) the default f32+sqrt-prior window solve
    must not drift from the all-f64 solve, and the marginalization prior must
    stay finite/well-posed."""
    from rd_vio_tpu.utils.host import fetch

    t32, p32, gt32, prior32 = _soak_run("float32")
    t64, p64, gt64, prior64 = _soak_run("float64")

    ate32 = ate_rmse(p32, gt32)
    ate64 = ate_rmse(p64, gt64)
    # absolute quality holds over the long horizon...
    assert ate32 < 0.05, f"f32 soak ATE {ate32:.4f}"
    assert ate64 < 0.05, f"f64 soak ATE {ate64:.4f}"
    # ...and f32 does not drift away from f64 (same-timestamp divergence)
    common = sorted(set(np.round(t32, 6)) & set(np.round(t64, 6)))
    by32 = {round(t, 6): p for t, p in zip(t32, p32)}
    by64 = {round(t, 6): p for t, p in zip(t64, p64)}
    div = np.array([np.linalg.norm(by32[t] - by64[t]) for t in common])
    assert div.max() < 0.05, f"f32-vs-f64 divergence {div.max():.4f} m"

    # prior conditioning: sqrt factor finite, nonzero, gauge rows intact
    for prior in (prior32, prior64):
        sq = np.asarray(fetch(prior.sqrt_inv_cov))
        assert np.isfinite(sq).all()
        assert np.abs(sq).max() > 0
