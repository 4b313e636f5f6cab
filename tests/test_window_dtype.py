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
