"""Threaded pipeline mode (reference THREADING=ON, handler.cpp:35-50): the
feature-tracker and frontend run in worker threads with bounded queues. Every
ingested frame must still be estimated (bounded backpressure, no drops), the
trajectory must match ground truth like the synchronous mode, and shutdown
must be clean."""

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils.trajectory import ate_rmse


def test_threaded_matches_ground_truth():
    seq = synthetic.generate(duration=8.0, n_landmarks=1200, max_keypoints=150)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)

    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )

    with Odometry(cfg, SyntheticBackend(seq), caps=caps, threaded=True) as odo:
        for t, kind, i in events:
            if kind == 1:
                odo.add_motion(t, seq.gyro[i], seq.accel[i])
            else:
                odo.add_frame(t, i)
        odo.join()  # drain both pipeline stages
        assert odo.state() == 1, "never reached tracking"

        # every frame processed: the SWT saw the full sequence (its newest
        # mirrored frame is the final one)
        ls = odo.handler.get_latest_state()
        assert ls is not None
        # the last estimated timestamp is within the final few frames
        assert ls[0] >= seq.t_frame[-3]

        # trajectory accuracy equivalent to the synchronous mode
        swt = odo.frontend.swt
        est_t, est_p = [], []
        for f in swt.map.frames:
            est_t.append(f.t)
            est_p.append(f.p)
            for s in f.subframes:
                est_t.append(s.t)
                est_p.append(s.p)
        gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
        gt, est = [], []
        for t, p in zip(est_t, est_p):
            k = round(t, 6)
            if k in gt_by_t:
                gt.append(gt_by_t[k])
                est.append(p)
        assert len(est) > 8
        err = ate_rmse(np.asarray(est), np.asarray(gt))
        assert err < 0.05, f"threaded ATE {err:.4f} m too large"

    # close() is idempotent
    odo.close()
