"""Capacity hygiene (round-3 VERDICT item 8): every fixed-capacity break in
the pipeline must warn instead of silently truncating. Runs a short synthetic
sequence with deliberately undersized Caps and asserts the truncation
warnings fire (and the pipeline degrades gracefully rather than crashing)."""

import logging

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry


def test_judge_track_status_warns_at_landmark_cap(caplog):
    seq = synthetic.generate(duration=4.0, n_landmarks=1200, max_keypoints=150)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.parsac_flag = True
    cfg.parsac_dynamic_probability = 0.15
    cfg.parsac_threshold = 1.0
    cfg.ransac_hypotheses = 128
    # L far below the ~150 triangulated tracks the sequence produces
    caps = builders.Caps(W=13, L=48, O=512, Fi=16, R=128, IMU=64, IMU_KF=384)
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps)

    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    states = []
    with caplog.at_level(logging.WARNING):
        for t, kind, i in events:
            if kind == 1:
                odo.add_motion(t, seq.gyro[i], seq.accel[i])
            else:
                odo.add_frame(t, i)
                states.append(odo.state())

    assert 1 in states, "pipeline never reached tracking"
    text = caplog.text
    assert ("exceed caps.L" in text) or ("budget exhausted" in text), (
        "no capacity warning fired despite undersized caps"
    )
