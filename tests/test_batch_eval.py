"""Batch-sequence evaluation harness over two synthetic sequences."""

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils import batch_eval


def _job(name, seed):
    seq = synthetic.generate(duration=5.0, n_landmarks=1200, max_keypoints=150,
                             seed=seed)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)

    def make():
        return Odometry(cfg, SyntheticBackend(seq), caps=caps)

    events = []
    for i, t in enumerate(seq.t_imu):
        events.append(("imu", t, seq.gyro[i], seq.accel[i]))
    for i, t in enumerate(seq.t_frame):
        events.append(("frame", t, i))
    events.sort(key=lambda e: (e[1], 0 if e[0] == "frame" else 1))

    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    return (name, make, events, lambda t: gt_by_t[round(t, 6)])


def test_batch_two_sequences():
    jobs = [_job("seq_a", 648), _job("seq_b", 999)]
    results = batch_eval.run_batch(jobs, parallel=False)
    assert set(results) == {"seq_a", "seq_b"}
    summary = batch_eval.summarize(results)
    assert summary["sequences"] == 2
    for r in results.values():
        assert r.n_tracked > 30, (r.name, r.n_tracked)
        assert r.ate is not None and r.ate < 0.1, (r.name, r.ate)
