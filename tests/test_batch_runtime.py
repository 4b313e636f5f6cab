"""Batched lockstep runtime (rd_vio_tpu.batch): N sequences through vmapped
device programs must track and match single-sequence quality.

The per-sequence semantics are the single-sequence pipeline's (BatchSWT only
changes WHERE the two steady-state programs execute); the assertions compare
the batched runtime's per-sequence ATE against a single-sequence reference
run of the same scene."""

import numpy as np
import pytest

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils.trajectory import ate_rmse

CAPS = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)
DURATION = 6.0
SEEDS = (648, 655)


def _make(seed):
    seq = synthetic.generate(duration=DURATION, n_landmarks=1200,
                             max_keypoints=150, seed=seed)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    return cfg, seq


def _ate(seq, est):
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    pts = [(p, gt_by_t[round(t, 6)]) for t, p in est if round(t, 6) in gt_by_t]
    est_p = np.stack([a for a, _ in pts])
    gt_p = np.stack([b for _, b in pts])
    return ate_rmse(est_p, gt_p)


@pytest.fixture(scope="module")
def batched_run():
    from rd_vio_tpu.batch import run_sequences_lockstep

    pairs = [_make(s) for s in SEEDS]
    configs = [c for c, _ in pairs]
    seqs = [s for _, s in pairs]
    backends = [SyntheticBackend(s) for s in seqs]
    n_frames, est, stamps, kf_flushes = run_sequences_lockstep(
        configs, backends, seqs, caps=CAPS
    )
    assert kf_flushes[-1] >= 3, "lockstep run never reached batched steady"
    return seqs, n_frames, est


def test_batched_tracks_all_sequences(batched_run):
    seqs, n_frames, est = batched_run
    assert n_frames >= 100
    for i, seq in enumerate(seqs):
        assert len(est[i]) > 50, f"sequence {i} never tracked steadily"


def test_batched_ate_matches_single(batched_run):
    seqs, _, est = batched_run
    for i, seq in enumerate(seqs):
        # single-sequence reference on the same scene
        cfg, _ = _make(SEEDS[i])
        odo = Odometry(cfg, SyntheticBackend(seq), caps=CAPS)
        events = sorted(
            [(t, 1, k) for k, t in enumerate(seq.t_imu)]
            + [(t, 0, k) for k, t in enumerate(seq.t_frame)]
        )
        ref = []
        for t, kind, k in events:
            if kind == 1:
                odo.add_motion(t, seq.gyro[k], seq.accel[k])
            else:
                odo.add_frame(t, k)
                if odo.state() == 1:
                    ls = odo.handler.get_latest_state()
                    if ls is not None and (not ref or ls[0] != ref[-1][0]):
                        ref.append((ls[0], ls[2]))
        odo.close()
        ate_single = _ate(seq, ref)
        ate_batched = _ate(seq, est[i])
        # identical math modulo batched-linalg kernel noise; both must sit
        # at synthetic-oracle accuracy and within 2x + slack of each other
        assert ate_batched < 0.01, (i, ate_batched)
        assert ate_batched < 2.0 * ate_single + 2e-3, (
            i, ate_batched, ate_single,
        )
