"""The fully-fused sliding-keyframe program (localize + triangulate + window
BA + validation + marginalization in one dispatch) must produce the same
trajectory as the two-program sequence it replaced (localize+triangulate,
then window-solve+validate+marginalize)."""

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.models.sliding_window_tracker import SlidingWindowTracker


def _run(duration=5.0):
    seq = synthetic.generate(duration=duration, n_landmarks=900, max_keypoints=120)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    # program-equivalence test: compare the fused program against the
    # two-program sequence under the SAME (synchronous) scheduling — the
    # round-5 async FIFO scheduling is covered by the e2e suites
    cfg.sliding_window_keyframe_async = False
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps)
    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    est = []
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None:
                    est.append((ls[0], ls[2]))
    return est


def test_keyframe_fused_matches_sequential(monkeypatch):
    est_fused = _run()

    def sequential(self, spec_loc, frame_j):
        # the path the fused program replaced: localize+triangulate program,
        # then the window-tail program (solve + validate + marginalize)
        self.track_landmark(spec_loc=spec_loc)
        m = self.map
        frames = list(m.frames)
        frames_by_id = {f.id: f for f in m.all_frames()}
        spec = self._window_spec(frames, frames_by_id)
        self._refine_window_fused_tail(spec, frames, frames_by_id)

    monkeypatch.setattr(SlidingWindowTracker, "_keyframe_fused", sequential)
    est_seq = _run()

    assert len(est_fused) == len(est_seq)
    p_f = np.stack([p for _, p in est_fused])
    p_s = np.stack([p for _, p in est_seq])
    # identical problems up to the precision at which the chained quantities
    # cross the device/host boundary in each formulation
    np.testing.assert_allclose(p_f, p_s, atol=2e-3)
