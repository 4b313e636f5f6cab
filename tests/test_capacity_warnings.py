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


def _tiny_calib():
    import jax.numpy as jnp

    from rd_vio_tpu.estimation import factors as F

    return builders.CalibArrays(
        ext=F.Extrinsics(
            q_bc=jnp.asarray([1.0, 0, 0, 0]), p_bc=jnp.zeros(3),
            q_bi=jnp.asarray([1.0, 0, 0, 0]), p_bi=jnp.zeros(3),
        ),
        sqrt_inv_cov2=jnp.eye(2), cov_w=jnp.eye(3) * 1e-4,
        cov_a=jnp.eye(3) * 1e-2, cov_bg=jnp.eye(3) * 1e-6,
        cov_ba=jnp.eye(3) * 1e-4, K=np.diag([400.0, 400.0, 1.0]),
    )


def test_match_clamp_warns_at_landmark_cap(caplog):
    """update_track_status's per-keyframe match clamp (VERDICT r3 item 9)
    must warn when more 2D-2D matches exist than caps.L — unit-level on a
    handcrafted two-frame map (the check only runs after a positive dynamic
    judgement, which clean synthetic scenes rarely produce)."""
    from rd_vio_tpu.models.map import Frame, Map
    from rd_vio_tpu.models.sliding_window_tracker import SlidingWindowTracker

    cfg = Config()
    cfg.parsac_flag = True
    cfg.parsac_keyframe_check_size = 1
    cfg.ransac_hypotheses = 32
    caps = builders.Caps(W=13, L=24, O=128, Fi=8, R=16, IMU=16, IMU_KF=64)
    rng = np.random.default_rng(648)
    n = 60  # > caps.L = 24 matches
    b = rng.normal(size=(n, 3)) * [0.3, 0.3, 0.0] + [0, 0, 1.0]
    b /= np.linalg.norm(b, axis=-1, keepdims=True)

    m = Map()
    f1, f2 = Frame(0.0), Frame(0.1)
    f1.append_keypoints(b)
    f2.append_keypoints(b + rng.normal(size=b.shape) * 1e-3)
    m.attach_frame(f1)
    m.attach_frame(f2)
    for k in range(n):
        t = m.get_track(f1, k, create=True)
        m.add_keypoint(t, f2, k)
    swt = SlidingWindowTracker(m, cfg, _tiny_calib(), caps)
    with caplog.at_level(logging.WARNING):
        swt.update_track_status()
    assert "update_track_status" in caplog.text, (
        "2D-2D match clamp did not warn at caps.L=24"
    )


def test_pending_truncation_warns(caplog):
    """track_landmark's pending-track truncation (VERDICT r3 item 9) warns
    when more untriangulated tracks are visible than caps.L — unit-level, on
    a handcrafted map (the e2e path rarely accumulates that many pending
    tracks in one keyframe)."""
    from rd_vio_tpu.models.map import Frame, Map
    from rd_vio_tpu.models.sliding_window_tracker import SlidingWindowTracker

    cfg = Config()
    caps = builders.Caps(W=13, L=8, O=128, Fi=8, R=16, IMU=16, IMU_KF=64)
    calib = _tiny_calib()
    m = Map()
    f = Frame(0.0)
    n = 20  # > caps.L = 8 untriangulated tracks
    f.append_keypoints(np.tile([0.0, 0.0, 1.0], (n, 1)))
    m.attach_frame(f)
    for k in range(n):
        m.get_track(f, k, create=True)
    swt = SlidingWindowTracker(m, cfg, calib, caps)
    with caplog.at_level(logging.WARNING):
        pending = swt._select_pending(f)
    assert len(pending) == caps.L
    assert "track_landmark" in caplog.text
