"""The EXPERIMENTAL async keyframe path (sliding_window_keyframe_async=True)
must keep tracking end-to-end: the fused keyframe step dispatches without a
blocking fetch, chains its localize anchor from the previous subwindow
solve's device states, and applies results (states, track verdicts, the
window slide) through the ordered async FIFO one frame later.

Quality note (BASELINE.md round-5): the one-frame-late verdict application
measurably degrades ATE on the synthetic suite (0.001 -> ~0.3 m), which is
why the flag defaults to False. This test pins the MACHINERY — dispatch,
chain-shape gating, deferred slide with the pinned count, pool-restricted
verdict application — with a correspondingly loose accuracy bound, so the
path cannot silently rot while it awaits a root-cause."""

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils.trajectory import ate_rmse

CAPS = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)


def test_async_keyframe_tracks():
    seq = synthetic.generate(duration=5.0, n_landmarks=900, max_keypoints=120)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    cfg.sliding_window_keyframe_async = True
    odo = Odometry(cfg, SyntheticBackend(seq), caps=CAPS)
    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    est_t, est_p = [], []
    n_async = [0]

    swt_holder = []
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
            swt = odo.frontend.swt
            if swt is not None and not swt_holder:
                swt_holder.append(swt)
                orig = swt._keyframe_dispatch_async

                def counted(*a, **kw):
                    n_async[0] += 1
                    return orig(*a, **kw)

                swt._keyframe_dispatch_async = counted
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None and (not est_t or ls[0] != est_t[-1]):
                    est_t.append(ls[0])
                    est_p.append(ls[2])
    odo.close()

    assert n_async[0] >= 3, "async keyframe dispatch never engaged"
    assert len(est_t) > 40, "async keyframe path lost tracking"
    # window invariant survived the deferred slides
    swt = swt_holder[0]
    assert swt.map.frame_num <= cfg.sliding_window_size + 1
    gt_by_t = {round(tt, 6): p for tt, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(tt, 6)] for tt in est_t])
    ate = ate_rmse(np.asarray(est_p), gt)
    # LOOSE bound: the known one-frame-late-verdict degradation sits ~0.3 m;
    # anything beyond 0.6 means the machinery itself broke
    assert ate < 0.6, f"async keyframe machinery diverged: ATE {ate:.3f}"
