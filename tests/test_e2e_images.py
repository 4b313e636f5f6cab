"""M3 end-to-end test on REAL PIXELS: rendered images -> CLAHE -> GFTT ->
pyramidal LK -> full VIO pipeline. The complete test_euroc-equivalent path
with the synthetic renderer standing in for the dataset."""

import numpy as np
import pytest

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.datasets.renderer import SequenceRenderer
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.image_backend import JaxImageBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module", params=[True, False],
                ids=["device_loop", "host_loop"])
def image_run(request):
    # excitation=0.05: visual-inertial scale needs acceleration to be
    # observable (the base trajectory is near-constant-velocity; with pixel
    # noise the init's scale LS collapses toward the min-norm solution).
    # n_landmarks=900: at 1500 the mean blob spacing (~11 px) puts several
    # equal-amplitude blobs in every 21x21 LK window, deforming patches with
    # parallax — measured 30-frame drift 1.7 px vs 0.08 px at 900.
    seq = synthetic.generate(duration=7.0, n_landmarks=900, max_keypoints=150,
                             excitation=0.05)
    rend = SequenceRenderer(seq, image_size=(320, 240))
    cfg = Config()
    cfg.camera_intrinsic = rend.K
    cfg.camera_resolution = (320, 240)
    cfg.feature_tracker_min_keypoint_distance = 12.0
    cfg.feature_tracker_max_keypoint_detection = 120
    cfg.ransac_hypotheses = 128
    # True: device-resident frontend loop (ops/frontend_loop, one-frame-stale
    # host bookkeeping); False: legacy per-frame dispatch+fetch path
    cfg.feature_tracker_device_loop = request.param
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)
    backend = JaxImageBackend(cfg, kp_cap=256)
    odo = Odometry(cfg, backend, caps=caps)

    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    est_t, est_p, states = [], [], []
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, rend.render(i))
            states.append(odo.state())
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None:
                    est_t.append(ls[0])
                    est_p.append(ls[2])
    return seq, np.asarray(est_t), np.asarray(est_p), states


def test_image_pipeline_tracks(image_run):
    seq, est_t, est_p, states = image_run
    assert 1 in states, "image pipeline never initialized"
    first = states.index(1)
    frac_tracking = np.mean([s == 1 for s in states[first:]])
    assert frac_tracking > 0.9, f"tracking unstable ({frac_tracking:.2f})"


def test_image_pipeline_accuracy(image_run):
    seq, est_t, est_p, states = image_run
    assert len(est_p) > 30
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(t, 6)] for t in est_t])
    err = ate_rmse(est_p, gt)
    # round-2 frontend: sub-pixel GFTT (quadratic refinement on the Harris
    # response) + sharper rendered blobs + observable-scale trajectory give
    # cm-level ATE on real pixels (measured 0.013 m; was 0.3-0.45 m)
    assert err < 0.05, f"ATE {err:.3f} m too large for the image pipeline"
