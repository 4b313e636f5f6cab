"""M4 test: dynamic scene end-to-end with IMU-PARSAC enabled.

The IMU-PARSAC/PARSAC kernels' static/dynamic labeling is unit-tested in
test_ransac.py (planted coherent outliers are excluded, the IMU gate trips on
bad priors). Here we assert the system-level wiring: the full pipeline runs
the judge/update machinery every frame in a scene with moving landmarks,
keeps tracking continuously, and stays within a bounded ATE — and parsac=on
never degrades the trajectory vs parsac=off on the same scene.

(Note: per-point random motion is mostly caught by the windowed-BA validation
path before PARSAC sees it — matching reference behavior where
judge_track_status's separation gates only fire on persistent coherent
outliers. A crafted rigid-object scenario for label-level e2e assertions is a
follow-up; see dynamic_mode="rigid" in datasets/synthetic.py.)
"""

import numpy as np
import pytest

from tests.test_e2e_synthetic import _run_pipeline
from rd_vio_tpu.utils.trajectory import ate_rmse


def _ate(run):
    seq, est_t, est_p, states, odo = run
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(t, 6)] for t in est_t])
    return ate_rmse(est_p, gt)


@pytest.fixture(scope="module")
def dynamic_runs():
    on = _run_pipeline(duration=8.0, parsac=True, n_dynamic=60, seed=11,
                       dynamic_velocity=1.0)
    off = _run_pipeline(duration=8.0, parsac=False, n_dynamic=60, seed=11,
                        dynamic_velocity=1.0)
    return on, off


def test_tracks_through_dynamic_scene(dynamic_runs):
    on, off = dynamic_runs
    seq, est_t, est_p, states, odo = on
    assert 1 in states
    first = states.index(1)
    frac = np.mean([s == 1 for s in states[first:]])
    assert frac > 0.95, f"tracking unstable in dynamic scene ({frac:.2f})"


def test_dynamic_bounded_error(dynamic_runs):
    on, off = dynamic_runs
    err_on = _ate(on)
    err_off = _ate(off)
    assert err_on < 0.6, f"ATE {err_on:.3f} m too large with dynamic objects"
    # parsac must never make things worse
    assert err_on <= err_off * 1.5 + 1e-3, (err_on, err_off)
