"""M5 end-to-end: the full pipeline with the keyframe BA running on the
8-device landmark-sharded mesh (in-the-loop distributed Schur)."""

import numpy as np
import pytest

from rd_vio_tpu.parallel import dist_ba
from rd_vio_tpu.utils.trajectory import ate_rmse
from tests.test_e2e_synthetic import _run_pipeline


def test_pipeline_with_sharded_refine():
    import jax

    assert len(jax.devices()) == 8
    seq, est_t, est_p, states, odo = _run_pipeline(duration=6.0)
    swt = odo.frontend.swt
    assert swt is not None

    # switch the live tracker to the distributed solver and keep tracking
    from rd_vio_tpu.datasets import synthetic
    seq2 = synthetic.generate(duration=8.0, n_landmarks=1200, max_keypoints=150)

    mesh = dist_ba.make_vio_mesh(8)
    swt.dist_mesh = mesh
    # run a couple of keyframe refinements through the sharded path
    n_before = swt.map.frame_num
    swt.refine_window()
    f = swt.map.get_frame(swt.map.frame_num - 1)
    assert np.isfinite(f.p).all() and np.isfinite(f.q).all()

    # trajectory should still be consistent with ground truth afterwards
    gt_by_t = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(t, 6)] for t in est_t])
    assert ate_rmse(np.asarray(est_p), gt) < 0.05
