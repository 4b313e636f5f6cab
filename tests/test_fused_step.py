"""The fused localize+subwindow device program must match the sequential
two-solve path (localize -> host round trip -> subwindow refine) on live
problems captured from the synthetic pipeline.

This guards the on-device chaining in
builders._fused_localize_subwindow_jit (the per-frame hot path: one dispatch
+ one fetch instead of two solve/fetch sequences)."""

import numpy as np
import jax

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry


def test_fused_matches_sequential(monkeypatch):
    captured = []
    orig = builders.solve_localize_subwindow

    def spy(spec_loc, spec_sub, j_slot, calib, caps, dtype=None,
            max_iterations=10, prev_states=None, loc_ip_prev=-1,
            sub_prev=None):
        res, lm_slot = orig(spec_loc, spec_sub, j_slot, calib, caps,
                            dtype=dtype, max_iterations=max_iterations,
                            prev_states=prev_states, loc_ip_prev=loc_ip_prev,
                            sub_prev=sub_prev)
        if len(captured) < 4:
            # sequential reference: replicate the device-resident chaining
            # through the HOST (write prev states into the frame objects),
            # then standalone localize -> host round trip -> subwindow solve
            saved_states = {}

            def _save(f):
                if f.id not in saved_states:
                    saved_states[f.id] = (f.q, f.p, f.v, f.bg, f.ba)

            ph = jax.device_get(prev_states) if prev_states is not None \
                else None
            anchor = spec_loc.imu_prior[0][0]
            fj_loc = spec_loc.frames[0]
            if ph is not None and loc_ip_prev >= 0:
                _save(anchor)
                _save(fj_loc)
                anchor.q = np.asarray(ph.q[loc_ip_prev], np.float64)
                anchor.p = np.asarray(ph.p[loc_ip_prev], np.float64)
                anchor.v = np.asarray(ph.v[loc_ip_prev], np.float64)
                builders.predict_frame(anchor, fj_loc, calib, caps.IMU)
            if ph is not None and sub_prev is not None:
                for si, f in enumerate(spec_sub.frames):
                    sp = int(sub_prev[si])
                    if sp >= 0:
                        _save(f)
                        f.q = np.asarray(ph.q[sp], np.float64)
                        f.p = np.asarray(ph.p[sp], np.float64)
                        f.v = np.asarray(ph.v[sp], np.float64)
                        f.bg = np.asarray(ph.bg[sp], np.float64)
                        f.ba = np.asarray(ph.ba[sp], np.float64)
            try:
                res_loc, _ = builders.solve_spec(
                    spec_loc, calib, caps, dtype=dtype,
                    max_iterations=max_iterations,
                )
                sl = jax.device_get(res_loc.states)
                fj = spec_sub.frames[j_slot]
                _save(fj)
                fj.q, fj.p, fj.v = sl.q[0], sl.p[0], sl.v[0]
                fj.bg, fj.ba = sl.bg[0], sl.ba[0]
                res_seq, _ = builders.solve_spec(
                    spec_sub, calib, caps, dtype=dtype,
                    max_iterations=max_iterations,
                )
            finally:
                by_id = {f.id: f for f in spec_sub.frames}
                by_id[anchor.id] = anchor
                by_id[fj_loc.id] = fj_loc
                for fid, s in saved_states.items():
                    f = by_id[fid]
                    f.q, f.p, f.v, f.bg, f.ba = s
            captured.append((jax.device_get(res.states),
                             jax.device_get(res_seq.states),
                             len(spec_sub.frames)))
        return res, lm_slot

    monkeypatch.setattr(builders, "solve_localize_subwindow", spy)
    # also patch the symbol imported by the tracker module namespace: the
    # tracker calls through builders.<name>, so the module patch suffices

    seq = synthetic.generate(duration=4.0, n_landmarks=900, max_keypoints=120)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps)

    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
        if len(captured) >= 4:
            break

    assert captured, "pipeline never took the fused subframe path"
    for s_fused, s_seq, n in captured:
        # both paths run the same two solves; the only divergence is where the
        # chained state crosses (device vs host) in the solve dtype
        np.testing.assert_allclose(s_fused.p[:n], s_seq.p[:n], atol=5e-4)
        np.testing.assert_allclose(s_fused.q[:n], s_seq.q[:n], atol=5e-4)
        np.testing.assert_allclose(s_fused.v[:n], s_seq.v[:n], atol=5e-3)
