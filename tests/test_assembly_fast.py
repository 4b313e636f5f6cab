"""The SoA fast-lane spec assembly (builders.window_reproj_arrays /
marg_reproj_arrays / _assemble_validation_fast — VERDICT r4 item 3) must
select exactly the factors the reference's per-track logic selects.

Oracle: an independent in-test reimplementation of the tuple-style selection
straight from the obs dicts (reference refine_window :226-337 /
marginalization_factor.h:237-283), compared as multisets (the fast lane is
frame-major; factor order is immaterial to the solves)."""

import numpy as np
import pytest

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.map import (
    FT_KEYFRAME, TB_STATIC, TB_TRIANGULATED, TB_VALID,
)
from rd_vio_tpu.models.odometry import Odometry

CAPS = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)


@pytest.fixture(scope="module")
def steady_swt():
    seq = synthetic.generate(duration=5.0, n_landmarks=900, max_keypoints=120)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    odo = Odometry(cfg, SyntheticBackend(seq), caps=CAPS)
    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    # stop mid-steady-state (the very end of a sequence can be degenerate:
    # a final validation pass may have trashed most victim-anchored tracks)
    n_frames = 0
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
            n_frames += 1
            if n_frames >= 70:
                break
    swt = odo.frontend.swt
    assert swt is not None and swt.map.frame_num > 5
    swt.drain_pending()  # exact host mirror for the oracle comparison
    return odo, swt


def _factor_set(pa, n_valid=None):
    n = int(pa.o_val.sum()) if n_valid is None else n_valid
    rows = []
    for k in range(len(pa.o_val)):
        if not pa.o_val[k]:
            continue
        rows.append((int(pa.o_tgt[k]), int(pa.o_ref[k]), int(pa.o_lm[k]),
                     tuple(np.round(pa.o_zr[k], 12)),
                     tuple(np.round(pa.o_zt[k], 12))))
    return sorted(rows)


def _oracle_window_factors(swt, frames, frames_by_id, spec):
    m = swt.map
    wslot = {f.id: i for i, f in enumerate(frames)}
    kf_fids = {f.id for f in frames if f.tag(FT_KEYFRAME)}
    lm_slot = {t.id: s for s, t in enumerate(spec.opt_tracks[:CAPS.L])}
    bits = TB_VALID | TB_STATIC | TB_TRIANGULATED
    pend = {
        t.id for t in spec.opt_tracks
        if not (t.store.flags[t.row] & TB_TRIANGULATED)
    }
    out = []
    for f in frames:
        for k, tid in enumerate(f.track_ids):
            if tid < 0 or int(tid) not in m.tracks:
                continue
            t = m.tracks[int(tid)]
            fl = int(t.store.flags[t.row])
            if not ((fl & bits) == bits or t.id in pend):
                continue
            aid = t.first_frame_id()
            if aid == f.id or aid not in kf_fids:
                continue
            ls = lm_slot.get(t.id)
            if ls is None:
                continue
            anchor = frames_by_id[aid]
            ka = t.obs.get(aid)
            kt = t.obs.get(f.id)
            if ka is None or kt is None:
                continue
            out.append((wslot[f.id], wslot[aid], ls,
                        tuple(np.round(anchor.bearings[ka], 12)),
                        tuple(np.round(f.bearings[kt], 12))))
    return sorted(out)


def test_window_assembly_matches_oracle(steady_swt):
    odo, swt = steady_swt
    m = swt.map
    frames = list(m.frames)
    frames_by_id = {f.id: f for f in m.all_frames()}
    pending = swt._select_pending(frames[-1])
    spec = swt._window_spec(frames, frames_by_id, pending=pending)
    assert spec.reproj_arrays is not None and len(spec.reproj_arrays.tgt) > 10
    pa, lm_slot = builders._assemble(spec, CAPS, swt.calib)
    got = _factor_set(pa)
    want = _oracle_window_factors(swt, frames, frames_by_id, spec)
    assert got == want
    # landmark slots align with opt_tracks order
    for s, t in enumerate(spec.opt_tracks[:CAPS.L]):
        assert lm_slot[t.id] == s


def _oracle_marg_factors(swt, frames, frames_by_id, spec):
    wslot = {f.id: i for i, f in enumerate(frames)}
    lm_slot = {t.id: s for s, t in enumerate(spec.opt_tracks[:CAPS.L])}
    fid_set = {f.id for f in frames}
    out = []
    for t in spec.opt_tracks[:CAPS.L]:
        aid = t.first_frame_id()
        anchor = frames_by_id[aid]
        ka = t.obs.get(aid)
        for fid, kk in t.obs.items():
            if fid == aid or fid not in fid_set:
                continue
            out.append((wslot[fid], wslot[aid], lm_slot[t.id],
                        tuple(np.round(anchor.bearings[ka], 12)),
                        tuple(np.round(frames_by_id[fid].bearings[kk], 12))))
    return sorted(out)


def test_marg_assembly_matches_oracle(steady_swt):
    odo, swt = steady_swt
    m = swt.map
    frames = list(m.frames)
    frames_by_id = {f.id: f for f in m.all_frames()}
    spec = swt._marg_spec(frames, frames_by_id, require_valid=True)
    pa, _ = builders._assemble(spec, CAPS, swt.calib)
    got = _factor_set(pa)
    want = _oracle_marg_factors(swt, frames, frames_by_id, spec)
    assert got == want
    assert len(got) > 0


def test_validation_assembly_matches_ref(steady_swt):
    odo, swt = steady_swt
    m = swt.map
    st = m.store
    frames = list(m.frames)
    frames_by_id = {f.id: f for f in m.all_frames()}
    wslot = {f.id: i for i, f in enumerate(frames)}
    all_tids = np.fromiter(m.tracks, np.int64, len(m.tracks))
    tri = (st.flags[st.rows_of(all_tids)] & TB_TRIANGULATED) != 0
    tracks_v = [m.tracks[int(t)] for t in all_tids[tri]]
    assert len(tracks_v) > 20
    lm_w = {t.id: s for s, t in enumerate(tracks_v[:64])}
    tri_idx = {t.id: s for s, t in enumerate(tracks_v[:7])}
    Lv, Ov = 2 * CAPS.L, CAPS.O
    fast = builders._assemble_validation_fast(
        tracks_v, frames_by_id, wslot, lm_w, swt.calib, Lv, Ov, tri_idx)
    ref = builders._assemble_validation_ref(
        tracks_v, frames_by_id, wslot, lm_w, swt.calib, Lv, Ov,
        tri_idx_of_tid=tri_idx)
    for key in ("a_slot", "a_qc", "a_pc", "z0", "lmw", "tri_idx",
                "invd_h", "has", "trunc", "fxy"):
        np.testing.assert_allclose(fast[key], ref[key], err_msg=key)
    # observations: same multiset of (track, slot, bearing)
    def obs_set(va):
        return sorted(
            (int(va["o_ti"][k]), int(va["o_slot"][k]),
             tuple(np.round(va["o_z"][k], 12)))
            for k in range(len(va["o_val"])) if va["o_val"][k]
        )
    assert obs_set(fast) == obs_set(ref)
