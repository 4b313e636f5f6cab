"""Sliding-window tracker: per-frame localization, the RR/RT keyframe state
machine, windowed VI-BA with marginalization, and IMU-PARSAC dynamic-track
rejection.

Behavioral reference: /root/reference/src/rdvio/src/sliding_window_tracker.cpp
(mirror_frame :29-78, track :80-99, localize_newframe :101-125, manage_keyframe
:127-202 including the ASCII-diagrammed RR/RT cases, track_landmark :204-224,
refine_window :226-337, slide_window :339-347, refine_subwindow :349-444,
judge_track_status :557-718, update_track_status :720-769).

Host Python drives the branchy state machine; all numerics (preintegration,
PARSAC, triangulation, BA, marginalization) run as jitted device programs via
models/builders.py. The marginalization prior lives over the keyframe slots of
`map.frames` — the keyframe insertion cases above always append after the
prior-covered prefix, so slot-aligned priors stay consistent (see
estimation/marginalization.py).
"""

from __future__ import annotations

import logging

from typing import Optional

import numpy as np

from rd_vio_tpu.utils.host import asnp, fetch
import jax
import jax.numpy as jnp

from rd_vio_tpu.estimation import factors as F
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.map import (
    FT_KEYFRAME, FT_NO_TRANSLATION, Frame, Map, Track,
    TT_OUTLIER, TT_STATIC, TT_TRASH, TT_TRIANGULATED, TT_VALID,
)
from rd_vio_tpu.models.quat_np import q_to_R, qconj, qmul, qrot
from rd_vio_tpu.ops import parsac


class SlidingWindowTracker:
    def __init__(self, keyframe_map: Map, config, calib: builders.CalibArrays,
                 caps: builders.Caps, rng_key=None):
        import dataclasses

        self.map = keyframe_map
        self.config = config
        self.calib = calib
        self.caps = caps
        # small-solve profile: per-frame localization + subwindow refinement
        # carry no full window, so their state dimension stays tiny
        self.caps_fast = dataclasses.replace(
            caps, W=config.sliding_window_subframe_size + 6,
            O=256, L=64, P=768, Fi=12, Fp=2, R=caps.R,
        )
        # prior-free solves run in f32 (TPU-native linalg); the keyframe
        # window solve dtype is configurable (f32 default — the prior enters
        # in square-root form; marginalization itself stays f64)
        self._fast_dtype = jnp.dtype(config.fast_solver_dtype)
        self._window_dtype = jnp.dtype(
            getattr(config, "window_solver_dtype", "float64")
        )
        self.feature_tracking_map: Optional[Map] = None
        self.dist_mesh = None  # set to a parallel.dist_ba mesh for sharded BA
        self.prior: Optional[F.PriorFactor] = None
        # prior produced by the fused keyframe-tail program, consumed by the
        # matching slide_window() call
        self._pending_prior: Optional[F.PriorFactor] = None
        # deferred subwindow results: FIFO of (AsyncFetch, spec, lm_slot).
        # The per-frame subframe solve is dispatched + async-fetched; the
        # HOST mirror is refreshed opportunistically (drain_pending applies
        # completed fetches in order, blocking only to bound the queue at
        # depth 2) while the frame-to-frame state dependency chains on the
        # DEVICE (`_dev_sub`, round-4 estimator residency): the next solve's
        # initial states and prior anchor come from the previous solve's
        # device-resident result, so correctness never depends on the host
        # mirror being fresh. Host consumers (judge pose math, spec
        # constants, outputs) see a consistent <=2-frame-stale snapshot;
        # the keyframe path force-drains first (block=True).
        self._pending_subs = []
        # (FrameStates on device, {frame_id: slot}) of the last subwindow
        # solve; reset at every keyframe step (whose synchronous fetch
        # refreshes the host mirror exactly)
        self._dev_sub = None
        self.m_th = 3.0  # adaptive epipolar threshold (px)
        self.bin_conf_imu = parsac.default_bin_confidences()
        self.bin_conf_2d2d = parsac.default_bin_confidences()
        self._rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(config.random)
        self._host_seed_ctr = 0

    def _next_key(self):
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    def _next_seed(self) -> tuple:
        """Host-side seed material for the NumPy mask twins — deriving it
        from a JAX key forces a ~25 ms device sync per call (round 3)."""
        self._host_seed_ctr += 1
        return (self.config.random, self._host_seed_ctr)

    # ------------------------------------------------------------------
    def mirror_frame(self, ft_map: Map, frame_id: int):
        """Clone the newest FT frame into the SWT map, link tracks, accumulate
        skipped-frame IMU, preintegrate + predict (reference :29-78)."""
        keyframe = self.map.get_frame(self.map.frame_num - 1)
        new_frame_i = keyframe.subframes[-1] if keyframe.subframes else keyframe

        idx_i = ft_map.frame_index_by_id(new_frame_i.id)
        idx_j = ft_map.frame_index_by_id(frame_id)
        if idx_i is None or idx_j is None:
            return False

        old_i = ft_map.get_frame(idx_i)
        old_j = ft_map.get_frame(idx_j)
        curr = old_j.clone()
        # accumulate IMU of frames skipped between i and j
        dts = [curr.imu_dt]
        ws = [curr.imu_w]
        accs = [curr.imu_a]
        for index in range(idx_j - 1, idx_i, -1):
            fr = ft_map.get_frame(index)
            dts.insert(0, fr.imu_dt)
            ws.insert(0, fr.imu_w)
            accs.insert(0, fr.imu_a)
        curr.imu_dt = np.concatenate(dts)
        curr.imu_w = np.concatenate(ws)
        curr.imu_a = np.concatenate(accs)

        self.map.attach_frame(curr)

        # link tracks seen in both old_i and old_j into the SWT map
        # (vectorized pair matching via the FT store's row->keypoint map;
        # the linking itself mutates per pair)
        from rd_vio_tpu.models.map import TB_STATIC, TB_TRASH

        ft_st = ft_map.store
        k_of_row_j = np.full(ft_st.cap, -1, np.int64)
        rows_j = ft_st.rows_of(old_j.track_ids)
        jv = rows_j >= 0
        k_of_row_j[rows_j[jv]] = np.flatnonzero(jv)
        rows_i = ft_st.rows_of(old_i.track_ids)
        kj_arr = k_of_row_j[np.clip(rows_i, 0, None)]
        matched = (rows_i >= 0) & (kj_arr >= 0)
        ft_trash_clear = []
        for ki in np.flatnonzero(matched):
            ntr = self.map.get_track(new_frame_i, int(ki), create=True)
            self.map.add_keypoint(ntr, curr, int(kj_arr[ki]))
            # propagate trash/static into the FT track (reference :63-66)
            if not (ntr.tag(TT_TRASH) and not ntr.tag(TT_STATIC)):
                ft_trash_clear.append(rows_i[ki])
        if ft_trash_clear:
            ft_st.flags[np.asarray(ft_trash_clear)] &= ~TB_TRASH

        st = self.map.store
        tids = np.fromiter(self.map.tracks, np.int64, len(self.map.tracks))
        fl = st.flags[st.rows_of(tids)]
        doom = ((fl & TB_TRASH) != 0) & ((fl & TB_STATIC) == 0)
        self.map.prune_tracks(
            doomed=[self.map.tracks[int(t)] for t in tids[doom]]
        )

        builders.predict_frame(new_frame_i, curr, self.calib, self.caps.IMU)
        return True

    # ------------------------------------------------------------------
    def track(self) -> bool:
        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as _T

        # assemble the judge's state-independent inputs BEFORE draining the
        # deferred subwindow result: the drain is an async-fetch wait (~25 ms
        # tunnel round trip when stage 2 is saturated), and the assembly
        # (keypoint/landmark gathers) doesn't read the states it writes —
        # the only judge inputs touched by the drain are the subframe poses,
        # consumed after the drain in _judge_decide
        asm = None
        if self.config.parsac_flag:
            with _T.time("swt.judge_asm"):
                asm = self._judge_assemble()
        with _T.time("swt.drain_pending"):
            self.drain_pending(block=False)
        # re-predict the mirrored frame from the now-drained base state
        # (mirror_frame ran before the drain; its prediction used the
        # pre-refine subframe pose)
        m0 = self.map
        kf_i = m0.get_frame(m0.frame_num - 2)
        base = kf_i.subframes[-1] if kf_i.subframes else kf_i
        builders.predict_frame(base, m0.get_frame(m0.frame_num - 1),
                               self.calib, self.caps.IMU)
        if asm is not None:
            with _T.time("swt.judge"):
                judged = self._judge_decide(asm)
            if judged:
                with _T.time("swt.update_status"):
                    self.update_track_status()

        # the keyframe decision reads only tags and track counts — never the
        # localized pose — so it can run BEFORE the localization solve. For
        # the (common) subframe path this lets localize + subwindow refine run
        # as ONE fused device program with a single dispatch + fetch
        # (reference order :80-99 is localize -> manage -> refine; the solves
        # see identical problems either way).
        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as T

        if self._keyframe_decision():
            # the keyframe step consumes host states synchronously (window
            # spec assembly, marginalization bookkeeping): force-drain the
            # in-flight subwindow results and re-predict the new frame from
            # the now-exact base so the localization prior matches the
            # reference's (which localizes against fully refined states)
            with T.time("swt.kf.force_drain"):
                self.drain_pending()
            kf_i0 = self.map.get_frame(self.map.frame_num - 2)
            base0 = kf_i0.subframes[-1] if kf_i0.subframes else kf_i0
            builders.predict_frame(base0, self.map.get_frame(self.map.frame_num - 1),
                                   self.calib, self.caps.IMU)
            # capture the localization problem BEFORE the keyframe mutations
            # (reference order localize -> manage; the problem reads only
            # pre-manage structure and states, so capturing it here and
            # executing it fused with the rest of the step is equivalent)
            m = self.map
            frame_i = m.get_frame(m.frame_num - 2)
            if frame_i.subframes:
                frame_i = frame_i.subframes[-1]
            frame_j = m.get_frame(m.frame_num - 1)
            spec_loc = self._localize_spec(frame_i, frame_j)
            kf = self.manage_keyframe()
            if not kf:  # must survive python -O: misrouting here corrupts state
                raise RuntimeError(
                    "keyframe decision disagreed with manage_keyframe"
                )
            if (self.dist_mesh is None
                    and m.frame_num > self.config.sliding_window_size):
                # steady state: the ENTIRE keyframe step as one device
                # program (localize + triangulate + window BA + validation +
                # marginalization) — one dispatch, one fetch. A truthy
                # return means the subclass deferred the fetch-and-apply
                # tail (batched runtime continuation); the epilogue then
                # runs inside that continuation instead of here.
                with T.time("swt.keyframe_fused"):
                    deferred = self._keyframe_fused(spec_loc, frame_j)
                if not deferred:
                    self._finish_keyframe()
            else:
                with T.time("swt.localize_triangulate"):
                    self.track_landmark(spec_loc=spec_loc)
                with T.time("swt.refine_window"):
                    self.refine_window()
                self._finish_keyframe()
        else:
            keyframe_i = self.map.get_frame(self.map.frame_num - 2)
            keyframe_i.subframes.append(self.map.detach_frame(self.map.frame_num - 1))
            with T.time("swt.subwindow_fused"):
                self.refine_subwindow(fused_localize=True)
        return True

    def _finish_keyframe(self):
        """Keyframe-branch epilogue: slide the window and restart the device
        chain under the new keyframe (whose solve made the host mirror
        exact — or, in the batched runtime, whose continuation just applied
        the batched fetch)."""
        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as T

        with T.time("swt.marginalize"):
            self.slide_window()
        self._dev_sub = None

    # ------------------------------------------------------------------
    def _keyframe_decision(self) -> bool:
        """Pure-read mirror of manage_keyframe's branch outcomes
        (reference :127-202): True iff the new frame triggers the keyframe
        path (including the subframe-lift cases)."""
        m = self.map
        keyframe_i = m.get_frame(m.frame_num - 2)
        newframe_j = m.get_frame(m.frame_num - 1)

        if keyframe_i.subframes:
            last_sub_R = keyframe_i.subframes[-1].tag(FT_NO_TRANSLATION)
            new_R = newframe_j.tag(FT_NO_TRANSLATION)
            if last_sub_R and not new_R:
                return True  # [T]+[R..R] <- [T]: lift
            if not last_sub_R:
                if new_R:
                    return True  # [T]+[T..T] <- [R]: lift + re-parent
                if len(keyframe_i.subframes) >= self.config.sliding_window_subframe_size:
                    return True

        return (self._mapped_count(newframe_j)
                < self.config.sliding_window_force_keyframe_landmarks)

    def _mapped_count(self, frame: Frame) -> int:
        """Count of valid+triangulated+static tracks seen by `frame`
        (vectorized over the SoA store)."""
        from rd_vio_tpu.models.map import (
            TB_STATIC, TB_TRIANGULATED, TB_VALID,
        )

        st = self.map.store
        rows = st.rows_of(frame.track_ids)
        r = np.clip(rows, 0, None)
        bits = TB_VALID | TB_TRIANGULATED | TB_STATIC
        return int(np.count_nonzero(
            (rows >= 0) & ((st.flags[r] & bits) == bits)
        ))

    # ------------------------------------------------------------------
    def _select_tracks_of_frame(self, frame: Frame, bits, frames_by_id,
                                exclude_self: bool = True):
        """Vectorized per-frame track selection: keypoints whose track has
        all `bits` set and whose anchor frame is in frames_by_id (and is not
        the frame itself when exclude_self). Returns (kp_idxs, tracks,
        anchor_fids) — the SoA replacement for the per-keypoint
        get_track/all_tagged loops (VERDICT r3 item 3)."""
        st = self.map.store
        rows = st.rows_of(frame.track_ids)
        r = np.clip(rows, 0, None)
        sel = (rows >= 0) & ((st.flags[r] & bits) == bits)
        ff = st.first_fid[r]
        sel &= np.isin(ff, np.fromiter(frames_by_id, np.int64,
                                       len(frames_by_id)))
        if exclude_self:
            sel &= ff != frame.id
        idxs = np.flatnonzero(sel)
        tracks = [self.map.tracks[int(tid)] for tid in frame.track_ids[idxs]]
        return idxs, tracks, ff[idxs], r[idxs]

    def _localize_spec(self, frame_i: Frame, frame_j: Frame) -> builders.BASpec:
        """Per-frame PnP-style problem: preintegration prior + reprojection
        priors of static landmarks (reference :101-125)."""
        from rd_vio_tpu.models.map import (
            TB_STATIC, TB_TRIANGULATED, TB_VALID,
        )

        m = self.map
        frames_by_id = {f.id: f for f in m.all_frames()}
        _, tracks, afids, _ = self._select_tracks_of_frame(
            frame_j, TB_VALID | TB_TRIANGULATED | TB_STATIC, frames_by_id,
        )
        reproj_prior = [
            (frame_j, frames_by_id[int(aid)], t)
            for t, aid in zip(tracks, afids)
        ]
        imu_prior = [
            (frame_i, frame_j, (frame_j.imu_dt, frame_j.imu_w, frame_j.imu_a))
        ]
        return builders.BASpec(
            frames=[frame_j],
            fix_pose=[False], fix_motion=[False],
            opt_tracks=[], reproj=[], imu=[], rot=[],
            reproj_prior=reproj_prior, imu_prior=imu_prior,
        )

    def localize_newframe(self):
        """Standalone localization solve (keyframe path; reference :101-125)."""
        m = self.map
        frame_i = m.get_frame(m.frame_num - 2)
        if frame_i.subframes:
            frame_i = frame_i.subframes[-1]
        frame_j = m.get_frame(m.frame_num - 1)
        spec = self._localize_spec(frame_i, frame_j)
        res, lm_slot = builders.solve_spec(
            spec, self.calib, self.caps_fast, dtype=self._fast_dtype,
            max_iterations=self.config.solver_iteration_limit,
        )
        builders.apply_result(res, spec, lm_slot)

    # ------------------------------------------------------------------
    def manage_keyframe(self) -> bool:
        """RR/RT keyframe state machine (reference :127-202)."""
        m = self.map
        keyframe_i = m.get_frame(m.frame_num - 2)
        newframe_j = m.get_frame(m.frame_num - 1)

        if keyframe_i.subframes:
            last_sub = keyframe_i.subframes[-1]
            if last_sub.tag(FT_NO_TRANSLATION):
                if newframe_j.tag(FT_NO_TRANSLATION):
                    # [T]+[R..R] <- [R]: keep accumulating rotation subframes
                    pass
                else:
                    # [T]+[R..R] <- [T]: lift last R-subframe to keyframe
                    keyframe_i.subframes.pop()
                    last_sub.set_tag(FT_KEYFRAME, True)
                    m.attach_frame(last_sub, m.frame_num - 1)
                    newframe_j.set_tag(FT_KEYFRAME, True)
                    return True
            else:
                if newframe_j.tag(FT_NO_TRANSLATION):
                    # [T]+[T..T] <- [R]: lift last T-subframe to keyframe and
                    # re-parent the R-frame under it
                    lifted = keyframe_i.subframes.pop()
                    lifted.set_tag(FT_KEYFRAME, True)
                    lifted.subframes.append(m.detach_frame(m.frame_num - 1))
                    m.attach_frame(lifted)
                    return True
                else:
                    if len(keyframe_i.subframes) >= self.config.sliding_window_subframe_size:
                        newframe_j.set_tag(FT_KEYFRAME, True)
                        return True

        mapped = self._mapped_count(newframe_j)

        if mapped < self.config.sliding_window_force_keyframe_landmarks:
            newframe_j.set_tag(FT_KEYFRAME, True)
            return True
        keyframe_i.subframes.append(m.detach_frame(m.frame_num - 1))
        return False

    # ------------------------------------------------------------------
    def track_landmark(self, spec_loc=None):
        """Triangulate not-yet-triangulated tracks of the new keyframe
        (reference :204-224). With spec_loc, the pending localization solve is
        fused into the same device program (one dispatch + one fetch)."""
        m = self.map
        newframe = m.get_frame(m.frame_num - 1)
        frames_by_id = {f.id: f for f in m.all_frames()}
        pending = []
        for k in range(newframe.keypoint_num):
            t = m.get_track(newframe, k)
            if t is not None and not t.tag(TT_TRIANGULATED):
                pending.append(t)
        if spec_loc is not None:
            pts, ok = builders.solve_localize_triangulate(
                spec_loc, pending, frames_by_id, self.calib,
                self.caps_fast, self.caps, dtype=self._fast_dtype,
                max_iterations=self.config.solver_iteration_limit,
            )
            if not pending:
                return
        elif not pending:
            return
        else:
            pts, ok = builders.triangulate_tracks(
                pending, frames_by_id, self.calib, self.caps
            )
        for t, x, o in zip(pending, pts, ok):
            if o:
                builders.set_landmark_point(t, x, frames_by_id, self.calib)
                t.set_tag(TT_TRIANGULATED, True)
                t.set_tag(TT_VALID, True)
                t.set_tag(TT_STATIC, True)
                t.life = 1
            else:
                t.inv_depth = -1.0
                t.set_tag(TT_TRIANGULATED, False)
                t.set_tag(TT_VALID, False)

    # ------------------------------------------------------------------
    def _keyframe_imu_chain(self, frame_i: Frame, frame_j: Frame):
        """IMU data of frame_j prepended with frame_i's subframe data
        (reference :277-300)."""
        dts, ws, accs = [], [], []
        for sub in frame_i.subframes:
            dts.append(sub.imu_dt)
            ws.append(sub.imu_w)
            accs.append(sub.imu_a)
        dts.append(frame_j.imu_dt)
        ws.append(frame_j.imu_w)
        accs.append(frame_j.imu_a)
        return (np.concatenate(dts), np.concatenate(ws), np.concatenate(accs))

    def _window_spec(self, frames, frames_by_id, pending=()):
        """Full-window VI-BA problem (reference :226-337). `pending` tracks
        (not yet triangulated; the fully-fused keyframe step triangulates them
        in-program) are included with keyframe anchors; their factors are
        gated on-device by triangulation success."""
        from rd_vio_tpu.models.map import (
            TB_STATIC, TB_TRIANGULATED, TB_VALID,
        )

        m = self.map
        st = m.store
        pending_ids = set()

        # anchor gate: first frame is a WINDOW KEYFRAME (vectorized over the
        # whole track pool via the SoA store — VERDICT r3 item 3)
        kf_fids = np.fromiter(
            (f.id for f in frames if f.tag(FT_KEYFRAME)), np.int64,
        )
        all_tids = np.fromiter(m.tracks, np.int64, len(m.tracks))
        all_rows = st.rows_of(all_tids)
        bits = TB_VALID | TB_STATIC | TB_TRIANGULATED
        osel = ((st.flags[all_rows] & bits) == bits) \
            & np.isin(st.first_fid[all_rows], kf_fids)
        opt_tracks = [m.tracks[int(tid)] for tid in all_tids[osel]]
        opt_rows = [all_rows[osel]]
        for t in pending:
            anchor = frames_by_id.get(t.first_frame_id())
            if anchor is None or not anchor.tag(FT_KEYFRAME):
                continue
            opt_tracks.append(t)
            opt_rows.append(np.asarray([t.row], np.int64))
            pending_ids.add(t.id)
        opt_rows = np.concatenate(opt_rows)
        opt_invd = st.inv_depth[opt_rows]

        pend_row = np.zeros(st.cap, bool)
        if pending_ids:
            prw = st.rows_of(np.fromiter(pending_ids, np.int64,
                                         len(pending_ids)))
            pend_row[prw[prw >= 0]] = True

        # reprojection factors, frame-major over the SoA store (VERDICT r4
        # item 3 — the per-factor tuple loop was the bulk of kf assembly):
        # anchor slot/bearing resolved through per-row maps built once from
        # the window keyframes; factor order matches the former tuple loop
        # (frames outer, keypoint index inner)
        ra = builders.window_reproj_arrays(
            st, frames, kf_fids, bits, pend_row, opt_rows, self.caps.L,
        )

        imu = []
        for j in range(1, len(frames)):
            fi, fj = frames[j - 1], frames[j]
            chain = self._keyframe_imu_chain(fi, fj)
            fj.keyframe_imu = chain
            imu.append((fi, fj, chain, fi.bg.copy(), fi.ba.copy(), True))

        if self.prior is None:
            self.prior = F.initial_prior(
                self.caps.W, builders._frame_states(frames, self.caps.W)
            )

        return builders.BASpec(
            frames=frames,
            fix_pose=[False] * len(frames),
            fix_motion=[False] * len(frames),
            opt_tracks=opt_tracks,
            reproj=[], imu=imu, rot=[], prior=self.prior,
            reproj_arrays=ra, opt_invd=opt_invd,
        )

    def refine_window(self):
        """Full-window VI-BA (reference :226-337)."""
        m = self.map
        frames = list(m.frames)
        frames_by_id = {f.id: f for f in m.all_frames()}
        spec = self._window_spec(frames, frames_by_id)
        if self.dist_mesh is None and m.frame_num > self.config.sliding_window_size:
            # the window will slide right after this solve: run the whole
            # keyframe tail (solve + validation + marginalization) as one
            # fused device program — one dispatch, one fetch, prior stays
            # device-resident
            self._refine_window_fused_tail(spec, frames, frames_by_id)
            return
        if self.dist_mesh is not None:
            states, invd, pb, lm_slot = builders.build_problem(spec, self.calib, self.caps)
            # landmark-sharded distributed Schur BA (parallel/dist_ba.py)
            from rd_vio_tpu.parallel import dist_ba
            from rd_vio_tpu.utils.host import fetch

            n_sh = self.dist_mesh.shape[dist_ba.LM_AXIS]
            invd_s, pb_s, new_slot = dist_ba.relayout_for_sharding(invd, pb, n_sh)
            invd_dev, pb_dev = dist_ba.shard_problem(self.dist_mesh, invd_s, pb_s)
            s_out, invd_out, _cost = dist_ba.solve_ba_sharded(
                states, invd_dev, pb_dev, self.dist_mesh,
                max_iterations=self.config.solver_iteration_limit,
            )
            q, p, v, bg, ba_arr, invd_h = fetch(
                (s_out.q, s_out.p, s_out.v, s_out.bg, s_out.ba, invd_out)
            )
            for i, f in enumerate(spec.frames):
                f.q, f.p, f.v, f.bg, f.ba = q[i], p[i], v[i], bg[i], ba_arr[i]
            by_id = {t.id: t for t in spec.opt_tracks}
            for tid, old in lm_slot.items():
                t = by_id.get(tid)
                if t is not None:
                    t.inv_depth = float(invd_h[new_slot[old]])
        else:
            res, lm_slot = builders.solve_spec(
                spec, self.calib, self.caps, dtype=self._window_dtype,
                max_iterations=self.config.solver_iteration_limit,
            )
            builders.apply_result(res, spec, lm_slot)

        # post-solve landmark validation (reference :304-336)
        self._validate_landmarks()

    def _validate_landmarks(self):
        """Post-solve landmark validation (reference :304-336), vectorized:
        depth in (1e-3, 50] at every keyframe observation and mean pixel
        reprojection error < 3 px."""
        m = self.map
        Km = self.calib.K
        frames_by_id = {f.id: f for f in m.all_frames()}
        q_bc = self.calib.q_bc_h
        p_bc = self.calib.p_bc_h

        # per-frame camera poses (few frames)
        cam = {}
        for f in frames_by_id.values():
            qc, pc = f.get_pose(q_bc, p_bc)
            cam[f.id] = (q_to_R(qc), pc, f.tag(FT_KEYFRAME))

        tracks = [t for t in m.tracks.values() if t.tag(TT_TRIANGULATED)]
        for t in m.tracks.values():
            if not t.tag(TT_TRIANGULATED):
                t.inv_depth = -1.0

        # landmark world points (vectorized per track via anchor pose)
        obs_ti, obs_R, obs_p, obs_z = [], [], [], []
        tr_x = {}
        for ti, t in enumerate(tracks):
            aid = t.first_frame_id()
            if aid not in frames_by_id or t.inv_depth <= 0:
                tr_x[ti] = None
                continue
            Ra, pa, _ = cam[aid]
            z0 = frames_by_id[aid].bearings[t.obs[aid]]
            x = Ra @ (z0 / t.inv_depth) + pa
            tr_x[ti] = x
            for fid, k in t.obs.items():
                f = frames_by_id.get(fid)
                if f is None or not cam[fid][2]:
                    continue
                obs_ti.append(ti)
                obs_R.append(cam[fid][0])
                obs_p.append(cam[fid][1])
                obs_z.append(f.bearings[k])

        n_tracks = len(tracks)
        if obs_ti:
            ti_arr = asnp(obs_ti)
            R_arr = np.stack(obs_R)  # (N, 3, 3)
            p_arr = np.stack(obs_p)
            z_arr = np.stack(obs_z)
            x_arr = np.stack([
                tr_x[ti] if tr_x[ti] is not None else np.zeros(3) for ti in obs_ti
            ])
            y = np.einsum("nji,nj->ni", R_arr, x_arr - p_arr)  # R^T (x - p)
            depth_ok = (y[:, 2] > 1.0e-3) & (y[:, 2] <= 50)
            ys = y[:, :2] / np.maximum(y[:, 2:], 1e-12)
            zs = z_arr[:, :2] / z_arr[:, 2:]
            rpe = np.linalg.norm(
                (ys - zs) * [Km[0, 0], Km[1, 1]], axis=-1
            )
            sum_rpe = np.zeros(n_tracks)
            cnt = np.zeros(n_tracks)
            bad_depth = np.zeros(n_tracks, bool)
            np.add.at(sum_rpe, ti_arr, rpe)
            np.add.at(cnt, ti_arr, 1.0)
            np.logical_or.at(bad_depth, ti_arr, ~depth_ok)
            mean_rpe = sum_rpe / np.maximum(cnt, 1.0)
            for ti, t in enumerate(tracks):
                if tr_x[ti] is None:
                    t.set_tag(TT_VALID, False)
                else:
                    t.set_tag(TT_VALID, (not bad_depth[ti]) and mean_rpe[ti] < 3.0)
        else:
            for t in tracks:
                t.set_tag(TT_VALID, False)

        for t in m.tracks.values():
            if not t.tag(TT_VALID):
                t.set_tag(TT_TRASH, True)

    def _select_pending(self, newframe: Frame):
        """Not-yet-triangulated tracks of the new keyframe (reference
        track_landmark :204-224), vectorized over the SoA store and bounded
        at caps.L with a loud warning (VERDICT r3 item 9: silently dropped
        pending tracks would never be triangulated this keyframe)."""
        from rd_vio_tpu.models.map import TB_TRIANGULATED

        m = self.map
        st = m.store
        nrows = st.rows_of(newframe.track_ids)
        psel = (nrows >= 0) & (
            (st.flags[np.clip(nrows, 0, None)] & TB_TRIANGULATED) == 0
        )
        pending = [m.tracks[int(tid)] for tid in newframe.track_ids[psel]]
        if len(pending) > self.caps.L:
            logging.getLogger(__name__).warning(
                "track_landmark: %d pending tracks exceed caps.L=%d; "
                "overflow tracks deferred to a later keyframe (raise Caps.L)",
                len(pending), self.caps.L,
            )
            pending = pending[: self.caps.L]
        return pending

    def _keyframe_fused(self, spec_loc, frame_j):
        """Fully-fused sliding-keyframe step (see builders.solve_keyframe_fused):
        mirrors track_landmark + refine_window + _validate_landmarks + the
        device part of slide_window's first marginalization."""
        from rd_vio_tpu.models.map import TB_TRIANGULATED

        m = self.map
        st = m.store
        frames = list(m.frames)
        frames_by_id = {f.id: f for f in m.all_frames()}
        newframe = frames[-1]

        # pending tracks of the new keyframe (reference track_landmark
        # :204-224), vectorized over the SoA store
        pending = self._select_pending(newframe)
        pending_ids = {t.id for t in pending}

        spec_w = self._window_spec(frames, frames_by_id, pending=pending)
        all_tids = np.fromiter(m.tracks, np.int64, len(m.tracks))
        all_rows = st.rows_of(all_tids)
        tri_sel = (st.flags[all_rows] & TB_TRIANGULATED) != 0
        tracks_v = [m.tracks[int(tid)] for tid in all_tids[tri_sel]]
        tracks_v += pending
        spec_m = self._marg_spec(
            frames, frames_by_id, require_valid=False, pending_ids=pending_ids
        )

        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as T

        # async path (VERDICT r4 item 2): needs a live device chain for the
        # localize anchor at the steady caps_fast.W shape. Without one
        # (first steady keyframe; keyframe immediately after a keyframe,
        # whose chain states are caps.W-shaped and would compile a separate
        # program variant) fall through to the sync path — at those points
        # the host mirror is already exact and one fetch is paid rarely
        if (getattr(self.config, "sliding_window_keyframe_async", True)
                and self._dev_sub is not None
                and self._dev_sub[0].q.shape[0] == self.caps_fast.W):
            return self._keyframe_dispatch_async(
                spec_loc, frame_j, pending, pending_ids, spec_w, tracks_v,
                spec_m, frames_by_id,
            )

        with T.time("swt.kf.dispatch"):
            res, res_loc, lm_w, valid_dev, ok_dev, tri_dev, new_prior = (
                builders.solve_keyframe_fused(
                    spec_loc, pending, spec_w, tracks_v, spec_m, frames_by_id,
                    self.calib, self.caps, caps_loc=self.caps_fast,
                    dtype=self._window_dtype, loc_dtype=self._fast_dtype,
                    max_iterations=self.config.solver_iteration_limit,
                )
            )
        s = res.states
        sl = res_loc.states
        with T.time("swt.kf.fetch"):
            (q, p, v, bg, ba_, invd_h, lq, lp, lv, lbg, lba,
             valid_h, ok_h, tri_h) = fetch(
                (s.q, s.p, s.v, s.bg, s.ba, res.inv_depth,
                 sl.q, sl.p, sl.v, sl.bg, sl.ba, valid_dev, ok_dev, tri_dev)
            )
        # localize result (frame_j may be a subframe outside the window)
        frame_j.q, frame_j.p, frame_j.v = lq[0], lp[0], lv[0]
        frame_j.bg, frame_j.ba = lbg[0], lba[0]
        # window states + optimized inverse depths (vectorized store writes)
        for i, f in enumerate(spec_w.frames):
            f.q, f.p, f.v, f.bg, f.ba = q[i], p[i], v[i], bg[i], ba_[i]
        self._apply_kf_track_results(
            lm_w, invd_h, pending, pending_ids, ok_h, tri_h,
            tracks_v, valid_h,
        )
        self._pending_prior = new_prior  # consumed by slide_window

    def _keyframe_dispatch_async(self, spec_loc, frame_j, pending,
                                 pending_ids, spec_w, tracks_v, spec_m,
                                 frames_by_id):
        """Round-5 async keyframe path (VERDICT r4 item 2): one dispatch, NO
        blocking fetch. The localize anchor chains from the previous
        subwindow solve's device states; results come back through the same
        ordered async FIFO as the subframe path, so the host mirror (window
        states, track flags, the slide_window graph mutation) is at most two
        frames stale — never timing-dependent. The device chain continues
        from the keyframe solve's window states."""
        from rd_vio_tpu.utils.host import fetch_async
        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as T

        prev_states, slot_of = self._dev_sub
        anchor_i = spec_loc.imu_prior[0][0]
        lip = slot_of.get(anchor_i.id, -1)
        with T.time("swt.kf.dispatch"):
            res, lm_w, transfer, new_prior = (
                builders.solve_keyframe_fused_async(
                    spec_loc, pending, spec_w, tracks_v, spec_m,
                    frames_by_id, self.calib, self.caps,
                    caps_loc=self.caps_fast, dtype=self._window_dtype,
                    loc_dtype=self._fast_dtype,
                    max_iterations=self.config.solver_iteration_limit,
                    prev_states=prev_states, loc_ip_prev=lip,
                )
            )
        self._pending_prior = new_prior
        self._dev_sub = (
            res.states, {f.id: i for i, f in enumerate(spec_w.frames)}
        )
        spec_w_frames = list(spec_w.frames)
        # pinned at dispatch: the slide count (at apply time the next frame
        # is already transiently attached, which would inflate the
        # size-based loop) and the track pool (tracks born before the apply
        # must not inherit this solve's validation verdicts)
        n_slide = max(
            0, self.map.frame_num - self.config.sliding_window_size
        )
        pool_tids = np.fromiter(
            self.map.tracks, np.int64, len(self.map.tracks)
        )
        fut = fetch_async(transfer)

        def apply_fn(tree):
            (q, p, v, bg, ba_, invd_h, lq, lp, lv, lbg, lba,
             valid_h, ok_h, tri_h) = tree
            frame_j.q, frame_j.p, frame_j.v = lq[0], lp[0], lv[0]
            frame_j.bg, frame_j.ba = lbg[0], lba[0]
            for i, f in enumerate(spec_w_frames):
                f.q, f.p, f.v, f.bg, f.ba = q[i], p[i], v[i], bg[i], ba_[i]
            self._apply_kf_track_results(
                lm_w, invd_h, pending, pending_ids, ok_h, tri_h,
                tracks_v, valid_h, pool_tids=pool_tids,
            )
            with T.time("swt.marginalize"):
                self.slide_window(count=n_slide)

        self._pending_subs.append((fut, apply_fn, True))
        return True

    def _apply_kf_track_results(self, lm_w, invd_h, pending, pending_ids,
                                ok_h, tri_h, tracks_v, valid_h,
                                pool_tids=None):
        """Vectorized host application of the fused keyframe step's track
        outcomes: optimized inverse depths, pending-track triangulation
        results (mirror track_landmark :299-309), and landmark validation
        side effects (mirror _validate_landmarks / reference :304-336).

        pool_tids: the track pool AT DISPATCH TIME. The async keyframe path
        applies one frame later, when tracks born at the next frame already
        exist — the pool-wide "not valid => trash" sweep must not condemn
        them (they were never in this solve), and every row is re-resolved
        from its tid because rows of since-erased tracks may have been
        reallocated."""
        from rd_vio_tpu.models.map import (
            TB_STATIC, TB_TRASH, TB_TRIANGULATED, TB_VALID,
        )

        m = self.map
        st = m.store
        if pool_tids is None:
            pool_tids = np.fromiter(m.tracks, np.int64, len(m.tracks))
        # window inverse depths (non-pending opt tracks)
        if lm_w:
            tids_w = np.fromiter(lm_w.keys(), np.int64, len(lm_w))
            slots_w = np.fromiter(lm_w.values(), np.int64, len(lm_w))
            rows_w = st.rows_of(tids_w)
            keep = rows_w >= 0
            if pending_ids:
                keep &= ~np.isin(
                    tids_w,
                    np.fromiter(pending_ids, np.int64, len(pending_ids)),
                )
            st.inv_depth[rows_w[keep]] = invd_h[slots_w[keep]]
        # pending-track outcomes
        if pending:
            tids_p = np.array([t.id for t in pending], np.int64)
            rows_p = st.rows_of(tids_p)
            live_p = rows_p >= 0
            ok = np.asarray(ok_h[: len(pending)], bool) & live_p
            sl = np.array([lm_w.get(t.id, -1) for t in pending], np.int64)
            depth_new = np.where(
                sl >= 0, invd_h[np.clip(sl, 0, None)],
                np.asarray(tri_h[: len(pending)]),
            )
            rok = rows_p[ok]
            st.inv_depth[rok] = depth_new[ok]
            st.flags[rok] |= TB_TRIANGULATED | TB_VALID | TB_STATIC
            st.life[rok] = 1
            rbad = rows_p[~ok & live_p]
            st.inv_depth[rbad] = -1.0
            st.flags[rbad] &= ~(TB_TRIANGULATED | TB_VALID)
        # validation side effects over the dispatch-time pool
        all_rows = st.rows_of(np.asarray(pool_tids, np.int64))
        all_rows = all_rows[all_rows >= 0]
        fl = st.flags[all_rows]
        st.inv_depth[all_rows[(fl & TB_TRIANGULATED) == 0]] = -1.0
        if len(tracks_v):
            tids_v = np.array([t.id for t in tracks_v], np.int64)
            rows_v = st.rows_of(tids_v)
            live_v = rows_v >= 0
            nv = min(len(rows_v), len(valid_h))
            rv = rows_v[:nv]
            lv = live_v[:nv]
            tri_now = ((st.flags[np.clip(rv, 0, None)] & TB_TRIANGULATED)
                       != 0) & lv
            vh = np.asarray(valid_h[:nv], bool) & tri_now
            set_r = rv[tri_now & vh]
            clr_r = rv[tri_now & ~vh]
            st.flags[set_r] |= TB_VALID
            st.flags[clr_r] &= ~TB_VALID
            # beyond validation capacity: fail closed
            tail = rows_v[nv:][live_v[nv:]]
            st.flags[tail] &= ~TB_VALID
        fl = st.flags[all_rows]
        st.flags[all_rows[(fl & TB_VALID) == 0]] |= TB_TRASH

    def _refine_window_fused_tail(self, spec, frames, frames_by_id):
        """Fused keyframe tail: window solve + on-device landmark validation +
        slot-0 marginalization in one program; apply results back on host."""
        from rd_vio_tpu.models.map import TB_TRIANGULATED

        m = self.map
        st = m.store
        all_tids = np.fromiter(m.tracks, np.int64, len(m.tracks))
        tri_sel = (st.flags[st.rows_of(all_tids)] & TB_TRIANGULATED) != 0
        tracks_v = [m.tracks[int(tid)] for tid in all_tids[tri_sel]]
        # marginalization spec with RELAXED validity (TT_VALID / inv_depth are
        # only known post-solve; the device program gates each factor on the
        # validation outcome instead)
        spec_m = self._marg_spec(frames, frames_by_id, require_valid=False)
        res, lm_w, valid_dev, new_prior = builders.solve_window_validate_marginalize(
            spec, tracks_v, spec_m, frames_by_id, self.calib, self.caps,
            dtype=self._window_dtype,
            max_iterations=self.config.solver_iteration_limit,
        )
        s = res.states
        q, p, v, bg, ba_, invd_h, valid_h = fetch(
            (s.q, s.p, s.v, s.bg, s.ba, res.inv_depth, valid_dev)
        )
        for i, f in enumerate(spec.frames):
            f.q, f.p, f.v, f.bg, f.ba = q[i], p[i], v[i], bg[i], ba_[i]
        self._apply_kf_track_results(
            lm_w, invd_h, [], set(), np.zeros(0, bool), np.zeros(0),
            tracks_v, valid_h,
        )
        self._pending_prior = new_prior  # consumed by slide_window

    # ------------------------------------------------------------------
    def slide_window(self, count: Optional[int] = None):
        """Marginalize oldest keyframes while the window is oversized
        (reference :339-347). The first marginalization may already have run
        inside the fused keyframe-tail program (its prior is pending).

        count: exact number of frames to marginalize — the async keyframe
        path runs this in a deferred apply, at which point the NEXT frame is
        already transiently attached to the map, so the size-based loop
        would pop one keyframe too many; the dispatcher-time count pins the
        synchronous semantics."""
        m = self.map
        while (m.frame_num > self.config.sliding_window_size
               if count is None else count > 0):
            if count is not None:
                count -= 1
            victim = m.get_frame(0)
            for sub in victim.subframes:
                m.untrack_frame(sub)
            victim.subframes.clear()
            if self._pending_prior is not None:
                self.prior = self._pending_prior
                self._pending_prior = None
                self._finish_marginalize_host(victim)
            else:
                self._marginalize_frame0()

    def _marg_spec(self, frames, frames_by_id, require_valid: bool = True,
                   pending_ids=frozenset()):
        """Marginalization problem for window slot 0 (reference
        ceres/marginalization_factor.h:237-283): reprojection factors of
        victim-anchored (keyframe-anchor) tracks + the adjacent keyframe
        preintegration factor + the current prior. `pending_ids`: tracks being
        triangulated in-program (fused keyframe step) — included here and
        gated on-device."""
        from rd_vio_tpu.models.map import TB_TRIANGULATED, TB_VALID

        m = self.map
        st = m.store
        victim = frames[0]

        kf_fids = np.fromiter(
            (f.id for f in frames if f.tag(FT_KEYFRAME)), np.int64,
        )
        rows = st.rows_of(victim.track_ids)
        r = np.clip(rows, 0, None)
        fl = st.flags[r]
        pend_row = np.zeros(st.cap, bool)
        if pending_ids:
            prw = st.rows_of(np.fromiter(pending_ids, np.int64,
                                         len(pending_ids)))
            pend_row[prw[prw >= 0]] = True
        vsel = (rows >= 0) & (((fl & TB_TRIANGULATED) != 0) | pend_row[r])
        if require_valid:
            vsel &= ((fl & TB_VALID) != 0) & (st.inv_depth[r] > 0)
        vsel &= np.isin(st.first_fid[r], kf_fids)

        sel_k = np.flatnonzero(vsel)
        tracks = [m.tracks[int(victim.track_ids[k])] for k in sel_k]
        track_rows = r[sel_k]
        # victim-anchored reprojection factors over the window frames,
        # vectorized frame-major (VERDICT r4 item 3); top-level-frame
        # membership is implicit — only `frames` are iterated
        ra = builders.marg_reproj_arrays(
            st, frames, kf_fids, track_rows, self.caps.L,
        )
        opt_invd = st.inv_depth[track_rows]

        imu = []
        if len(frames) >= 2:
            fj = frames[1]
            chain = fj.keyframe_imu if fj.keyframe_imu is not None else (
                fj.imu_dt, fj.imu_w, fj.imu_a
            )
            imu.append((victim, fj, chain, victim.bg.copy(), victim.ba.copy(), True))

        if self.prior is None:
            self.prior = F.initial_prior(
                self.caps.W, builders._frame_states(frames, self.caps.W)
            )
        return builders.BASpec(
            frames=frames,
            fix_pose=[False] * len(frames),
            fix_motion=[False] * len(frames),
            opt_tracks=tracks, reproj=[], imu=imu, rot=[], prior=self.prior,
            reproj_arrays=ra, opt_invd=opt_invd,
        )

    def _marginalize_frame0(self):
        m = self.map
        frames = list(m.frames)
        frames_by_id = {f.id: f for f in m.all_frames()}
        spec = self._marg_spec(frames, frames_by_id, require_valid=True)
        # fused assemble+integrate+marginalize: one dispatch, prior stays
        # device-resident
        self.prior = builders.marginalize_spec(spec, self.calib, self.caps)
        self._finish_marginalize_host(frames[0])

    def _finish_marginalize_host(self, victim):
        """Host bookkeeping after the device marginalization: re-anchor
        inverse depths of tracks losing their first frame, drop the victim.
        Vectorized over tracks (the victim camera pose is shared; new-anchor
        poses are cached per frame) — the per-track get/set_landmark_point
        quat math costs ~0.3 ms each in small-op NumPy."""
        m = self.map
        frames_by_id = {f.id: f for f in m.all_frames()}
        cand = [
            t for t in m.tracks.values()
            if t.first_frame_id() == victim.id and t.tag(TT_TRIANGULATED)
            and t.inv_depth > 0
        ]
        if cand:
            q_bc, p_bc = self.calib.q_bc_h, self.calib.p_bc_h
            qv, pv = victim.get_pose(q_bc, p_bc)
            Rv = q_to_R(qv)
            z0 = np.stack([victim.bearings[t.obs[victim.id]] for t in cand])
            invd = np.array([t.inv_depth for t in cand])
            x_all = (z0 / invd[:, None]) @ Rv.T + pv
            cam_cache = {}
            for t, x in zip(cand, x_all):
                k = t.obs.pop(victim.id)
                victim.track_ids[k] = -1
                if not t.obs:
                    m.erase_track(t)
                    continue
                aid = t.first_frame_id()
                if aid not in frames_by_id:
                    continue
                c = cam_cache.get(aid)
                if c is None:
                    qa, pa = frames_by_id[aid].get_pose(q_bc, p_bc)
                    c = cam_cache[aid] = (q_to_R(qa), pa)
                Ra, pa = c
                d = np.linalg.norm(Ra.T @ (x - pa))
                t.inv_depth = 1.0 / max(d, 1e-9)
        m.erase_frame(0)

    # ------------------------------------------------------------------
    def refine_subwindow(self, fused_localize: bool = False):
        """Subframe-only refinement under the last keyframe (reference :349-444).

        With fused_localize=True (the per-frame subframe path), the new
        subframe's localization solve (reference :101-125) is chained into
        the subwindow solve as ONE device program — the localize spec is
        captured before any chain compression so its IMU interval matches the
        reference's (which localizes before refining)."""
        m = self.map
        frame = m.get_frame(m.frame_num - 1)
        if not frame.subframes:
            return
        frames_by_id = {f.id: f for f in m.all_frames()}

        spec_loc = None
        if fused_localize:
            subs0 = frame.subframes
            frame_i = subs0[-2] if len(subs0) >= 2 else frame
            spec_loc = self._localize_spec(frame_i, subs0[-1])

        if frame.subframes[0].tag(FT_NO_TRANSLATION):
            # --- pure-rotation chain ---
            if len(frame.subframes) >= 9:
                # compress 3-into-1 (reference :354-371)
                keep = []
                groups = len(frame.subframes) // 3
                subs = frame.subframes
                for g in range(groups):
                    trio = subs[g * 3 : g * 3 + 3]
                    tgt = trio[-1]
                    dts = [f.imu_dt for f in trio]
                    ws = [f.imu_w for f in trio]
                    accs = [f.imu_a for f in trio]
                    tgt.imu_dt = np.concatenate(dts)
                    tgt.imu_w = np.concatenate(ws)
                    tgt.imu_a = np.concatenate(accs)
                    for f in trio[:-1]:
                        m.untrack_frame(f)
                    keep.append(tgt)
                keep.extend(subs[groups * 3 :])
                frame.subframes = keep

            subs = frame.subframes
            # only subframes occupy state slots; the parent keyframe enters as
            # the fixed-i imu prior and as fixed anchors
            imu = []
            imu_prior = [(frame, subs[0], (subs[0].imu_dt, subs[0].imu_w, subs[0].imu_a))]
            for i in range(1, len(subs)):
                prev = subs[i - 1]
                sub = subs[i]
                imu.append((prev, sub, (sub.imu_dt, sub.imu_w, sub.imu_a),
                            prev.bg.copy(), prev.ba.copy(), False))
            from rd_vio_tpu.models.map import (
                TB_STATIC, TB_TRIANGULATED, TB_VALID,
            )

            last = subs[-1]
            st = m.store
            _, tr_sel, af_sel, rows_sel = self._select_tracks_of_frame(
                last, TB_VALID, frames_by_id,
            )
            fl_sel = st.flags[rows_sel]
            reproj_prior = []
            rot = []
            tri_b = (fl_sel & TB_TRIANGULATED) != 0
            stat_b = (fl_sel & TB_STATIC) != 0
            for t, aid, tri, stat in zip(tr_sel, af_sel, tri_b, stat_b):
                if tri:
                    if stat:
                        reproj_prior.append((last, frames_by_id[int(aid)], t))
                else:
                    rot.append((last, frames_by_id[int(aid)], t))
            spec = builders.BASpec(
                frames=list(subs),
                fix_pose=[False] * len(subs),
                fix_motion=[False] * len(subs),
                opt_tracks=[], reproj=[], imu=imu, rot=rot,
                reproj_prior=reproj_prior, imu_prior=imu_prior,
            )
            self._solve_subwindow(spec, spec_loc, len(subs) - 1)
        else:
            # --- translating chain ---
            subs = frame.subframes
            sub_ids = {f.id for f in subs}
            imu = []
            imu_prior = [(frame, subs[0], (subs[0].imu_dt, subs[0].imu_w, subs[0].imu_a))]
            for i in range(1, len(subs)):
                prev = subs[i - 1]
                sub = subs[i]
                imu.append((prev, sub, (sub.imu_dt, sub.imu_w, sub.imu_a),
                            prev.bg.copy(), prev.ba.copy(), False))
            from rd_vio_tpu.models.map import (
                TB_STATIC, TB_TRIANGULATED, TB_VALID,
            )

            reproj = []
            reproj_prior = []
            opt_tracks = []
            opt_seen = set()
            bits = TB_VALID | TB_TRIANGULATED | TB_STATIC
            kf_fids = np.fromiter(
                (fid for fid, f in frames_by_id.items() if f.tag(FT_KEYFRAME)),
                np.int64,
            )
            for sub in subs:
                _, tr_sel, af_sel, _ = self._select_tracks_of_frame(
                    sub, bits, frames_by_id,
                )
                from_kf = np.isin(af_sel, kf_fids)
                for t, aid, kf_anchor in zip(tr_sel, af_sel, from_kf):
                    if kf_anchor:
                        reproj_prior.append((sub, frames_by_id[int(aid)], t))
                    elif aid > frame.id and int(aid) in sub_ids:
                        # both target and anchor live in the subwindow: full
                        # factor with optimized depth (reference :434-438)
                        if t.id not in opt_seen:
                            opt_seen.add(t.id)
                            opt_tracks.append(t)
                        reproj.append((sub, frames_by_id[int(aid)], t, False))
            spec = builders.BASpec(
                frames=list(subs),
                fix_pose=[False] * len(subs),
                fix_motion=[False] * len(subs),
                opt_tracks=opt_tracks, reproj=reproj, imu=imu, rot=[],
                reproj_prior=reproj_prior, imu_prior=imu_prior,
            )
            self._solve_subwindow(spec, spec_loc, len(subs) - 1)

    def _solve_subwindow(self, spec, spec_loc, j_slot):
        """Dispatch the subwindow solve, fused with the pending localization
        solve when one was captured — one device program, chained on the
        previous solve's device-resident states (round-4 residency). The
        result is NOT fetched synchronously: an async transfer refreshes the
        host mirror one or two frames later (drain_pending), while the next
        frame's solve reads the states device-to-device."""
        from rd_vio_tpu.utils.host import fetch_async

        it = self.config.solver_iteration_limit
        if spec_loc is not None:
            prev_states, loc_ip_prev, sub_prev = None, -1, None
            if self._dev_sub is not None:
                prev_states, slot_of = self._dev_sub
                # localize prior anchor = spec_loc.imu_prior[0]'s i-frame
                anchor_i = spec_loc.imu_prior[0][0]
                loc_ip_prev = slot_of.get(anchor_i.id, -1)
                sub_prev = np.full(self.caps_fast.W, -1, np.int32)
                for si, f in enumerate(spec.frames[: self.caps_fast.W]):
                    sub_prev[si] = slot_of.get(f.id, -1)
            res, lm_slot = builders.solve_localize_subwindow(
                spec_loc, spec, j_slot, self.calib, self.caps_fast,
                dtype=self._fast_dtype, max_iterations=it,
                prev_states=prev_states, loc_ip_prev=loc_ip_prev,
                sub_prev=sub_prev,
            )
        else:
            res, lm_slot = builders.solve_spec(
                spec, self.calib, self.caps_fast, dtype=self._fast_dtype,
                max_iterations=it,
            )
        self._dev_sub = (
            res.states, {f.id: i for i, f in enumerate(spec.frames)}
        )
        self._pending_subs.append((
            fetch_async(builders.result_transfer_tree(res)),
            lambda tree: builders.apply_result_np(tree, spec, lm_slot),
            False,
        ))

    def drain_pending(self, block: bool = True):
        """Refresh the host mirror from deferred subwindow results, applying
        them strictly in dispatch order.

        block=True (keyframe path, checkpointing, final state reads) waits
        for every in-flight result — afterwards the host mirror is exact.
        block=False (the per-frame path) keeps exactly ONE SUBFRAME result
        in flight: with two queued, the older is applied (waiting if
        needed), so the host mirror is deterministically one-to-two
        refinements stale — never timing-dependent (a completion-based fast
        path would make trajectories irreproducible; SURVEY §4.6
        determinism). A pending KEYFRAME apply (round-5 async keyframe
        path) is always applied, even as the sole entry: its track-flag and
        window-slide side effects feed the NEXT keyframe decision, and its
        fetch has had a full frame interval to land. Solve correctness does
        not depend on this mirror — the device chain carries the fresh
        states (_dev_sub)."""
        depth = getattr(self.config, "sliding_window_fifo_depth", 2)
        while self._pending_subs:
            if (not block and len(self._pending_subs) <= depth
                    and not self._pending_subs[0][2]):
                return
            fut, apply_fn, _ = self._pending_subs.pop(0)
            apply_fn(fut.wait())

    # ------------------------------------------------------------------
    # IMU-PARSAC dynamic-object rejection (reference :557-769)
    # ------------------------------------------------------------------
    def _predict_RT(self, frame_i: Frame, frame_j: Frame):
        """Relative camera transform from current (IMU-predicted) poses
        (reference predict_RT :529-555)."""
        q_bc = self.calib.q_bc_h
        p_bc = self.calib.p_bc_h
        qi, pi = frame_i.get_pose(q_bc, p_bc)
        qj, pj = frame_j.get_pose(q_bc, p_bc)
        # P = inv(cam_j) * cam_i
        q_rel = qmul(qconj(qj), qi)
        t_rel = qrot(qconj(qj), pi - pj)
        return q_to_R(q_rel), t_rel

    def judge_track_status(self) -> bool:
        """IMU-PARSAC static/dynamic labeling + adaptive epipolar threshold
        (reference :557-718). Kept as the one-call form for host twins and
        tests; track() uses the split assemble/decide pair so the assembly
        overlaps the deferred-subwindow drain."""
        m = self.map
        curr = m.get_frame(m.frame_num - 1)
        keyframe = m.get_frame(m.frame_num - 2)
        last = keyframe.subframes[-1] if keyframe.subframes else keyframe
        builders.predict_frame(last, curr, self.calib, self.caps.IMU)
        asm = self._judge_assemble()
        return self._judge_decide(asm) if asm is not None else False

    def _judge_assemble(self):
        """State-independent judge inputs: keypoint/bearing gathers and the
        track selection. Safe before the subwindow drain — everything here is
        a pure gather; the pose- and depth-dependent pieces (landmark world
        points P3D, the fresh inv_depth gate) are computed post-drain in
        _judge_decide (ADVICE r3: the drain also refreshes subwindow-anchored
        inverse depths and subframe anchor poses, and the judge must vote on
        landmark points consistent with the post-drain poses it uses for
        Rcw/tcw). Returns None when too few triangulated tracks are visible."""
        from rd_vio_tpu.models.map import TB_TRIANGULATED, TB_VALID

        m = self.map
        st = m.store
        curr = m.get_frame(m.frame_num - 1)
        keyframe = m.get_frame(m.frame_num - 2)

        frames_by_id = {f.id: f for f in m.all_frames()}
        Ncap = self.caps.L

        # vectorized candidate selection over the SoA store (VERDICT r3
        # item 3: this loop was ~10 ms of per-keypoint attribute lookups)
        rows = st.rows_of(curr.track_ids)
        ok = rows >= 0
        r = np.clip(rows, 0, None)
        bits = TB_VALID | TB_TRIANGULATED
        fl = st.flags[r]
        sel = ok & ((fl & bits) == bits) & (st.inv_depth[r] > 0)
        sel &= np.isin(st.first_fid[r],
                       np.fromiter(frames_by_id, np.int64,
                                   len(frames_by_id)))
        idxs = np.flatnonzero(sel)
        if len(idxs) > Ncap:
            # fail loudly at capacity (round-3 hygiene): silently dropping
            # triangulated tracks skews the static/dynamic vote
            logging.getLogger(__name__).warning(
                "judge_track_status: triangulated tracks exceed caps.L=%d; "
                "extra tracks ignored this frame (raise Caps.L)", Ncap,
            )
            idxs = idxs[:Ncap]
        n = len(idxs)
        if n < 20:
            return None

        P2D = np.zeros((Ncap, 2))
        lens = np.zeros(Ncap)
        valid = np.zeros(Ncap, bool)
        bsel = curr.bearings[idxs]
        P2D[:n] = bsel[:, :2] / bsel[:, 2:]
        rows_sel = r[idxs]
        lens[:n] = np.maximum(st.life[rows_sel], 0)
        valid[:n] = True
        sel_tracks = [m.tracks[int(tid)] for tid in curr.track_ids[idxs]]

        # epipolar-pair gather: selected tracks also seen by the keyframe,
        # via the keyframe's row->keypoint reverse map
        k_of_row = np.full(st.cap, -1, np.int64)
        kf_rows = st.rows_of(keyframe.track_ids)
        kv = kf_rows >= 0
        k_of_row[kf_rows[kv]] = np.flatnonzero(kv)
        j_kf = k_of_row[rows_sel]
        have = j_kf >= 0
        slots = np.flatnonzero(have)
        if len(slots) == 0:
            return None
        bks = keyframe.bearings[j_kf[have]]
        bcs = bsel[have]
        return dict(curr=curr, keyframe=keyframe, P2D=P2D, n_sel=n,
                    sel_tracks=sel_tracks, frames_by_id=frames_by_id,
                    lens=lens, valid=valid, kp_idxs=idxs, rows_sel=rows_sel,
                    slots=slots, bks=bks, bcs=bcs)

    def _judge_decide(self, asm) -> bool:
        """Pose-dependent half of the judge: IMU prediction, IMU-PARSAC,
        epipolar-distance separation, tag writes (reference :557-718).
        Runs after the subwindow drain."""
        m = self.map
        st = m.store
        cfg = self.config
        curr = asm["curr"]
        keyframe = asm["keyframe"]
        P2D = asm["P2D"]
        lens, valid = asm["lens"], asm["valid"]
        rows_sel = asm["rows_sel"]
        Km = self.calib.K

        # landmark world points at the POST-drain poses/depths (ADVICE r3:
        # the drain refreshes subwindow-anchored inv_depths and subframe
        # anchor poses; computing P3D pre-drain would mix stale landmarks
        # with fresh Rcw/tcw below). Tracks whose refreshed depth went
        # non-positive drop out of the vote here.
        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as _T

        sel_tracks = asm["sel_tracks"]
        n_sel = asm["n_sel"]
        frames_by_id = asm["frames_by_id"]
        fresh = st.inv_depth[rows_sel] > 0
        valid = valid.copy()
        valid[:n_sel] &= fresh
        P3D = np.zeros((self.caps.L, 3))
        if fresh.any():
            with _T.time("swt.judge.p3d"):
                live = [t for t, f in zip(sel_tracks, fresh) if f]
                pts = builders.get_landmark_points_batch(
                    live, frames_by_id, self.calib
                )
                P3D[: n_sel][fresh] = pts

        q_bc = self.calib.q_bc_h
        p_bc = self.calib.p_bc_h
        qc, pc = curr.get_pose(q_bc, p_bc)
        Rcw = q_to_R(qconj(qc))
        tcw = -qrot(qconj(qc), pc)

        if cfg.parsac_host_masks:
            # host twin (ops/parsac_np): no device round trip — the mask
            # gates this frame's tags/m_th/keyframe decision synchronously
            from rd_vio_tpu.ops import parsac_np

            with _T.time("swt.judge.parsac"):
                res = parsac_np.imu_parsac_pnp_np(
                    self._next_seed(), P3D, P2D, valid, lens,
                    asnp(Rcw), asnp(tcw), asnp(self.bin_conf_imu),
                    threshold=cfg.parsac_threshold / Km[0, 0],
                    dynamic_prob=cfg.parsac_dynamic_probability,
                    norm_scale=cfg.parsac_norm_scale,
                    num_hypotheses=cfg.parsac_judge_hypotheses,
                    max_iteration=cfg.parsac_max_iteration,
                )
            self.bin_conf_imu = res.bin_confidences
            mask = res.inlier_mask
        else:
            res = parsac.imu_parsac_pnp(
                self._next_key(), jnp.asarray(P3D), jnp.asarray(P2D),
                jnp.asarray(valid), jnp.asarray(lens),
                jnp.asarray(Rcw), jnp.asarray(tcw),
                jnp.asarray(self.bin_conf_imu),
                threshold=cfg.parsac_threshold / Km[0, 0],
                dynamic_prob=cfg.parsac_dynamic_probability,
                norm_scale=cfg.parsac_norm_scale,
                num_hypotheses=cfg.parsac_judge_hypotheses,
            )
            self.bin_conf_imu = res.bin_confidences
            mask = asnp(res.inlier_mask)

        # epipolar-distance separation between inliers/outliers (reference
        # :643-700) using the IMU-predicted relative pose
        R, t_rel = self._predict_RT(keyframe, curr)
        E = _hat(t_rel) @ R
        F_mat = np.linalg.inv(Km).T @ E @ np.linalg.inv(Km)

        slots = np.asarray(asm["slots"])
        bks = asm["bks"]
        bcs = asm["bcs"]
        # pixel homogeneous coords + symmetric epipolar distances, vectorized
        def _pix_h(b):
            return np.stack([
                b[:, 0] / b[:, 2] * Km[0, 0] + Km[0, 2],
                b[:, 1] / b[:, 2] * Km[1, 1] + Km[1, 2],
                np.ones(len(b)),
            ], axis=-1)
        h1 = _pix_h(bks)
        h2 = _pix_h(bcs)
        l12 = h1 @ F_mat.T  # lines in image 2
        l21 = h2 @ F_mat    # lines in image 1
        d12 = np.abs(np.sum(h2 * l12, axis=-1)) / np.maximum(
            np.linalg.norm(l12[:, :2], axis=-1), 1e-12
        )
        d21 = np.abs(np.sum(h1 * l21, axis=-1)) / np.maximum(
            np.linalg.norm(l21[:, :2], axis=-1), 1e-12
        )
        errs = d12 + d21
        in_mask = mask[slots]
        in_d = errs[in_mask]
        out_d = errs[~in_mask]

        if len(in_d) < 20 or len(out_d) < 20:
            return False
        th1 = float(np.sort(in_d)[len(in_d) // 2])
        th2 = float(np.sort(out_d)[len(out_d) // 2])
        if th2 < th1 * 2:  # ambiguous separation
            return False
        self.m_th = (th1 + th2) / 2.0

        # vectorized tag writes over the SoA store (reference :702-715)
        from rd_vio_tpu.models.map import TB_OUTLIER, TB_STATIC

        msel = mask[: n_sel]
        rin = rows_sel[msel]
        rout = rows_sel[~msel]
        st.flags[rin] = (st.flags[rin] | TB_STATIC) & ~TB_OUTLIER
        st.flags[rout] = (st.flags[rout] | TB_OUTLIER) & ~TB_STATIC
        return True

    def update_track_status(self):
        """2D-2D PARSAC against recent keyframes; dynamic labels are sticky
        and propagate into the FT map (reference :720-769)."""
        m = self.map
        cfg = self.config
        curr = m.get_frame(m.frame_num - 1)
        ft_map = self.feature_tracking_map
        old_frame = None
        if ft_map is not None:
            with ft_map.lock:
                idx = ft_map.frame_index_by_id(curr.id)
                if idx is not None:
                    old_frame = ft_map.get_frame(idx)

        Km = self.calib.K
        st = m.store
        outlier_cnts = np.zeros(curr.keypoint_num, int)
        matches_cnts = np.zeros(curr.keypoint_num, int)
        start = max(m.frame_num - 1 - cfg.parsac_keyframe_check_size, 0)
        # ALL keyframe checks as ONE chained device program (the reference
        # runs one PARSAC per checked keyframe, each consuming the previous
        # one's bin confidences — sliding_window_tracker.cpp:720-769; a
        # per-check dispatch costs one tunnel round trip per keyframe)
        Kc = max(cfg.parsac_keyframe_check_size, 1)
        Ncap = self.caps.L
        P1 = np.zeros((Kc, Ncap, 2))
        P2 = np.zeros((Kc, Ncap, 2))
        VAL = np.zeros((Kc, Ncap), bool)
        EN = np.zeros(Kc, bool)
        kp_rows = [None] * Kc
        # row -> curr-keypoint reverse map (vectorized match gather)
        k_of_row = np.full(st.cap, -1, np.int64)
        rows_c = st.rows_of(curr.track_ids)
        cv = rows_c >= 0
        k_of_row[rows_c[cv]] = np.flatnonzero(cv)
        for row, i in enumerate(range(start, m.frame_num - 1)):
            fi = m.get_frame(i)
            rows_i = st.rows_of(fi.track_ids)
            kj = k_of_row[np.clip(rows_i, 0, None)]
            msel = (rows_i >= 0) & (kj >= 0)
            ki_idx = np.flatnonzero(msel)
            if len(ki_idx) < 10:
                continue
            if len(ki_idx) > Ncap:
                # fail loudly at capacity: clamped matches skew the 2D-2D
                # outlier vote for this keyframe check
                logging.getLogger(__name__).warning(
                    "update_track_status: %d matches vs keyframe %d exceed "
                    "caps.L=%d; extra matches ignored (raise Caps.L)",
                    len(ki_idx), fi.id, Ncap,
                )
                ki_idx = ki_idx[:Ncap]
            kj_idx = kj[ki_idx]
            b1 = fi.bearings[ki_idx]
            b2 = curr.bearings[kj_idx]
            nn = len(ki_idx)
            P1[row, :nn] = b1[:, :2] / b1[:, 2:]
            P2[row, :nn] = b2[:, :2] / b2[:, 2:]
            VAL[row, :nn] = True
            EN[row] = True
            kp_rows[row] = kj_idx
        if not EN.any():
            pass
        else:
            if cfg.parsac_host_masks:
                from rd_vio_tpu.ops import parsac_np

                masks, conf = parsac_np.parsac_essential_chain_np(
                    self._next_seed(), P1, P2, VAL, EN,
                    asnp(self.bin_conf_2d2d), self.m_th / Km[0, 0],
                    norm_scale=cfg.parsac_norm_scale,
                    num_hypotheses=cfg.parsac_judge_hypotheses,
                    max_iteration=cfg.parsac_max_iteration,
                )
                self.bin_conf_2d2d = conf
            else:
                masks_dev, conf_dev = parsac.parsac_essential_chain(
                    self._next_key(), jnp.asarray(P1), jnp.asarray(P2),
                    jnp.asarray(VAL), jnp.asarray(EN),
                    jnp.asarray(self.bin_conf_2d2d),
                    self.m_th / Km[0, 0],
                    norm_scale=cfg.parsac_norm_scale,
                    num_hypotheses=cfg.parsac_judge_hypotheses,
                )
                self.bin_conf_2d2d = conf_dev
                masks = asnp(masks_dev)
            for row in range(Kc):
                kp_idx = kp_rows[row]
                if kp_idx is None:
                    continue
                mrow = masks[row, : len(kp_idx)]
                np.add.at(matches_cnts, kp_idx, 1)
                np.add.at(outlier_cnts, kp_idx[~mrow], 1)

        # vectorized dynamic vote + sticky SWT<->FT propagation (the mirrored
        # FT frame shares keypoint indices with curr: mirror_frame clones
        # bearings, so SWT keypoint k == FT keypoint k)
        from rd_vio_tpu.models.map import TB_STATIC

        outlier_th = m.frame_num // 2
        dyn = (outlier_cnts > outlier_th / 2) \
            & (outlier_cnts > 0.8 * matches_cnts)
        has_t = rows_c >= 0
        rc = np.clip(rows_c, 0, None)
        clr = dyn & has_t
        if old_frame is not None and ft_map is not None:
            with ft_map.lock:
                ft_st = ft_map.store
                n_shared = min(len(curr.track_ids), len(old_frame.track_ids))
                rows_ft = ft_st.rows_of(old_frame.track_ids[:n_shared])
                has_ft = rows_ft >= 0
                rf = np.clip(rows_ft, 0, None)
                swt_dyn = (st.flags[rc[:n_shared]] & TB_STATIC) == 0
                ft_dyn = (ft_st.flags[rf] & TB_STATIC) == 0
                both = has_t[:n_shared] & has_ft
                sticky = both & (
                    ft_dyn | swt_dyn | clr[:n_shared]
                )
                ft_st.flags[rf[sticky]] &= ~TB_STATIC
                clr = clr.copy()
                clr[:n_shared] |= sticky
        st.flags[rc[clr]] &= ~TB_STATIC

    # ------------------------------------------------------------------
    def get_latest_state(self):
        f = self.map.get_frame(self.map.frame_num - 1)
        if f.subframes:
            f = f.subframes[-1]
        return f.t, f.q.copy(), f.p.copy(), f.v.copy(), f.bg.copy(), f.ba.copy(), f.id

    def get_landmarks(self):
        frames_by_id = {f.id: f for f in self.map.all_frames()}
        sel = [
            t for t in self.map.tracks.values()
            if t.all_tagged(TT_VALID, TT_TRIANGULATED) and t.inv_depth > 0
            and t.first_frame_id() in frames_by_id
        ]
        if not sel:
            return np.zeros((0, 3))
        return builders.get_landmark_points_batch(sel, frames_by_id, self.calib)


def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
