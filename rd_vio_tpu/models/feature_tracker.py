"""Feature tracker: per-frame keypoint tracking/detection over the raw-frame
map, with the pure-rotation detector and track-length-priority Poisson
re-filtering.

Behavioral reference: /root/reference/src/rdvio/src/feature_tracker.cpp
(run :26-111) and src/rdvio_map/src/frame.cpp (detect_keypoints :55-72,
track_keypoints :74-172 — IMU-predicted initial flow, essential-RANSAC mask,
2-pt rotation RANSAC + 70th-percentile misalignment => FT_NO_TRANSLATION,
Poisson-disk re-filter by track length).

The image pipeline is pluggable (`ImageBackend`): the synthetic backend
replaces KLT with perfect id matches (the reference's abstract Image seam,
types.h:153-177, per SURVEY.md §4.2); the JAX backend (ops/image) supplies
CLAHE + pyramidal LK + GFTT on real pixels.
"""

from __future__ import annotations

from typing import Optional, Protocol, Tuple

import numpy as np

from rd_vio_tpu.utils.host import asnp, fetch
import jax
import jax.numpy as jnp

from rd_vio_tpu.models import builders
from rd_vio_tpu.models.map import (
    FT_NO_TRANSLATION, Frame, Map, TT_TRASH,
)
from rd_vio_tpu.models.quat_np import q_to_R, qconj, qmul, qrot
from rd_vio_tpu.ops import poisson_disk


class ImageBackend(Protocol):
    def detect(
        self, image, existing_pix: np.ndarray, max_points: int, min_dist: float
    ) -> np.ndarray:
        """Return new keypoint pixels (M, 2) respecting spacing vs existing."""

    def track(
        self, prev_image, next_image, prev_pix: np.ndarray, pred_pix: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (next_pix (N, 2), status (N,) bool)."""


class SyntheticBackend:
    """Perfect-match backend over a SyntheticSequence; image handle = frame
    index into the sequence. The mocking seam of SURVEY.md §4.2."""

    def __init__(self, seq):
        self.seq = seq

    def _frame_kps(self, fidx):
        ids = self.seq.kp_id[fidx]
        pix = self.seq.kp_pixel[fidx]
        m = ids >= 0
        return pix[m], ids[m]

    def detect(self, image, existing_pix, max_points, min_dist):
        pix, ids = self._frame_kps(image)
        # exclude already-tracked synthetic landmarks by pixel proximity
        if len(existing_pix):
            d = np.linalg.norm(pix[:, None] - existing_pix[None], axis=-1)
            keep = d.min(axis=1) > min_dist * 0.5
            pix = pix[keep]
        return pix[: max(0, max_points - len(existing_pix))]

    def track(self, prev_image, next_image, prev_pix, pred_pix):
        pix_p, ids_p = self._frame_kps(prev_image)
        pix_n, ids_n = self._frame_kps(next_image)
        out = np.zeros_like(prev_pix)
        status = np.zeros(len(prev_pix), bool)
        if len(pix_p) == 0 or len(prev_pix) == 0:
            return out, status
        # exact-pixel association (vectorized): bearings are pixel-exact in
        # this backend, so anything farther than numerical noise is a
        # different landmark (a loose radius silently drifts tracks)
        d = np.linalg.norm(prev_pix[:, None] - pix_p[None], axis=-1)  # (N, M)
        j = np.argmin(d, axis=1)
        hit = d[np.arange(len(prev_pix)), j] <= 1e-5
        lid = ids_p[j]  # landmark id per prev keypoint
        next_pos = np.full(int(ids_n.max()) + 2, -1, dtype=np.int64)
        next_pos[ids_n] = np.arange(len(ids_n))
        k = next_pos[np.clip(lid, 0, len(next_pos) - 1)]
        ok = hit & (k >= 0)
        out[ok] = pix_n[k[ok]]
        status[ok] = True
        return out, status


class FeatureTracker:
    def __init__(self, config, calib: builders.CalibArrays, caps: builders.Caps,
                 backend: ImageBackend):
        self.config = config
        self.calib = calib
        self.caps = caps
        self.backend = backend
        self.map = Map()
        self.frontend = None  # set by Odometry wiring
        self._rng_key = jax.random.PRNGKey(config.random + 1)
        self._host_seed_ctr = 0
        self._frame_counter = 0
        self.latest_state = None  # (t, q, p, v, bg, ba)
        self._pending_detect = None  # new-keypoint pixels from the fused step
        # device-resident frontend loop (ops/frontend_loop): active when the
        # backend exposes pyramids and the config opts in — the keypoint
        # state machine stays on the TPU and the host consumes results one
        # frame stale, hiding the per-frame device round trip entirely
        self.device_loop = bool(
            getattr(config, "feature_tracker_device_loop", True)
            and getattr(backend, "supports_device_loop", False)
        )
        self._dl_state = None  # FTLoopState (device)
        # FIFO of in-flight (fetch_handles, frame, last) pairs. Depth 2
        # (config.feature_tracker_pipeline_depth) gives each async fetch TWO
        # frame intervals to land before its finalize: one interval is not
        # enough once stage 2 is fast (the fetch completes at dispatch +
        # device-queue + ~25 ms tunnel RTT), and a blocking finalize puts
        # the round trip straight back on the critical path. Cost: frames
        # reach the optimizer one extra frame late (throughput unchanged).
        self._dl_pending = []
        self._dl_depth = int(getattr(config,
                                     "feature_tracker_pipeline_depth", 2))
        self._dl_slot_kp = np.full(self.KP_CAP, -1, np.int32)
        self._dl_drop = np.zeros(self.KP_CAP, bool)

    def _next_key(self):
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    def _next_seed(self) -> tuple:
        """Host-side seed material for the NumPy mask path — deriving it from
        a JAX key would force a ~25 ms device sync per frame."""
        self._host_seed_ctr += 1
        return (self.config.random + 1, self._host_seed_ctr)

    # -- helpers -------------------------------------------------------
    def _pix_from_bearings(self, frame: Frame) -> np.ndarray:
        Km = self.calib.K
        b = frame.bearings
        if len(b) == 0:
            return np.zeros((0, 2))
        return np.stack(
            [
                b[:, 0] / b[:, 2] * Km[0, 0] + Km[0, 2],
                b[:, 1] / b[:, 2] * Km[1, 1] + Km[1, 2],
            ],
            axis=-1,
        )

    def _bearing_from_pix(self, pix: np.ndarray) -> np.ndarray:
        Km = self.calib.K
        x = (pix[:, 0] - Km[0, 2]) / Km[0, 0]
        y = (pix[:, 1] - Km[1, 2]) / Km[1, 1]
        b = np.stack([x, y, np.ones_like(x)], axis=-1)
        return b / np.linalg.norm(b, axis=-1, keepdims=True)

    # -- main per-frame entry (reference feature_tracker.cpp:26-111) ---
    def track_frame(self, frame: Frame):
        if self.device_loop:
            return self._track_frame_device_loop(frame)
        self._frame_counter += 1

        # re-anchor poses from the frontend's latest optimized state
        with self.map.lock:
            self._repropagate_from_optimized()
            last = self.map.get_frame(self.map.frame_num - 1) if self.map.frame_num else None

        if last is not None:
            from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as T

            # fused device program: preintegrate+predict, RANSAC masks,
            # pure-rotation detector, Poisson re-filter — one call, one fetch
            with T.time("ft.track"):
                self._track_keypoints(last, frame)
            self.latest_state = (frame.t, frame.q.copy(), frame.p.copy(),
                                 frame.v.copy(), frame.bg.copy(), frame.ba.copy())

        if (self._frame_counter % max(self.config.sliding_window_tracker_frequent, 1)) == 0:
            self._detect_keypoints(frame)

        with self.map.lock:
            self.map.attach_frame(frame)
            self._trim_map()
        if self.frontend is not None:
            self.frontend.issue_frame(frame)

    # -- device-resident frontend loop (ops/frontend_loop) -------------
    def _track_frame_device_loop(self, frame: Frame):
        """Pipelined per-frame entry: finalize the PREVIOUS pair's fetched
        results (its program has had a full frame interval to finish),
        dispatch this pair's program (device-to-device state dependency, no
        host round trip), and only then issue the finalized frame downstream.
        Steady-state stage-1 cost = host bookkeeping only."""
        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as T

        self._frame_counter += 1
        with self.map.lock:
            self._repropagate_from_optimized()
            last = (self.map.get_frame(self.map.frame_num - 1)
                    if self.map.frame_num else None)

        done = None
        if len(self._dl_pending) >= self._dl_depth:
            with T.time("ft.finalize"):
                done = self._dl_finalize()

        if last is not None:
            with T.time("ft.dispatch"):
                self._dl_dispatch(last, frame)
            with self.map.lock:
                builders.predict_frame(last, frame, self.calib, self.caps.IMU)
            self.latest_state = (frame.t, frame.q.copy(), frame.p.copy(),
                                 frame.v.copy(), frame.bg.copy(),
                                 frame.ba.copy())

        with self.map.lock:
            self.map.attach_frame(frame)
            self._trim_map()
        if done is not None and self.frontend is not None:
            self.frontend.issue_frame(done)

    def _dl_dispatch(self, last: Frame, frame: Frame):
        from rd_vio_tpu.ops import frontend_loop as fl

        cfg = self.config
        if self._dl_state is None:
            self._dl_state = fl.init_state(self.KP_CAP)

        R_pred = np.eye(3)
        delta_q = self._interval_rotation(frame)
        if cfg.feature_tracker_predict_keypoints and delta_q is not None:
            q_bc = self.calib.q_bc_h
            q_bi = self.calib.q_bi_h
            dkq = qconj(qmul(qmul(qmul(qmul(qconj(q_bc), q_bi), delta_q),
                                  qconj(q_bi)), q_bc))
            R_pred = q_to_R(dkq)

        detect_due = (
            self._frame_counter
            % max(cfg.sliding_window_tracker_frequent, 1)
        ) == 0
        use_pallas = getattr(self.backend, "klt_backend", "xla") == "pallas"
        step_args = (
            self._dl_state, last.image.pyramid, frame.image.pyramid,
            jnp.asarray(R_pred, jnp.float32), self._next_key(),
            jnp.asarray(self._dl_drop),
            jnp.asarray(self.calib.K, jnp.float32),
            np.float32(np.radians(cfg.rotation_ransac_threshold)),
        )
        step_kwargs = dict(
            detect=detect_due,
            max_points=int(cfg.feature_tracker_max_keypoint_detection),
            min_dist=float(cfg.feature_tracker_min_keypoint_distance),
            num_hypotheses=int(cfg.ransac_hypotheses),
            use_pallas=use_pallas,
            interpret=None if use_pallas else False,
        )
        state, fetch = fl.ft_loop_step(*step_args, **step_kwargs)
        from rd_vio_tpu.utils import device_time

        # capture the variant that runs in the MAJORITY of steady-state
        # frames (ADVICE r4: first-capture-wins used to register the frame-0
        # detect variant even when frequent>1 makes detect the minority):
        # frequent == 1 => every frame is detect_due, capture detect=True;
        # frequent > 1 => most frames are track-only, capture detect=False
        majority_detect = max(cfg.sliding_window_tracker_frequent, 1) == 1
        if device_time.CAPTURE and detect_due == majority_detect:
            device_time.capture(
                "ft_loop", state=step_args[0], pyr_a=step_args[1],
                pyr_b=step_args[2], R_pred=step_args[3], key=step_args[4],
                drop=step_args[5], K=step_args[6], rot_thr=step_args[7],
                kwargs=step_kwargs,
            )
        self._dl_state = state
        # start the device->host copy NOW: by the time this pair's finalize
        # runs (pipeline-depth frames later), the device program and the
        # ~25 ms tunnel round trip have already happened
        from rd_vio_tpu.utils.host import fetch_async

        self._dl_pending.append((fetch_async(fetch), frame, last))

    def _dl_finalize(self) -> Optional[Frame]:
        """Fetch + host bookkeeping for the OLDEST in-flight pair: append
        keypoints to the pair's new frame, extend track links, set the
        pure-rotation tag, and compute the retired-slot mask for the next
        dispatch."""
        fetch, frame, last = self._dl_pending.pop(0)
        out = fetch.wait()
        cfg = self.config

        if float(out["misalign"]) < cfg.rotation_misalignment_threshold:
            frame.set_tag(FT_NO_TRANSLATION, True)

        valid = np.asarray(out["valid"])
        cont = np.asarray(out["cont"])
        pix = np.asarray(out["pix"])
        idxs = np.flatnonzero(valid)
        slot_kp_new = np.full(self.KP_CAP, -1, np.int32)
        drop = np.zeros(self.KP_CAP, bool)
        with self.map.lock:
            if len(idxs):
                bearings = self._bearing_from_pix(pix[idxs])
                k0 = frame.append_keypoints(bearings)
                slot_kp_new[idxs] = k0 + np.arange(len(idxs), dtype=np.int32)
            for s in np.flatnonzero(cont):
                k_old = int(self._dl_slot_kp[s])
                if k_old < 0:
                    continue
                t = self.map.get_track(last, k_old, create=True)
                if t.tag(TT_TRASH):
                    # retire the slot WITHOUT extending the trashed track
                    # (ADVICE r3: the legacy path filters ~trash before
                    # linking — a trashed track must not gain a bogus
                    # observation; its slot still occupies its Poisson cell
                    # for this one stale frame until the drop mask lands)
                    drop[s] = True
                    continue
                self.map.add_keypoint(t, frame, int(slot_kp_new[s]))
        self._dl_slot_kp = slot_kp_new
        self._dl_drop = drop
        return frame

    def flush(self):
        """Finalize + issue ALL in-flight device-loop pairs in order
        (sequence end or pipeline drain). No-op outside device-loop mode."""
        if not self.device_loop:
            return
        while self._dl_pending:
            done = self._dl_finalize()
            if done is not None and self.frontend is not None:
                self.frontend.issue_frame(done)

    def refresh_from_optimized(self):
        """Called by the frontend right after it publishes a new optimized
        state: re-anchor the raw-frame chain and refresh latest_state so
        consumers never see a stale pre-optimization prediction."""
        with self.map.lock:
            self._repropagate_from_optimized()
            if self.map.frame_num > 0:
                f = self.map.get_frame(self.map.frame_num - 1)
                self.latest_state = (f.t, f.q.copy(), f.p.copy(), f.v.copy(),
                                     f.bg.copy(), f.ba.copy())

    def _repropagate_from_optimized(self):
        """Pull the frontend's latest optimized state and re-propagate all
        later frames (reference feature_tracker.cpp:36-69)."""
        fe = self.frontend
        if fe is None or fe.latest_optimized is None:
            return
        t, fid, q, p, v, bg, ba_ = fe.latest_optimized
        idx = self.map.frame_index_by_id(fid)
        if idx is None:
            return
        f = self.map.get_frame(idx)
        f.q, f.p, f.v, f.bg, f.ba = q.copy(), p.copy(), v.copy(), bg.copy(), ba_.copy()
        chain = [self.map.get_frame(i) for i in range(idx + 1, self.map.frame_num)]
        if chain:
            builders.propagate_chain(chain, f, self.calib, self.caps.IMU)

    KP_CAP = 384  # fixed per-frame tracking capacity (stable jit shapes)

    def _track_keypoints(self, last: Frame, frame: Frame):
        cfg = self.config
        Km = self.calib.K
        n = min(last.keypoint_num, self.KP_CAP)
        if n == 0:
            # still need the IMU state prediction (under map.lock: the
            # frontend worker rewrites last.q/p/v via refresh_from_optimized)
            with self.map.lock:
                builders.predict_frame(last, frame, self.calib, self.caps.IMU)
            return
        curr_pix = self._pix_from_bearings(last)[:n]

        # IMU-predicted initial flow (reference frame.cpp:82-93)
        pred_pix = curr_pix
        delta_q = self._interval_rotation(frame)
        if cfg.feature_tracker_predict_keypoints and delta_q is not None:
            q_bc = self.calib.q_bc_h
            q_bi = self.calib.q_bi_h
            dkq = qconj(
                qmul(qmul(qmul(qmul(qconj(q_bc), q_bi), delta_q), qconj(q_bi)), q_bc)
            )
            pb = last.bearings[:n] @ q_to_R(dkq).T
            pred_pix = np.stack(
                [
                    pb[:, 0] / np.maximum(pb[:, 2], 1e-6) * Km[0, 0] + Km[0, 2],
                    pb[:, 1] / np.maximum(pb[:, 2], 1e-6) * Km[1, 1] + Km[1, 2],
                ],
                axis=-1,
            )

        detect_due = (
            self._frame_counter
            % max(cfg.sliding_window_tracker_frequent, 1)
        ) == 0
        if detect_due and hasattr(self.backend, "track_and_detect"):
            # fused device step: LK fwd+rev + GFTT in ONE dispatch + fetch
            # (detection spacing runs against the fwd+rev survivors — a
            # conservative superset of the finally-accepted tracks)
            next_pix_raw, status, self._pending_detect = \
                self.backend.track_and_detect(
                    last.image, frame.image, curr_pix, pred_pix,
                    cfg.feature_tracker_max_keypoint_detection,
                    cfg.feature_tracker_min_keypoint_distance,
                )
        else:
            next_pix_raw, status = self.backend.track(
                last.image, frame.image, curr_pix, pred_pix
            )
        next_bearings = self._bearing_from_pix(
            np.where(status[:, None], next_pix_raw, curr_pix)
        )

        # host-side priority bookkeeping for the Poisson re-filter
        cap = self.KP_CAP
        lengths = np.zeros(n)
        trash = np.zeros(cap, bool)
        with self.map.lock:
            for i in range(n):
                t = self.map.get_track(last, i)
                if t is not None:
                    lengths[i] = len(t.obs)
                    trash[i] = t.tag(TT_TRASH)
        order = np.zeros(cap, np.int32)
        order[:n] = np.argsort(-lengths, kind="stable")
        order[n:] = np.arange(n, cap)

        b1 = np.zeros((cap, 3), np.float32)
        b2 = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (cap, 1))
        val = np.zeros(cap, bool)
        npix = np.zeros((cap, 2), np.float32)
        b1[:n] = last.bearings[:n]
        b2[:n] = next_bearings
        val[:n] = status
        npix[:n] = next_pix_raw

        W_img, H_img = self.config.camera_resolution
        rot_thr = np.float32(np.radians(cfg.rotation_ransac_threshold))
        if cfg.feature_tracker_host_masks:
            # host mask path (default): the mask RANSAC is tiny arithmetic
            # whose result gates host control flow — no device round trip
            from rd_vio_tpu.ops.frontend_step_np import ft_step_np

            pending = None
        else:
            from rd_vio_tpu.ops.frontend_step import ft_step

            # device mask program (f32) overlaps with the host prediction
            pending = ft_step(
                jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(val),
                self._next_key(),
                rot_thr, num_hypotheses=cfg.ransac_hypotheses,
            )

        # predicted state (reference predict path) — host NumPy, mean-only.
        # Held under map.lock: the frontend worker concurrently rewrites
        # last.q/p/v/bg/ba via _repropagate_from_optimized (ADVICE r1).
        with self.map.lock:
            builders.predict_frame(last, frame, self.calib, self.caps.IMU)

        if pending is None:
            out = ft_step_np(b1, b2, val, self._next_seed(), rot_thr,
                             num_hypotheses=cfg.ransac_hypotheses)
        else:
            out = fetch(pending)

        # pure-rotation detector (reference frame.cpp:115-131)
        if float(out["misalign"]) < cfg.rotation_misalignment_threshold:
            frame.set_tag(FT_NO_TRANSLATION, True)

        # track-length-priority Poisson re-filter (reference frame.cpp:134-161)
        # — host-side on the fetched mask (frees serialized device scan time)
        status_m = np.asarray(out["mask"])
        pd_val = status_m[order] & ~trash[order]
        acc = poisson_disk.poisson_disk_filter_np(
            npix[order], pd_val,
            min_distance=float(cfg.feature_tracker_min_keypoint_distance),
            width=float(W_img), height=float(H_img),
        )
        keep = np.zeros_like(status_m)
        keep[order] = acc
        final = (status_m & keep & ~trash)[:n]
        survivors = np.flatnonzero(final)
        with self.map.lock:
            k_new = frame.append_keypoints(next_bearings[survivors])
            for off, i in enumerate(survivors):
                t = self.map.get_track(last, i, create=True)
                self.map.add_keypoint(t, frame, k_new + off)

    def _interval_rotation(self, frame: Frame):
        """Integrate the frame's gyro samples into a delta rotation quat."""
        if len(frame.imu_dt) == 0:
            return None
        from rd_vio_tpu.ops import preintegration_np as pre_np

        return pre_np.interval_rotation_mean(
            frame.imu_dt, frame.imu_w, frame.imu_a, np.zeros(3), np.zeros(3)
        )

    def _detect_keypoints(self, frame: Frame):
        cfg = self.config
        if self._pending_detect is not None:
            # detections already computed inside the fused track step
            new_pix = self._pending_detect
            self._pending_detect = None
        else:
            existing = self._pix_from_bearings(frame)
            new_pix = self.backend.detect(
                frame.image, existing,
                cfg.feature_tracker_max_keypoint_detection,
                cfg.feature_tracker_min_keypoint_distance,
            )
        if len(new_pix) == 0:
            return
        for b in self._bearing_from_pix(asnp(new_pix)):
            frame.append_keypoint(b)

    def _trim_map(self):
        limit = self.config.feature_tracker_max_init_frames
        if self.frontend is not None and not self.frontend.initializing:
            limit = self.config.feature_tracker_max_frames
        while self.map.frame_num > limit:
            self.map.erase_frame(0)
        # release pixel buffers of frames that can no longer be tracked from
        # (reference opencv_image.cpp:200-208 release_image_buffer)
        for f in self.map.frames[:-2]:
            if f.image is not None and hasattr(f.image, "release"):
                f.image.release()
