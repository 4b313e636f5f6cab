"""Public Odometry API — the reference's `rdvio::Odometry` surface.

Behavioral reference: /root/reference/src/rdvio/include/rdvio/rdvio.hpp:25-115:
addFrame(t, image), addMotion(t, acc, gyro), addAcc/addGyro, transform_world_cam
(output pose composed with the output extrinsic), state() mapping
{0: initializing, 1: tracking, 2: crash, 3: unknown}, local_map()/keypoints().
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from rd_vio_tpu.utils.host import asnp, fetch

from rd_vio_tpu.config import Config
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import FeatureTracker, ImageBackend
from rd_vio_tpu.models.frontend import Frontend, SysState
from rd_vio_tpu.models.handler import Handler
from rd_vio_tpu.models.quat_np import qconj, qmul, qrot


class Odometry:
    def __init__(self, config: Config, backend: ImageBackend,
                 caps: Optional[builders.Caps] = None, threaded: bool = False):
        """threaded=True runs the reference's THREADING=ON pipeline model
        (handler.cpp:35-50): the feature tracker and the optimizer run in
        worker threads and overlap; call close() (or use as a context
        manager) when done. threaded=False is fully synchronous and
        deterministic."""
        self.config = config
        self.calib = builders.CalibArrays.from_config(config)
        # keyframe-solve capacity: window keyframes + transient lift slots
        # (fixed anchors no longer occupy state slots — they enter as
        # constant-data prior factors)
        self.caps = caps or builders.Caps(W=config.sliding_window_size + 3)
        self.feature_tracker = FeatureTracker(config, self.calib, self.caps, backend)
        self.frontend = Frontend(self.feature_tracker, config, self.calib, self.caps)
        self.feature_tracker.frontend = self.frontend
        self.handler = Handler(config, self.feature_tracker, self.frontend,
                               threaded=threaded)

    # -- threaded-pipeline lifecycle --------------------------------------
    def join(self):
        """Block until all ingested frames are fully processed (no-op in
        synchronous mode)."""
        self.handler.join()
        if self.feature_tracker.device_loop:
            # finalize + issue the in-flight device-loop pair, then drain the
            # optimizer stage again for that last frame
            self.feature_tracker.flush()
            self.handler.join()
        self._drain_swt()

    def close(self):
        if self.feature_tracker.device_loop:
            try:
                self.join()
            except RuntimeError:
                pass  # re-raised by handler.close below
        self.handler.close()
        self._drain_swt()

    def _drain_swt(self):
        """Apply any deferred subwindow result so final state reads see the
        last solve (safe here: join guarantees no in-flight optimizer work)."""
        swt = self.frontend.swt
        if swt is not None:
            swt.drain_pending()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- sensor ingestion ------------------------------------------------
    def add_frame(self, t: float, image) -> None:
        backend = self.feature_tracker.backend
        if hasattr(backend, "preprocess"):
            image = backend.preprocess(image)
        self.handler.track_camera(t, image)

    def add_motion(self, t: float, gyro, accel) -> None:
        self.handler.track_motion(t, gyro, accel)

    def add_gyroscope(self, t: float, w) -> None:
        self.handler.track_gyroscope(t, w)

    def add_accelerometer(self, t: float, a) -> None:
        self.handler.track_accelerometer(t, a)

    def healthy(self) -> bool:
        """False once a pipeline worker has failed (threaded mode): callers
        measuring throughput must stop counting — frames 'ingested' after a
        worker death race through unprocessed."""
        return self.handler._worker_error is None

    # -- outputs ---------------------------------------------------------
    def transform_world_cam(self, t: Optional[float] = None):
        """Body pose composed with the output extrinsic (reference
        rdvio.hpp:71-77). Returns (q_wxyz, p) or None before tracking."""
        st = (
            self.handler.predict_pose(t) if t is not None else None
        )
        if st is None:
            ls = self.handler.get_latest_state()
            if ls is None:
                return None
            _, q, p, *_ = ls
        else:
            q, p = st
        q_bo = asnp(self.config.output_to_body_rotation)
        p_bo = asnp(self.config.output_to_body_translation)
        return qmul(q, q_bo), p + qrot(q, p_bo)

    def state(self) -> int:
        s = self.frontend.get_system_state()
        return {
            SysState.SYS_INITIALIZING: 0,
            SysState.SYS_TRACKING: 1,
            SysState.SYS_CRASH: 2,
            SysState.SYS_UNKNOWN: 3,
        }[s]

    def local_map(self) -> np.ndarray:
        return self.frontend.get_landmarks()

    def keypoints(self) -> np.ndarray:
        m = self.feature_tracker.map
        if m.frame_num == 0:
            return np.zeros((0, 2))
        return self.feature_tracker._pix_from_bearings(m.get_frame(m.frame_num - 1))
