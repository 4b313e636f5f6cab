"""BatchedVIO: N independent sequences through one lockstep pipeline.

The single-chip frames/s ceiling of a latency-bound VIO pipeline is set by
per-dispatch overhead, not device FLOPs (the chip idles 62-83% per frame at
N=1 — BENCH_r04 duty cycles). This runtime advances N sequences one frame per
tick: each sequence runs its full host state machine (feature tracking,
judge, keyframe logic — unchanged per-stream semantics), while every device
solve of the tick coalesces into ONE vmapped dispatch through the shared
BatchDispatcher. Restrictions (asserted): all sequences share one Config
shape-set (Caps) and one camera calibration — the batched programs close over
a single CalibTree. Sequences may diverge freely in CONTENT (different
scenes, keyframe cadences, dynamic objects): per-tick branch divergence is
handled with masked dummy rows, not lockstep branching.

Use run_sequences_lockstep() for the common all-synthetic evaluation shape,
or drive BatchedVIO.add_motion / add_frame_tick directly for real streams.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional

import numpy as np

from rd_vio_tpu.batch.dispatcher import BatchDispatcher
from rd_vio_tpu.batch.swt import BatchSWT
from rd_vio_tpu.models.odometry import Odometry


class BatchedVIO:
    def __init__(self, configs: List, backends: List, caps=None,
                 host_workers: int = 2):
        assert len(configs) == len(backends) and len(configs) >= 1
        self.n = len(configs)
        self.odos: List[Odometry] = []
        self.disp: Optional[BatchDispatcher] = None
        K0 = np.asarray(configs[0].camera_intrinsic)
        for i, (cfg, be) in enumerate(zip(configs, backends)):
            assert np.allclose(np.asarray(cfg.camera_intrinsic), K0), (
                "BatchedVIO requires one shared camera calibration: the "
                "batched device programs close over a single CalibTree"
            )
            odo = Odometry(cfg, be, caps=caps, threaded=False)
            if self.disp is None:
                self.disp = BatchDispatcher(
                    self.n, odo.calib, cfg.solver_iteration_limit
                )
            odo.frontend.swt_factory = functools.partial(
                BatchSWT, dispatcher=self.disp, seq_index=i
            )
            self.odos.append(odo)
        # per-tick host work is sequence-independent (separate maps, RNGs
        # and submission slots); a small worker pool overlaps the NumPy
        # portions (which release the GIL) across cores. Results are
        # deterministic — only continuation ORDER across sequences varies,
        # and continuations touch disjoint per-sequence state.
        self._pool = None
        if host_workers > 1 and self.n > 1:
            import concurrent.futures as cf

            self._pool = cf.ThreadPoolExecutor(
                max_workers=host_workers, thread_name_prefix="rdvio-batch"
            )

    # -- lockstep ingestion -----------------------------------------------
    def add_motion(self, i: int, t: float, gyro, accel):
        self.odos[i].add_motion(t, gyro, accel)

    def add_frame_tick(self, frames):
        """One lockstep tick: frames[i] = (t, image) or None for a sequence
        with no frame this tick. All host pipelines advance one frame, then
        the dispatcher flushes the tick's coalesced device work."""
        if self._pool is not None:
            futs = [
                self._pool.submit(self.odos[i].add_frame, fr[0], fr[1])
                for i, fr in enumerate(frames) if fr is not None
            ]
            for f in futs:
                f.result()
        else:
            for i, fr in enumerate(frames):
                if fr is not None:
                    self.odos[i].add_frame(fr[0], fr[1])
        self.disp.flush()

    def states(self):
        """Per-sequence (tracking?, latest (t, q, p, v, bg, ba) or None)."""
        out = []
        for odo in self.odos:
            tracking = odo.state() == 1
            out.append((tracking, odo.handler.get_latest_state()))
        return out

    def close(self):
        self.disp.flush()
        for odo in self.odos:
            odo.close()
        if self._pool is not None:
            self._pool.shutdown(wait=False)


def run_sequences_lockstep(
    configs, backends, seqs, caps=None,
    on_tick: Optional[Callable] = None,
):
    """Drive N synthetic sequences (shared frame cadence) to completion in
    lockstep. Returns (wall_ticks, per-seq lists of (t, p) tracked states,
    tick wall-clock stamps) — callers compute steady-state throughput from
    the stamp tail and ATE from the tracked states."""
    import time

    n_frames = min(len(s.t_frame) for s in seqs)
    vio = BatchedVIO(configs, backends, caps=caps)
    # per-sequence IMU event cursor
    cursors = [0] * len(seqs)
    est = [[] for _ in seqs]
    stamps = []
    kf_flushes = []  # batched-keyframe flush count per tick (steady marker)
    try:
        for k in range(n_frames):
            for i, s in enumerate(seqs):
                t_f = s.t_frame[k]
                c = cursors[i]
                while c < len(s.t_imu) and s.t_imu[c] <= t_f:
                    vio.add_motion(i, s.t_imu[c], s.gyro[c], s.accel[c])
                    c += 1
                cursors[i] = c
            vio.add_frame_tick([(s.t_frame[k], k) for s in seqs])
            stamps.append(time.perf_counter())
            kf_flushes.append(vio.disp.n_kf_flushes)
            for i, odo in enumerate(vio.odos):
                if odo.state() == 1:
                    ls = odo.handler.get_latest_state()
                    if ls is not None and (
                        not est[i] or ls[0] != est[i][-1][0]
                    ):
                        est[i].append((ls[0], ls[2]))
            if on_tick is not None:
                on_tick(k)
    finally:
        vio.close()
    return n_frames, est, stamps, kf_flushes


def steady_window_start(kf_flushes, margin: int = 5) -> int:
    """First tick index safely inside the batched steady state: `margin`
    ticks past the third batched keyframe flush (the first flush or two can
    still carry one-time vmapped-program compiles; before any flush the
    pipeline is in its unbatched init / window-filling phase). Falls back to
    the midpoint when steady state was never reached."""
    for k, n in enumerate(kf_flushes):
        if n >= 3:
            return min(k + margin, max(len(kf_flushes) - 2, 0))
    return len(kf_flushes) // 2
