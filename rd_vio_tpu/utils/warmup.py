"""Steady-state program warmup: compile the tracking-phase device programs
concurrently with the initializer phase.

The reference pipeline has no compile phase; ours pays minutes of host-side
XLA compilation the first time each fused solver program is traced — and the
expensive ones (keyframe-fused, localize+triangulate, subwindow) are first
needed only AFTER initialization succeeds (~frame 40), so a cold run stalls
mid-sequence (BENCH_r02: 73% of wall was warmup).

Fix: drive a short SYNTHETIC shadow pipeline — same Config knobs, same Caps,
therefore byte-identical jitted program signatures — through a synchronous
Odometry on a daemon thread started at construction of the real pipeline.
By the time the real sequence reaches its first keyframe, every steady-state
program is compiled (or mid-compile, in which case the real pipeline blocks
on the in-flight compile instead of starting its own — jit caches are
process-global and thread-safe). Compiled artifacts also land in the
persistent compilation cache when enabled, so subsequent runs skip even this.

The shadow pipeline records nothing: stage timers are suppressed per-thread
(StageTimer.suppressed) and the shadow Odometry is fully synchronous.
"""

from __future__ import annotations

import copy
import logging
import threading
from typing import Optional

from rd_vio_tpu.utils.metrics import StageTimer

log = logging.getLogger(__name__)


def warmup_solver_programs(config, caps, duration: float = 6.0) -> bool:
    """Run a short synthetic perfect-match sequence through a synchronous
    shadow pipeline, forcing compilation of every solver program the
    tracking phase uses (ft_step, localize+triangulate, keyframe-fused,
    subwindow-fused, marginalize) at the exact static shapes implied by
    (config, caps). Returns (tracked, steady): tracked=True if the shadow
    run reached tracking, steady=True if the fully-fused keyframe program
    verifiably executed (programs first reached only in rarer steady-state
    branches — the pure-rotation subwindow chain, the oversized-window
    marginalization — are NOT covered by this verification and may still
    compile lazily).

    Keyframe-fused coverage is verified, not assumed: that program only
    runs once the sliding window FILLS (frame_num > sliding_window_size), and
    a too-short shadow compiles only the pre-steady localize/refine branch —
    the expensive steady-state program then compiles INSIDE the measured
    phase (BENCH_r03 light: refine 3.9 s mid-phase; r4 cold real: 118 s
    keyframe-fused stall). If the shadow ends without having executed
    builders.solve_keyframe_fused, it reruns once with a 3x longer sequence.
    """
    from rd_vio_tpu.datasets import synthetic
    from rd_vio_tpu.models import builders
    from rd_vio_tpu.models.feature_tracker import SyntheticBackend
    from rd_vio_tpu.models.odometry import Odometry

    tracked = False
    for attempt, dur in enumerate((duration, duration * 3.0)):
        # thread-local counter: only THIS thread's (i.e. the shadow's own)
        # fused-keyframe executions count (ADVICE r4: with a process-global
        # counter a concurrently-live real pipeline could satisfy the break
        # before the shadow compiled anything)
        kf0 = builders.KF_FUSED_COUNT.n
        cfg = copy.deepcopy(config)
        seq = synthetic.generate(duration=dur, n_landmarks=900,
                                 max_keypoints=120)
        cfg.camera_intrinsic = seq.K_mat

        with StageTimer.suppressed():
            odo = Odometry(cfg, SyntheticBackend(seq), caps=caps,
                           threaded=False)
            events = sorted(
                [(t, 1, i) for i, t in enumerate(seq.t_imu)]
                + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
            )
            steady = False
            for t, kind, i in events:
                if kind == 1:
                    odo.add_motion(t, seq.gyro[i], seq.accel[i])
                else:
                    odo.add_frame(t, i)
                    if odo.state() == 1:
                        tracked = True
                    # stop once steady state has executed twice: the first
                    # fused keyframe can trace a no-prior variant, the second
                    # runs the steady with-prior signature — after both,
                    # every program the tracking phase uses is compiled (or
                    # mid-compile on this thread)
                    if builders.KF_FUSED_COUNT.n >= kf0 + 2:
                        steady = True
                        break
            odo.close()
        if steady:
            return tracked, True
        log.warning("warmup shadow run (%.0fs) ended before the window "
                    "filled%s", dur,
                    "; retrying longer" if attempt == 0 else
                    " — steady-state keyframe program NOT warmed")
    return tracked, False


def warmup_image_programs(backend, width: int, height: int,
                          max_points: int, min_dist: float,
                          device_loop: bool = True,
                          kp_cap: Optional[int] = None,
                          num_hypotheses: int = 128) -> None:
    """Compile the per-frame image programs (CLAHE + pyramid preprocess and
    the per-frame frontend step) at the given frame geometry before the real
    pipeline's first frame needs them. With device_loop=True this warms both
    detect variants of ops/frontend_loop.ft_loop_step (the steady-state
    per-frame program); otherwise the legacy fused track_and_detect."""
    import numpy as np

    with StageTimer.suppressed():
        # uint8: the dtype real camera data arrives in (dtype is part of the
        # jit cache key, so the warmup must match the pipeline's input)
        img = np.zeros((height, width), np.uint8)
        a = backend.preprocess(img)
        b = backend.preprocess(img)
        if device_loop and getattr(backend, "supports_device_loop", False):
            import jax.numpy as jnp

            from rd_vio_tpu.models.feature_tracker import FeatureTracker
            from rd_vio_tpu.ops import frontend_loop as fl

            cap = kp_cap or FeatureTracker.KP_CAP
            use_pallas = getattr(backend, "klt_backend", "xla") == "pallas"
            state = fl.init_state(cap)
            K = jnp.asarray(np.diag([400.0, 400.0, 1.0]), jnp.float32)
            import jax

            key = jax.random.PRNGKey(0)
            drop = jnp.zeros(cap, bool)
            R = jnp.eye(3, dtype=jnp.float32)
            for detect in (False, True):
                state, fetch = fl.ft_loop_step(
                    state, a.pyramid, b.pyramid, R, key, drop, K,
                    np.float32(0.01), detect=detect,
                    max_points=int(max_points), min_dist=float(min_dist),
                    num_hypotheses=int(num_hypotheses),
                    use_pallas=use_pallas,
                    interpret=None if use_pallas else False,
                )
            jax.block_until_ready(fetch)
        else:
            pix = np.array([[width * 0.5, height * 0.5]], np.float32)
            backend.track_and_detect(a, b, pix, pix, int(max_points),
                                     float(min_dist))


def start_warmup_thread(config, caps, duration: float = 6.0,
                        extra_configs=()) -> threading.Thread:
    """Fire-and-forget warmup on a daemon thread. Call right after
    constructing the real pipeline; join() it (with a timeout) before
    throughput-sensitive phases — a mid-phase trace/compile stall costs more
    than the wait. `extra_configs`: additional Config objects whose program
    signatures differ (e.g. the light profile: `caps_fast` shapes follow
    sliding_window_subframe_size, so each subframe-size value is its own set
    of jitted programs — VERDICT r3 item 6)."""

    def run():
        import sys
        import time as _time

        for i, cfg in enumerate((config, *extra_configs)):
            try:
                t0 = _time.time()
                tracked, steady = warmup_solver_programs(
                    cfg, caps, duration=duration)
                print(f"[warmup] config {i} done in {_time.time() - t0:.0f}s "
                      f"(tracked={tracked}, steady={steady})",
                      file=sys.stderr, flush=True)
            except Exception:  # noqa: BLE001 — must never kill the host app
                log.warning("solver warmup failed", exc_info=True)

    th = threading.Thread(target=run, name="rdvio-warmup", daemon=True)
    th.start()
    return th
