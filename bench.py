"""Benchmark: end-to-end VIO frames/s + ATE on a synthetic EuRoC-like sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is end-to-end VIO frames/s on one chip (the BASELINE.md target is
>= 5x the reference CPU ingest pacing of ~33 fps); ATE and stage details go to
stderr. Runs on whatever backend jax.devices() provides (the real TPU chip
under the driver; CPU elsewhere).
"""

import json
import sys
import time

import numpy as np


def main():
    from rd_vio_tpu.config import Config
    from rd_vio_tpu.datasets import synthetic
    from rd_vio_tpu.models import builders
    from rd_vio_tpu.models.feature_tracker import SyntheticBackend
    from rd_vio_tpu.models.odometry import Odometry
    from rd_vio_tpu.utils.trajectory import ate_rmse

    import jax

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    # optional profiler trace (SURVEY.md §5 tracing): bench.py --profile <dir>
    if "--profile" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--profile") + 1]
        jax.profiler.start_trace(trace_dir)
        import atexit

        atexit.register(jax.profiler.stop_trace)

    duration = 8.0
    seq = synthetic.generate(duration=duration, n_landmarks=1200, max_keypoints=150)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)
    # threaded two-stage pipeline (the reference's THREADING=ON default):
    # feature tracking overlaps the optimizer; pass --sync for inline dispatch
    threaded = "--sync" not in sys.argv
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps, threaded=threaded)

    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )

    est_t, est_p = [], []
    n_frames = 0
    t_track_start = None
    frames_tracked = 0
    t0 = time.perf_counter()
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
            n_frames += 1
            if n_frames % 25 == 0:
                print(f"[bench] frame {n_frames} state {odo.state()} "
                      f"t={time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)
            if odo.state() == 1:
                frames_tracked += 1
                # exclude initialization + jit compile warmup from throughput:
                # the first tracked frames still trigger cold compiles of the
                # subwindow/window/marginalization programs
                if t_track_start is None and frames_tracked == 16:
                    t_track_start = time.perf_counter()
                    frames_at_timing_start = frames_tracked
                ls = odo.handler.get_latest_state()
                if ls is not None and (not est_t or ls[0] != est_t[-1]):
                    est_t.append(ls[0])
                    est_p.append(ls[2])
    odo.join()  # drain both pipeline stages (no-op in --sync mode)
    t_end = time.perf_counter()
    odo.close()

    if t_track_start is None or frames_tracked < 20:
        print(json.dumps({"metric": "vio_frames_per_s_per_chip", "value": 0.0,
                          "unit": "frames/s", "vs_baseline": 0.0}))
        print("[bench] FAILED to reach tracking", file=sys.stderr)
        return

    # throughput over the steady-state tracked portion
    fps = (frames_tracked - frames_at_timing_start) / max(t_end - t_track_start, 1e-9)

    est_p = np.asarray(est_p)
    gt_by_t = {round(tt, 6): p for tt, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(tt, 6)] for tt in est_t])
    ate = ate_rmse(est_p, gt)

    print(f"[bench] total wall {t_end - t0:.1f}s, frames {n_frames}, "
          f"tracked {frames_tracked}, fps {fps:.2f}, ATE {ate:.4f} m",
          file=sys.stderr)
    from rd_vio_tpu.utils.metrics import GLOBAL_TIMER

    for stage, st in sorted(GLOBAL_TIMER.stats().items()):
        print(f"[bench] stage {stage}: mean {st['mean_ms']:.1f} ms "
              f"p50 {st['p50_ms']:.1f} p90 {st['p90_ms']:.1f} (n={st['n']})",
              file=sys.stderr)

    # reference baseline: the reference example paces ingest at ~33 fps
    # (BASELINE.md: test_euroc.cpp sleeps 30 ms/frame); target is >= 5x.
    baseline_fps = 33.0
    print(json.dumps({
        "metric": "vio_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
