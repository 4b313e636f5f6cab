"""Benchmark: end-to-end VIO frames/s + ATE on a synthetic EuRoC-like sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (+ optional
"diagnostic"/"ate_m"/"platform" detail keys) and ALWAYS exits 0.

Capture-proof design (round-1 failure: the axon TPU tunnel hung/errored at
backend init and the bench died with rc=1 and no JSON):

  supervisor (default)    probes the backend in a SUBPROCESS with a hard
                          timeout + retry/backoff (an unreachable tunnel can
                          hang jax.devices() in-process indefinitely, where
                          no signal can interrupt the C call), then runs the
                          actual bench in a child process under a wall-clock
                          budget and relays its JSON line; on child
                          failure/timeout it emits a diagnostic JSON itself.
  --worker                the real bench (invoked by the supervisor).
  --cpu                   force the CPU backend (used for the fallback).
  --sync                  synchronous pipeline instead of threaded.
  --profile <dir>         write a jax.profiler trace.

The metric is end-to-end VIO frames/s on one chip (BASELINE.md target:
>= 5x the reference CPU ingest pacing of ~33 fps); ATE and per-stage timing
go to stderr.
"""

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_FPS = 33.0  # reference example ingest pacing (test_euroc.cpp:61,77)

# wall-clock budgets (seconds); RDVIO_BENCH_* env vars override
PROBE_TIMEOUT = float(os.environ.get("RDVIO_BENCH_PROBE_TIMEOUT", "120"))
PROBE_RETRIES = int(os.environ.get("RDVIO_BENCH_PROBE_RETRIES", "2"))
PROBE_BACKOFF = float(os.environ.get("RDVIO_BENCH_PROBE_BACKOFF", "15"))
RUN_BUDGET = float(os.environ.get("RDVIO_BENCH_BUDGET", "1500"))


def _emit(value=0.0, diagnostic=None, **extra):
    out = {
        "metric": "vio_frames_per_s_per_chip",
        "value": round(float(value), 3),
        "unit": "frames/s",
        "vs_baseline": round(float(value) / BASELINE_FPS, 3),
    }
    if diagnostic:
        out["diagnostic"] = str(diagnostic)[:500]
    out.update(extra)
    print(json.dumps(out), flush=True)


# ---------------------------------------------------------------------------
# supervisor
# ---------------------------------------------------------------------------

_PROBE_CODE = """
import jax
d = jax.devices()
import jax.numpy as jnp
(jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
print("PLATFORM=" + d[0].platform, flush=True)
"""


def probe_backend():
    """Try to bring up the configured (TPU) backend in a subprocess.
    Returns (platform, None) on success or (None, diagnostic)."""
    err = "unknown"
    for attempt in range(PROBE_RETRIES + 1):
        if attempt:
            print(f"[bench] backend probe retry {attempt} in "
                  f"{PROBE_BACKOFF:.0f}s ({err})", file=sys.stderr, flush=True)
            time.sleep(PROBE_BACKOFF)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT,
            )
        except subprocess.TimeoutExpired:
            err = f"backend probe hung > {PROBE_TIMEOUT:.0f}s (tunnel down?)"
            continue
        if r.returncode == 0 and "PLATFORM=" in r.stdout:
            platform = r.stdout.rsplit("PLATFORM=", 1)[1].strip()
            print(f"[bench] backend probe ok: {platform} "
                  f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)
            return platform, None
        tail = (r.stderr or r.stdout or "").strip().splitlines()
        err = tail[-1] if tail else f"probe rc={r.returncode}"
    return None, err


def supervise(argv):
    t0 = time.time()
    platform, perr = probe_backend()
    child_env = dict(os.environ)
    cmd = [sys.executable, os.path.abspath(__file__), "--worker"] + argv
    diag = None
    if platform is None:
        diag = f"TPU backend unavailable ({perr}); CPU fallback"
        print(f"[bench] {diag}", file=sys.stderr, flush=True)
        cmd.append("--cpu")
        platform = "cpu"

    budget = max(RUN_BUDGET - (time.time() - t0), 60.0)
    child_env["RDVIO_BENCH_WORKER_BUDGET"] = str(budget)
    try:
        r = subprocess.run(
            cmd, env=child_env, timeout=budget + 30.0,
            stdout=subprocess.PIPE, stderr=None, text=True,
        )
        out = r.stdout or ""
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        diag = (diag or "") + f" bench worker exceeded {budget:.0f}s budget"
    # relay the worker's own JSON line if it printed one
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if diag and "diagnostic" not in parsed:
                parsed["diagnostic"] = diag
            if "platform" not in parsed:
                parsed["platform"] = platform
            print(json.dumps(parsed), flush=True)
            return
    _emit(0.0, diagnostic=(diag or "bench worker produced no JSON line"),
          platform=platform)


# ---------------------------------------------------------------------------
# worker — the actual benchmark
# ---------------------------------------------------------------------------

def worker(argv):
    force_cpu = "--cpu" in argv
    if force_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if force_cpu:
        # honor the override even when a site plugin force-sets jax_platforms
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: the pipeline's fused programs take minutes
    # of host-CPU XLA compile on first run; caching them on disk makes every
    # subsequent bench (same shapes/config) start in seconds
    if "--no-cache" not in argv:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception as e:  # noqa: BLE001 — cache is best-effort
            print(f"[bench] compile cache unavailable: {e}",
                  file=sys.stderr, flush=True)

    from rd_vio_tpu.config import Config
    from rd_vio_tpu.datasets import synthetic
    from rd_vio_tpu.models import builders
    from rd_vio_tpu.models.feature_tracker import SyntheticBackend
    from rd_vio_tpu.models.odometry import Odometry
    from rd_vio_tpu.utils.trajectory import ate_rmse

    import numpy as np

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr, flush=True)

    # in-worker watchdog: fire before the supervisor's hard kill so a slow
    # (but not hung) run still reports the fps measured so far
    budget = float(os.environ.get("RDVIO_BENCH_WORKER_BUDGET", "0"))
    if budget > 0 and hasattr(signal, "SIGALRM"):
        def _alarm(signum, frm):
            raise TimeoutError(f"bench watchdog at {budget * 0.92:.0f}s")

        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(max(int(budget * 0.92), 30))

    # optional profiler trace (SURVEY.md §5 tracing): bench.py --profile <dir>
    if "--profile" in argv:
        trace_dir = argv[argv.index("--profile") + 1]
        jax.profiler.start_trace(trace_dir)
        import atexit

        atexit.register(jax.profiler.stop_trace)

    duration = 8.0
    seq = synthetic.generate(duration=duration, n_landmarks=1200, max_keypoints=150)
    if "--light" in argv:
        # round-1 configuration (code defaults: parsac off, window 10,
        # 3 subframes, 10 solver iterations) — kept for ladder comparisons
        cfg = Config()
    else:
        # DEFAULT: the reference's shipped configuration — setting.yaml
        # semantics (parsac ON, window 12, 5 subframes, 30 LM iterations,
        # keyframe_check 1); loads the actual file when present
        ref_yaml = "/root/reference/configs/setting.yaml"
        if os.path.exists(ref_yaml):
            from rd_vio_tpu.config import load_config

            cfg = load_config(setting_yaml=ref_yaml)
        else:
            cfg = Config()
            cfg.sliding_window_size = 12
            cfg.sliding_window_subframe_size = 5
            cfg.sliding_window_force_keyframe_landmarks = 50
            cfg.feature_tracker_min_keypoint_distance = 10.0
            cfg.feature_tracker_max_keypoint_detection = 200
            cfg.feature_tracker_max_frames = 20
            cfg.solver_iteration_limit = 30
            cfg.rotation_misalignment_threshold = 0.02
            cfg.parsac_flag = True
            cfg.parsac_dynamic_probability = 0.15
            cfg.parsac_threshold = 1.0
            cfg.parsac_keyframe_check_size = 1
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    caps = builders.Caps(W=cfg.sliding_window_size + 3, L=256, O=1536,
                         Fi=16, R=128, IMU=64, IMU_KF=384)
    # threaded two-stage pipeline (the reference's THREADING=ON default):
    # feature tracking overlaps the optimizer; pass --sync for inline dispatch
    threaded = "--sync" not in argv
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps, threaded=threaded)

    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )

    est_t, est_p = [], []
    n_frames = 0
    tracked_wall = []  # wall-clock timestamp per tracked frame
    diag = None
    t0 = time.perf_counter()
    try:
        for t, kind, i in events:
            if kind == 1:
                odo.add_motion(t, seq.gyro[i], seq.accel[i])
            else:
                odo.add_frame(t, i)
                n_frames += 1
                if n_frames % 25 == 0:
                    print(f"[bench] frame {n_frames} state {odo.state()} "
                          f"t={time.perf_counter() - t0:.0f}s",
                          file=sys.stderr, flush=True)
                if odo.state() == 1:
                    tracked_wall.append(time.perf_counter())
                    ls = odo.handler.get_latest_state()
                    if ls is not None and (not est_t or ls[0] != est_t[-1]):
                        est_t.append(ls[0])
                        est_p.append(ls[2])
        odo.join()  # drain both pipeline stages (no-op in --sync mode)
        tracked_wall.append(time.perf_counter())  # pipeline fully drained
        t_end = tracked_wall[-1]
        odo.close()
    except Exception as e:  # noqa: BLE001 — report what we measured anyway
        t_end = time.perf_counter()
        diag = f"{type(e).__name__}: {e}"
        print(f"[bench] pipeline error: {diag}", file=sys.stderr, flush=True)
    if hasattr(signal, "SIGALRM"):
        signal.alarm(0)  # measurement done; don't interrupt reporting

    frames_tracked = max(len(tracked_wall) - 1, 0)
    if frames_tracked < 20:
        _emit(0.0, diagnostic=diag or "failed to reach tracking")
        return

    # throughput over the steady-state tracked portion: the SECOND HALF of
    # tracked frames. Cold XLA compiles fire not just at tracking start but
    # on the first keyframe, first window-full solve, first marginalization
    # etc. — a fixed warmup count undercounts them (round-2 lesson: the
    # number came out 10x low); the trailing half is past every cold compile
    # while still averaging ~60 frames
    half = len(tracked_wall) // 2
    fps = (len(tracked_wall) - 1 - half) / max(tracked_wall[-1] - tracked_wall[half], 1e-9)

    ate = float("nan")
    try:
        est_pa = np.asarray(est_p)
        gt_by_t = {round(tt, 6): p for tt, p in zip(seq.t_frame, seq.p_wb)}
        gt = np.stack([gt_by_t[round(tt, 6)] for tt in est_t])
        ate = ate_rmse(est_pa, gt)
    except Exception as e:  # noqa: BLE001
        diag = diag or f"ATE computation failed: {e}"

    print(f"[bench] total wall {t_end - t0:.1f}s, frames {n_frames}, "
          f"tracked {frames_tracked}, fps {fps:.2f}, ATE {ate:.4f} m",
          file=sys.stderr, flush=True)
    from rd_vio_tpu.utils.metrics import GLOBAL_TIMER

    for stage, st in sorted(GLOBAL_TIMER.stats().items()):
        print(f"[bench] stage {stage}: mean {st['mean_ms']:.1f} ms "
              f"p50 {st['p50_ms']:.1f} p90 {st['p90_ms']:.1f} (n={st['n']})",
              file=sys.stderr, flush=True)

    _emit(fps, diagnostic=diag, ate_m=round(ate, 5),
          platform=jax.devices()[0].platform)


def main():
    argv = sys.argv[1:]
    if "--worker" in argv:
        argv.remove("--worker")
        try:
            worker(argv)
        except Exception as e:  # noqa: BLE001 — the JSON line must still appear
            _emit(0.0, diagnostic=f"{type(e).__name__}: {e}")
        return
    try:
        supervise(argv)
    except Exception as e:  # noqa: BLE001
        _emit(0.0, diagnostic=f"supervisor error: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
