"""Concurrent-sequence aggregate throughput ladder (SURVEY §5 scaling axis
(d): sequence-batch parallelism; VERDICT r4 item 1).

Round 4 ran N sequences as N host threads sharing one chip and scaled 1.34x
at N=4 — the GIL serialized the host work and every sequence paid its own
dispatch/fetch latency. Round 5's batched lockstep runtime
(rd_vio_tpu.batch) advances N sequences one frame per tick through ONE
vmapped device dispatch per pipeline stage, so the fixed per-dispatch cost
and the tunnel round trip amortize across the batch.

This script produces the N = 1 / 2 / 4 / 8 ladder for BASELINE.md, each row
with steady-state aggregate frames/s/chip (measured over the second half of
ticks, past compile/init) and the per-N max ATE (the quality gate: batching
must not change per-sequence trajectories).

Usage:
  python scripts/bench_batch.py             # TPU via the axon tunnel
  JAX_PLATFORMS=cpu python scripts/bench_batch.py --quick
  python scripts/bench_batch.py --threads   # round-4 thread model (A/B)

Prints a markdown table for BASELINE.md.
"""

import os
import sys
import time

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rd_vio_tpu.config import Config  # noqa: E402
from rd_vio_tpu.datasets import synthetic  # noqa: E402
from rd_vio_tpu.models import builders  # noqa: E402
from rd_vio_tpu.models.feature_tracker import SyntheticBackend  # noqa: E402
from rd_vio_tpu.utils.metrics import StageTimer  # noqa: E402
from rd_vio_tpu.utils.trajectory import ate_rmse  # noqa: E402

CAPS = builders.Caps(W=15, L=256, O=2560, Fi=16, R=128, IMU=64, IMU_KF=384)


def make_config():
    cfg = Config()
    ref_yaml = "/root/reference/configs/setting.yaml"
    if os.path.exists(ref_yaml):
        from rd_vio_tpu.config import load_config

        cfg = load_config(setting_yaml=ref_yaml)
    cfg.ransac_hypotheses = 128
    return cfg


def make_jobs(n_conc: int, duration: float):
    configs, seqs = [], []
    for s_i in range(n_conc):
        cfg = make_config()
        seq = synthetic.generate(duration=duration, n_landmarks=1200,
                                 max_keypoints=150, seed=648 + 7 * s_i)
        cfg.camera_intrinsic = seq.K_mat
        configs.append(cfg)
        seqs.append(seq)
    return configs, seqs


def seq_ate(seq, est):
    gt = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
    pts = [(p, gt[round(t, 6)]) for t, p in est if round(t, 6) in gt]
    if len(pts) < 20:
        return float("nan")
    return ate_rmse(np.stack([a for a, _ in pts]),
                    np.stack([b for _, b in pts]))


def run_lockstep_n(n_conc: int, duration: float) -> dict:
    from rd_vio_tpu.batch import run_sequences_lockstep
    from rd_vio_tpu.batch.runtime import steady_window_start

    configs, seqs = make_jobs(n_conc, duration)
    backends = [SyntheticBackend(s) for s in seqs]
    t0 = time.perf_counter()
    with StageTimer.suppressed():
        n_frames, est, stamps, kf_flushes = run_sequences_lockstep(
            configs, backends, seqs, caps=CAPS
        )
    wall = time.perf_counter() - t0
    # steady-state rate: ticks past the batched-keyframe transition
    # (full-profile window fills ~tick 120; before that the pipeline runs
    # its unbatched init phase and a midpoint window would mix the two)
    stamps = np.asarray(stamps)
    h = steady_window_start(kf_flushes)
    steady_fps = (len(stamps) - 1 - h) * n_conc / max(
        stamps[-1] - stamps[h], 1e-9
    )
    ates = [seq_ate(s, e) for s, e in zip(seqs, est)]
    return {
        "n": n_conc, "frames": n_frames * n_conc, "wall": wall,
        "agg_fps": n_frames * n_conc / max(wall, 1e-9),
        "steady_fps": steady_fps,
        "ate_max": float(np.nanmax(ates)) if ates else float("nan"),
    }


def run_threads_n(n_conc: int, duration: float) -> dict:
    """Round-4 thread-per-sequence model, kept for the A/B column."""
    from rd_vio_tpu.models.odometry import Odometry
    from rd_vio_tpu.utils import batch_eval

    configs, seqs = make_jobs(n_conc, duration)
    jobs = []
    for name_i, (cfg, seq) in enumerate(zip(configs, seqs)):
        def mk(cfg=cfg, seq=seq):
            return Odometry(cfg, SyntheticBackend(seq), caps=CAPS,
                            threaded=False)

        gt = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
        jobs.append((f"seq{name_i}", mk, _events_of(seq),
                     lambda t, gt=gt: gt[round(t, 6)]))
    t0 = time.perf_counter()
    with StageTimer.suppressed():
        results = batch_eval.run_batch(jobs, parallel=True,
                                       max_workers=n_conc)
    wall = time.perf_counter() - t0
    tot = sum(r.n_frames for r in results.values())
    ates = [r.ate for r in results.values() if r.ate is not None]
    return {
        "n": n_conc, "frames": tot, "wall": wall,
        "agg_fps": tot / max(wall, 1e-9), "steady_fps": float("nan"),
        "ate_max": float(np.max(ates)) if ates else float("nan"),
    }


def _events_of(seq):
    ev = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    return [
        ("imu", t, seq.gyro[i], seq.accel[i]) if k == 1 else ("frame", t, i)
        for t, k, i in ev
    ]


def main():
    quick = "--quick" in sys.argv
    threads = "--threads" in sys.argv
    duration = 6.0 if quick else 10.0
    import jax

    print(f"[bench_batch] backend={jax.default_backend()} "
          f"mode={'threads' if threads else 'lockstep'}",
          file=sys.stderr, flush=True)
    run = run_threads_n if threads else run_lockstep_n

    rows = []
    for n in (1, 2, 4, 8):
        r = run(n, duration)
        rows.append(r)
        print(f"[bench_batch] N={n}: {r['frames']} frames in "
              f"{r['wall']:.1f}s -> whole-run {r['agg_fps']:.2f}, steady "
              f"{r['steady_fps']:.2f} frames/s/chip "
              f"(max ATE {r['ate_max']:.4f} m)", file=sys.stderr, flush=True)

    print("\n| N sequences | frames | wall s | whole-run fps/chip | "
          "steady fps/chip | speedup vs N=1 | max ATE m |")
    print("|---|---|---|---|---|---|---|")
    base = rows[0]["steady_fps"] if not threads else rows[0]["agg_fps"]
    for r in rows:
        key = r["agg_fps"] if threads else r["steady_fps"]
        print(f"| {r['n']} | {r['frames']} | {r['wall']:.1f} | "
              f"{r['agg_fps']:.2f} | {r['steady_fps']:.2f} | "
              f"{key / base:.2f}x | {r['ate_max']:.4f} |")


if __name__ == "__main__":
    main()
