"""Concurrent-sequence aggregate throughput table (VERDICT r3 item 2,
SURVEY §5 scaling axis (d): sequence-batch parallelism).

Runs N independent synthetic sequences concurrently through shared compiled
executables (one Odometry per sequence, thread-level overlap of host work;
device programs serialize on the one chip) and reports aggregate
frames/s/chip for N = 1, 2, 4, 8. This is the honest frames/s/chip number
for a deployment that processes many camera streams: single-sequence fps is
latency-bound by the ~25 ms host<->device round trip of the tunnel, while
the chip itself is idle most of each frame.

Usage:
  python scripts/bench_batch.py             # TPU via the axon tunnel
  JAX_PLATFORMS=cpu python scripts/bench_batch.py --quick

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
from rd_vio_tpu.models.odometry import Odometry  # noqa: E402
from rd_vio_tpu.utils import batch_eval  # noqa: E402
from rd_vio_tpu.utils.metrics import StageTimer  # noqa: E402

CAPS = builders.Caps(W=15, L=256, O=2560, Fi=16, R=128, IMU=64, IMU_KF=384)


def make_config():
    cfg = Config()
    ref_yaml = "/root/reference/configs/setting.yaml"
    if os.path.exists(ref_yaml):
        from rd_vio_tpu.config import load_config

        cfg = load_config(setting_yaml=ref_yaml)
    cfg.ransac_hypotheses = 128
    return cfg


def events_of(seq):
    ev = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    return [
        ("imu", t, seq.gyro[i], seq.accel[i]) if k == 1 else ("frame", t, i)
        for t, k, i in ev
    ]


def run_n(n_conc: int, duration: float) -> dict:
    jobs = []
    for s_i in range(n_conc):
        cfg = make_config()
        seq = synthetic.generate(duration=duration, n_landmarks=1200,
                                 max_keypoints=150, seed=648 + 7 * s_i)
        cfg.camera_intrinsic = seq.K_mat

        def mk(cfg=cfg, seq=seq):
            return Odometry(cfg, SyntheticBackend(seq), caps=CAPS,
                            threaded=False)

        gt = {round(t, 6): p for t, p in zip(seq.t_frame, seq.p_wb)}
        jobs.append((f"seq{s_i}", mk, events_of(seq),
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
        "agg_fps": tot / max(wall, 1e-9),
        "ate_max": float(np.max(ates)) if ates else float("nan"),
    }


def main():
    quick = "--quick" in sys.argv
    duration = 4.0 if quick else 8.0
    import jax

    print(f"[bench_batch] backend={jax.default_backend()}", file=sys.stderr,
          flush=True)
    # warm all executables with one short solo run first
    run_n(1, 3.0)

    rows = []
    for n in (1, 2, 4, 8):
        r = run_n(n, duration)
        rows.append(r)
        print(f"[bench_batch] N={n}: {r['frames']} frames in "
              f"{r['wall']:.1f}s -> {r['agg_fps']:.2f} frames/s/chip "
              f"(max ATE {r['ate_max']:.4f} m)", file=sys.stderr, flush=True)

    print("\n| N sequences | frames | wall s | aggregate fps/chip | "
          "speedup vs N=1 | max ATE m |")
    print("|---|---|---|---|---|---|")
    base = rows[0]["agg_fps"]
    for r in rows:
        print(f"| {r['n']} | {r['frames']} | {r['wall']:.1f} | "
              f"{r['agg_fps']:.2f} | {r['agg_fps'] / base:.2f}x | "
              f"{r['ate_max']:.4f} |")


if __name__ == "__main__":
    main()
