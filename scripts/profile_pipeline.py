"""Host-side profiling of the synthetic end-to-end pipeline (CPU backend).

Usage: python scripts/profile_pipeline.py [duration_s] [--cprofile]

Prints per-stage wall times and (optionally) a cProfile top-40 to locate
Python hotspots independent of device latency.
"""

import cProfile
import pstats
import sys
import time

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(duration=6.0):
    import jax
    jax.config.update("jax_platforms", "cpu")

    from rd_vio_tpu.config import Config
    from rd_vio_tpu.datasets import synthetic
    from rd_vio_tpu.models import builders
    from rd_vio_tpu.models.feature_tracker import SyntheticBackend
    from rd_vio_tpu.models.odometry import Odometry

    seq = synthetic.generate(duration=duration, n_landmarks=1200, max_keypoints=150)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps)

    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    n_frames = 0
    t_track = None
    frames_tracked = 0
    t0 = time.perf_counter()
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
            n_frames += 1
            if odo.state() == 1:
                if t_track is None:
                    t_track = time.perf_counter()
                frames_tracked += 1
    t1 = time.perf_counter()
    fps = (frames_tracked - 1) / max(t1 - (t_track or t0), 1e-9)
    print(f"frames {n_frames} tracked {frames_tracked} "
          f"total {t1-t0:.1f}s tracked-fps {fps:.2f}")


if __name__ == "__main__":
    dur = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 6.0
    if "--cprofile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        run(dur)
        pr.disable()
        pr.dump_stats("/tmp/pipeline.pstats")
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(40)
    else:
        run(dur)
