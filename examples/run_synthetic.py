"""Run the full VIO pipeline on a synthetic sequence and report ATE.

The synthetic analogue of the reference's examples/test_euroc.cpp runner.

Usage: python examples/run_synthetic.py [duration_s] [--images] [--threaded]
  --images    render pixel images and use the real CLAHE/GFTT/KLT frontend
              instead of the perfect-match backend.
  --klt-pallas  with --images: track with the Pallas LK kernel
              (ops/image/klt_pallas) instead of the XLA tracker.
  --threaded  run the two-stage pipeline (feature tracker / optimizer worker
              threads, the reference's THREADING=ON model) instead of inline
              synchronous dispatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "JAX_PLATFORMS" in os.environ:
    # honor the env var even when a site plugin force-sets jax_platforms
    # (e.g. a TPU relay plugin that would otherwise block retrying a dead
    # tunnel at backend init)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils.trajectory import ate_rmse


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 10.0
    use_images = "--images" in sys.argv

    seq = synthetic.generate(duration=duration, n_landmarks=1200, max_keypoints=150)
    cfg = Config()
    if use_images:
        from rd_vio_tpu.datasets.renderer import SequenceRenderer
        from rd_vio_tpu.models.image_backend import JaxImageBackend

        rend = SequenceRenderer(seq, image_size=(320, 240))
        cfg.camera_intrinsic = rend.K
        cfg.camera_resolution = (320, 240)
        cfg.feature_tracker_min_keypoint_distance = 12.0
        if "--klt-pallas" in sys.argv:
            cfg.klt_backend = "pallas"
        backend = JaxImageBackend(cfg, kp_cap=256)
        image_of = rend.render
    else:
        from rd_vio_tpu.models.feature_tracker import SyntheticBackend

        cfg.camera_intrinsic = seq.K_mat
        backend = SyntheticBackend(seq)
        image_of = lambda i: i

    threaded = "--threaded" in sys.argv
    odo = Odometry(cfg, backend, threaded=threaded)
    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    est_t, est_p = [], []
    t0 = time.perf_counter()
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, image_of(i))
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None:
                    est_t.append(ls[0])
                    est_p.append(ls[2])
    if threaded:
        odo.join()  # drain both pipeline stages before measuring
    wall = time.perf_counter() - t0

    if not est_p:
        odo.close()
        print("never reached tracking")
        return 1
    est_p = np.asarray(est_p)
    gt_by_t = {round(tt, 6): p for tt, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(tt, 6)] for tt in est_t])
    print(f"frames {len(seq.t_frame)}, tracked {len(est_p)}, wall {wall:.1f}s "
          f"({len(seq.t_frame)/wall:.2f} fps)")
    print(f"ATE (SE3-aligned RMSE): {ate_rmse(est_p, gt):.4f} m")
    print(f"landmarks: {len(odo.local_map())}")
    odo.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
