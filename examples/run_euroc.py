"""EuRoC runner — the reference's examples/test_euroc.cpp equivalent.

Usage:
  python examples/run_euroc.py <mav0_dir> <sensor_yaml> <setting_yaml> [max_frames]

Streams interleaved IMU + frames through the Odometry (native C++ loader with
prefetch when available, Python fallback otherwise) and reports ATE against
state_groundtruth_estimate0 plus throughput.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "JAX_PLATFORMS" in os.environ:
    # honor the env var even when a site plugin force-sets jax_platforms
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) < 3:
        print(__doc__)
        return 2
    mav0, sensor_yaml, setting_yaml = args[:3]
    max_frames = int(args[3]) if len(args) > 3 else None

    from rd_vio_tpu.config import load_config
    from rd_vio_tpu.datasets import euroc
    from rd_vio_tpu.models.image_backend import JaxImageBackend
    from rd_vio_tpu.models.odometry import Odometry
    from rd_vio_tpu.utils.trajectory import associate, ate_rmse
    from rd_vio_tpu import native

    cfg = load_config(sensor_yaml, setting_yaml)
    und = euroc.make_undistorter(cfg)
    backend = JaxImageBackend(cfg)
    odo = Odometry(cfg, backend, threaded="--sync" not in sys.argv)

    # overlap steady-state solver/image compiles with the initializer phase
    if "--no-warmup" not in sys.argv:
        from rd_vio_tpu.utils.warmup import (
            start_warmup_thread, warmup_image_programs,
        )
        import threading

        start_warmup_thread(cfg, odo.caps)
        W_img, H_img = cfg.camera_resolution
        threading.Thread(
            target=warmup_image_programs,
            args=(backend, W_img, H_img,
                  cfg.feature_tracker_max_keypoint_detection,
                  cfg.feature_tracker_min_keypoint_distance),
            kwargs=dict(device_loop=cfg.feature_tracker_device_loop,
                        num_hypotheses=cfg.ransac_hypotheses),
            daemon=True,
        ).start()

    est_t, est_p = [], []
    n = 0
    t0 = time.perf_counter()

    if native.available():
        ds = native.NativeEurocDataset(mav0)
        import jax.numpy as jnp

        events = sorted(
            [(t, 0, i) for i, t in enumerate(ds.imu_t)]
            + [(t, 1, i) for i, t in enumerate(ds.frame_t)]
        )
        gt = euroc.EurocDataset._read_gt(
            f"{mav0}/state_groundtruth_estimate0/data.csv"
        )
        for t, kind, i in events:
            if kind == 0:
                odo.add_motion(t, ds.gyro[i], ds.accel[i])
            else:
                img = ds.load_image(i)
                if und is not None:
                    img = np.asarray(und(img))
                odo.add_frame(t, img)
                n += 1
                if odo.state() == 1:
                    ls = odo.handler.get_latest_state()
                    if ls is not None:
                        est_t.append(ls[0])
                        est_p.append(ls[2])
                if max_frames and n >= max_frames:
                    break
    else:
        est_t, est_p, dsv, odo = euroc.run_euroc(
            mav0, sensor_yaml, setting_yaml, max_frames=max_frames
        )
        gt = dsv.ground_truth
        n = max_frames or len(dsv.frames["t"])

    odo.join()
    wall = time.perf_counter() - t0
    odo.close()
    print(f"frames {n}, tracked {len(est_p)}, wall {wall:.1f}s ({n/wall:.2f} fps)")
    if gt is not None and len(est_p) > 10:
        est_t = np.asarray(est_t)
        est_p = np.asarray(est_p)
        ie, ig = associate(est_t, gt["t"])
        if len(ie) > 10:
            print(f"ATE (SE3-aligned RMSE): {ate_rmse(est_p[ie], gt['p'][ig]):.4f} m "
                  f"over {len(ie)} poses")
    return 0


if __name__ == "__main__":
    sys.exit(main())
