"""Run the VIO pipeline on an ADVIO sequence and report the trajectory.

The equivalent of the reference's examples/test_advio runner
(dataset.hpp:633-821 ADVIO class + addAcc/addGyro streaming).

Usage: python examples/run_advio.py <advio_root_or_seq_dir> [seq_id]
           [--setting <setting.yaml>] [--max-frames N] [--no-undistort]

Accepts either the dataset root containing advio-XX/ or a sequence directory
itself. frames.mov is demuxed in-process when MJPEG; for H.264 sequences
extract once with `ffmpeg -i frames.mov -vsync 0 iphone/frames/%06d.png`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        sys.exit(2)
    advio_dir = args[0]
    seq_id = int(args[1]) if len(args) > 1 else 1
    setting = None
    if "--setting" in sys.argv:
        setting = sys.argv[sys.argv.index("--setting") + 1]
    max_frames = None
    if "--max-frames" in sys.argv:
        max_frames = int(sys.argv[sys.argv.index("--max-frames") + 1])

    from rd_vio_tpu.datasets.advio import run_advio

    est_t, est_p, ds, odo = run_advio(
        advio_dir, seq_id=seq_id, setting_yaml=setting, max_frames=max_frames,
        undistort="--no-undistort" not in sys.argv,
    )
    odo.join()
    print(f"frames {len(ds.frames['t'])}, tracked poses {len(est_p)}")
    if len(est_p):
        p = np.asarray(est_p)
        print(f"trajectory extent: {np.ptp(p, axis=0).round(3)} m")


if __name__ == "__main__":
    main()
