"""A/B: 8-point (batched device eigh) vs Nistér 5-point (host) essential
solver inside the initializer, across motion/scene regimes (SURVEY.md §7a:
dropping E-init changes initializer scoring behavior and must be validated).

Runs the full pipeline on noisy synthetic sequences per (regime, seed) and
records init success + frames-to-init + final ATE for both solvers.

Usage: JAX_PLATFORMS=cpu python scripts/ab_essential.py [--quick]
Writes a markdown table to stdout (pasted into BASELINE.md).
"""

import os
import sys

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from rd_vio_tpu.config import Config
from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.models import builders
from rd_vio_tpu.models.feature_tracker import SyntheticBackend
from rd_vio_tpu.models.odometry import Odometry
from rd_vio_tpu.utils.trajectory import ate_rmse

REGIMES = {
    # (duration, excitation, pixel_noise, extra generate kwargs)
    "nominal": dict(duration=6.0, excitation=0.05, pixel_noise=0.3),
    "low_parallax": dict(duration=6.0, excitation=0.01, pixel_noise=0.3),
    "rotation_heavy": dict(duration=6.0, excitation=0.02, pixel_noise=0.3,
                           period=20.0),
    "noisy": dict(duration=6.0, excitation=0.05, pixel_noise=0.8),
}


def run_once(regime_kwargs, seed, use_5pt):
    seq = synthetic.generate(n_landmarks=900, max_keypoints=120,
                             seed=seed, **regime_kwargs)
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    cfg.initializer_use_5pt = use_5pt
    caps = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)
    odo = Odometry(cfg, SyntheticBackend(seq), caps=caps)
    events = sorted(
        [(t, 1, i) for i, t in enumerate(seq.t_imu)]
        + [(t, 0, i) for i, t in enumerate(seq.t_frame)]
    )
    est_t, est_p = [], []
    first_tracked = None
    nf = 0
    for t, kind, i in events:
        if kind == 1:
            odo.add_motion(t, seq.gyro[i], seq.accel[i])
        else:
            odo.add_frame(t, i)
            nf += 1
            if odo.state() == 1:
                if first_tracked is None:
                    first_tracked = nf
                ls = odo.handler.get_latest_state()
                if ls is not None:
                    est_t.append(ls[0])
                    est_p.append(ls[2])
    odo.join()
    if first_tracked is None or len(est_p) < 10:
        return None
    gt_by_t = {round(tt, 6): p for tt, p in zip(seq.t_frame, seq.p_wb)}
    gt = np.stack([gt_by_t[round(tt, 6)] for tt in est_t])
    return first_tracked, ate_rmse(np.asarray(est_p), gt)


def main():
    quick = "--quick" in sys.argv
    seeds = [648, 7, 23] if not quick else [648]
    print("| regime | solver | init rate | frames-to-init (mean) | ATE m (mean) |")
    print("|---|---|---|---|---|")
    for name, kw in REGIMES.items():
        for use_5pt in (False, True):
            oks, fti, ates = 0, [], []
            for s in seeds:
                r = run_once(kw, s, use_5pt)
                if r is not None:
                    oks += 1
                    fti.append(r[0])
                    ates.append(r[1])
            tag = "5pt" if use_5pt else "8pt"
            fti_s = f"{np.mean(fti):.1f}" if fti else "-"
            ate_s = f"{np.mean(ates):.4f}" if ates else "-"
            print(f"| {name} | {tag} | {oks}/{len(seeds)} | {fti_s} | {ate_s} |",
                  flush=True)


if __name__ == "__main__":
    main()
