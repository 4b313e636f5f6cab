"""Judge hypothesis-budget A/B (VERDICT r4 item 7).

Round 4 capped the host PARSAC twins at a FIXED 64 hypotheses "derived from
the reference's adaptive bound at inlier ratio >= 0.68" — but the reference
bound (util/ransac.h:72-77) adapts UP when the ratio is worse, exactly the
dynamic-heavy scenes IMU-PARSAC exists for. Round 5 made the host twins
reference-adaptive (chunked evaluation to N = log(1-conf)/log(1-r^5), cap
`parsac_max_iteration`). This script compares, on a dynamic-rigid-object
scene (datasets/synthetic dynamic_mode="rigid"):

  fixed-64      chunk=64,  cap=64    (the round-4 behavior)
  fixed-256     chunk=256, cap=256
  adaptive-1000 chunk=64,  cap=1000  (round-5 default; reference parity)

per variant: dynamic-track label precision/recall at the end of the run,
full-trajectory ATE, and the judge's host ms/frame.

Usage: JAX_PLATFORMS=cpu python scripts/ab_judge_budget.py [--quick]
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
from rd_vio_tpu.models.map import TB_STATIC  # noqa: E402
from rd_vio_tpu.models.odometry import Odometry  # noqa: E402
from rd_vio_tpu.utils.trajectory import ate_rmse  # noqa: E402

CAPS = builders.Caps(W=13, L=256, O=1536, Fi=16, R=128, IMU=64, IMU_KF=384)


def run_variant(chunk, cap, duration, seed=11):
    seq = synthetic.generate(
        duration=duration, n_landmarks=1200, max_keypoints=150, seed=seed,
        n_dynamic=60, dynamic_velocity=1.0, dynamic_mode="rigid",
    )
    cfg = Config()
    cfg.camera_intrinsic = seq.K_mat
    cfg.ransac_hypotheses = 128
    cfg.parsac_flag = True
    cfg.parsac_dynamic_probability = 0.15
    cfg.parsac_threshold = 1.0
    cfg.parsac_judge_hypotheses = chunk
    cfg.parsac_max_iteration = cap
    odo = Odometry(cfg, SyntheticBackend(seq), caps=CAPS)

    from rd_vio_tpu.utils.metrics import GLOBAL_TIMER

    GLOBAL_TIMER.reset()

    # cumulative dynamic-label counts, sampled after every judge decision
    # (dynamic tracks are trashed and pruned soon after labeling — end-of-run
    # state would undercount to zero): per judged frame, each current
    # keypoint whose track is labeled dynamic (~TB_STATIC) scores TP if its
    # ground-truth landmark moves, FP otherwise; unlabeled moving landmarks
    # score FN
    from rd_vio_tpu.models.sliding_window_tracker import SlidingWindowTracker

    counts = {"tp": 0, "fp": 0, "fn": 0}
    dyn_gt = set(int(x) for x in seq.dynamic_ids) \
        if seq.dynamic_ids is not None else set()
    Km_np = np.asarray(cfg.camera_intrinsic)
    t_of = {round(tt, 9): i for i, tt in enumerate(seq.t_frame)}
    orig_decide = SlidingWindowTracker._judge_decide

    def counting_decide(self, asm):
        r = orig_decide(self, asm)
        st = self.map.store
        fr = self.map.get_frame(self.map.frame_num - 1)
        fidx = t_of.get(round(fr.t, 9))
        if fidx is None:
            return r
        ids = seq.kp_id[fidx]
        pix = seq.kp_pixel[fidx]
        msel = ids >= 0
        pix_v, ids_v = pix[msel], ids[msel]
        sel = np.flatnonzero(fr.track_ids >= 0)
        if len(sel) == 0 or len(ids_v) == 0:
            return r
        b = fr.bearings[sel]
        px = np.stack([
            b[:, 0] / b[:, 2] * Km_np[0, 0] + Km_np[0, 2],
            b[:, 1] / b[:, 2] * Km_np[1, 1] + Km_np[1, 2],
        ], axis=-1)
        d = np.linalg.norm(px[:, None] - pix_v[None], axis=-1)
        j = np.argmin(d, axis=1)
        hit = d[np.arange(len(px)), j] <= 1e-4
        rows = st.rows_of(fr.track_ids[sel])
        lab_dyn = (st.flags[np.clip(rows, 0, None)] & TB_STATIC) == 0
        for k in np.flatnonzero(hit & (rows >= 0)):
            is_dyn = int(ids_v[j[k]]) in dyn_gt
            if lab_dyn[k] and is_dyn:
                counts["tp"] += 1
            elif lab_dyn[k] and not is_dyn:
                counts["fp"] += 1
            elif is_dyn:
                counts["fn"] += 1
        return r

    SlidingWindowTracker._judge_decide = counting_decide
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
            odo.add_frame(t, i)
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None and (not est_t or ls[0] != est_t[-1]):
                    est_t.append(ls[0])
                    est_p.append(ls[2])
    wall = time.perf_counter() - t0
    SlidingWindowTracker._judge_decide = orig_decide

    stats = GLOBAL_TIMER.stats()
    judge_ms = sum(
        stats.get(k, {}).get("mean_ms", 0.0) * stats.get(k, {}).get("n", 0)
        for k in ("swt.judge", "swt.judge_asm", "swt.update_status")
    ) / max(len(est_t), 1)
    prec = counts["tp"] / max(counts["tp"] + counts["fp"], 1)
    rec = counts["tp"] / max(counts["tp"] + counts["fn"], 1)
    ate = float("nan")
    if len(est_t) > 20:
        gt_by_t = {round(tt, 6): p for tt, p in zip(seq.t_frame, seq.p_wb)}
        gt = np.stack([gt_by_t[round(tt, 6)] for tt in est_t])
        ate = ate_rmse(np.asarray(est_p), gt)
    return dict(ate=ate, prec=prec, rec=rec, judge_ms=judge_ms, wall=wall,
                tracked=len(est_t))


def main():
    quick = "--quick" in sys.argv
    duration = 6.0 if quick else 8.0
    variants = [
        ("fixed-64 (round-4)", 64, 64),
        ("fixed-256", 256, 256),
        ("adaptive-1000 chunk-64", 64, 1000),
        ("adaptive-1000 chunk-32 (round-5 default)", 32, 1000),
    ]
    rows = []
    for name, chunk, cap in variants:
        r = run_variant(chunk, cap, duration)
        rows.append((name, r))
        print(f"[ab_judge] {name}: ATE {r['ate']:.4f} m, dyn-label "
              f"P {r['prec']:.2f} R {r['rec']:.2f}, judge {r['judge_ms']:.2f}"
              f" ms/frame, tracked {r['tracked']}", file=sys.stderr,
              flush=True)
    print("\n| judge budget | ATE m | dyn precision | dyn recall | "
          "judge host ms/frame |")
    print("|---|---|---|---|---|")
    for name, r in rows:
        print(f"| {name} | {r['ate']:.4f} | {r['prec']:.2f} | "
              f"{r['rec']:.2f} | {r['judge_ms']:.2f} |")


if __name__ == "__main__":
    main()
