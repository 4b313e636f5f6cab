"""Checkpoint / resume of the full VIO estimator state.

The reference keeps everything in RAM with no persistence (SURVEY.md §5
"Checkpoint/resume: none"). Here the sliding-window tracker state — window
frames (poses/motion/keypoints/links), landmark table, marginalization prior,
PARSAC bin confidences, PRNG keys — serializes to one .npz, enabling resume
and golden-state regression tests.
"""

from __future__ import annotations

import io
import json
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from rd_vio_tpu.estimation import factors as F
from rd_vio_tpu.models.map import Frame, Map, Track
from rd_vio_tpu.utils.host import fetch


def _frame_to_dict(f: Frame, prefix: str, out: dict):
    out[prefix + "id"] = np.int64(f.id)
    out[prefix + "t"] = np.float64(f.t)
    for attr in ("q", "p", "v", "bg", "ba", "bearings", "track_ids",
                 "imu_dt", "imu_w", "imu_a"):
        out[prefix + attr] = np.asarray(getattr(f, attr))
    out[prefix + "flags"] = np.asarray(sorted(f.flags), dtype=object)


def _frame_from_dict(d: dict, prefix: str) -> Frame:
    f = Frame(float(d[prefix + "t"]))
    f.id = int(d[prefix + "id"])
    for attr in ("q", "p", "v", "bg", "ba", "bearings", "imu_dt", "imu_w", "imu_a"):
        setattr(f, attr, np.asarray(d[prefix + attr]))
    f.track_ids = np.asarray(d[prefix + "track_ids"], dtype=np.int64)
    f.flags = set(str(x) for x in d[prefix + "flags"])
    return f


def save_tracker(path: str, swt) -> None:
    """Serialize a SlidingWindowTracker (window + subframes + tracks + prior)."""
    swt.drain_pending()  # checkpoint the applied (not in-flight) states
    out = {}
    m = swt.map
    frames = list(m.frames)
    out["n_frames"] = np.int64(len(frames))
    for i, f in enumerate(frames):
        _frame_to_dict(f, f"f{i}_", out)
        out[f"f{i}_nsub"] = np.int64(len(f.subframes))
        for j, sub in enumerate(f.subframes):
            _frame_to_dict(sub, f"f{i}_s{j}_", out)

    tracks = list(m.tracks.values())
    out["n_tracks"] = np.int64(len(tracks))
    track_meta = []
    for t in tracks:
        track_meta.append({
            "id": t.id,
            "obs": {str(k): int(v) for k, v in t.obs.items()},
            "inv_depth": float(t.inv_depth),
            "life": int(t.life),
            "flags": sorted(t.flags),
        })
    out["tracks_json"] = np.asarray(json.dumps(track_meta), dtype=object)

    if swt.prior is not None:
        prior = fetch(swt.prior)
        for name, arr in zip(F.PriorFactor._fields, prior):
            out["prior_" + name] = np.asarray(arr)
    out["m_th"] = np.float64(swt.m_th)
    out["bin_conf_imu"] = np.asarray(fetch(swt.bin_conf_imu))
    out["bin_conf_2d2d"] = np.asarray(fetch(swt.bin_conf_2d2d))
    out["rng_key"] = np.asarray(fetch(swt._rng_key))
    out["host_seed_ctr"] = np.int64(swt._host_seed_ctr)

    with open(path, "wb") as fh:
        np.savez_compressed(fh, **out)


def load_tracker(path: str, config, calib, caps):
    """Reconstruct a SlidingWindowTracker from a checkpoint."""
    from rd_vio_tpu.models.sliding_window_tracker import SlidingWindowTracker

    d = dict(np.load(path, allow_pickle=True))
    m = Map()
    n = int(d["n_frames"])
    for i in range(n):
        f = _frame_from_dict(d, f"f{i}_")
        nsub = int(d[f"f{i}_nsub"])
        for j in range(nsub):
            f.subframes.append(_frame_from_dict(d, f"f{i}_s{j}_"))
        m.attach_frame(f)

    for meta in json.loads(str(d["tracks_json"])):
        t = Track(m.store, tid=int(meta["id"]))
        t.obs = {int(k): int(v) for k, v in meta["obs"].items()}
        t.inv_depth = meta["inv_depth"]
        t.life = meta["life"]
        t.flags = set(meta["flags"])
        m.tracks[t.id] = t

    swt = SlidingWindowTracker(m, config, calib, caps)
    if "prior_sqrt_inv_cov" in d:
        swt.prior = F.PriorFactor(
            **{name: jnp.asarray(d["prior_" + name]) for name in F.PriorFactor._fields}
        )
    swt.m_th = float(d["m_th"])
    swt.bin_conf_imu = jnp.asarray(d["bin_conf_imu"])
    swt.bin_conf_2d2d = jnp.asarray(d["bin_conf_2d2d"])
    swt._rng_key = jnp.asarray(d["rng_key"])
    swt._host_seed_ctr = int(d.get("host_seed_ctr", 0))
    return swt
