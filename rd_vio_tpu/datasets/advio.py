"""ADVIO dataset reader.

Behavioral reference: /root/reference/examples/dataset.hpp:633-821 (ADVIO
class: frames.mov video + separate accelerometer/gyroscope CSVs with
per-sequence-group iPhone intrinsics, streamed via addAcc/addGyro).

Deviation: no video decoder is available in this environment (no OpenCV/
ffmpeg bindings), so frames are read from an extracted `frames/` directory of
PNG/JPG files named by index, with timestamps from `frames.csv`. Everything
else (separate gyro/accel streams, intrinsics tables) matches the reference.
"""

from __future__ import annotations

import csv
import os
from typing import Iterator, Optional

import numpy as np

# Per-sequence-group iPhone intrinsics (reference dataset.hpp:700-760 tables)
IPHONE_INTRINSICS = {
    # sequences 01-12: iPhone 6s
    "iphone6s": dict(
        fx=1077.2, fy=1079.3, cx=362.14, cy=636.39,
        resolution=(720, 1280),
    ),
    # sequences 13-19: iPhone 11 / X (approximate groups in the dataset)
    "iphonex": dict(
        fx=1082.4, fy=1084.4, cx=364.68, cy=643.31,
        resolution=(720, 1280),
    ),
}


class AdvioDataset:
    def __init__(self, advio_dir: str, intrinsics_group: str = "iphone6s"):
        """advio_dir: directory containing iphone/{frames.csv, frames/,
        accelerometer.csv, gyro.csv}."""
        root = os.path.join(advio_dir, "iphone")
        self.root = root
        self.accel = self._read_csv3(os.path.join(root, "accelerometer.csv"))
        self.gyro = self._read_csv3(os.path.join(root, "gyro.csv"))
        self.frames = self._read_frames(os.path.join(root, "frames.csv"))
        self.intrinsics = IPHONE_INTRINSICS[intrinsics_group]

    @staticmethod
    def _read_csv3(path):
        ts, vals = [], []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(float(row[0]))
                vals.append([float(x) for x in row[1:4]])
        return {"t": np.asarray(ts), "v": np.asarray(vals)}

    def _read_frames(self, path):
        ts, files = [], []
        frames_dir = os.path.join(self.root, "frames")
        with open(path) as f:
            for i, row in enumerate(csv.reader(f)):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(float(row[0]))
                # extracted frame naming: frame index or explicit filename
                name = row[1].strip() if len(row) > 1 else f"{i:06d}.png"
                files.append(os.path.join(frames_dir, name))
        return {"t": np.asarray(ts), "files": files}

    def load_image(self, idx: int) -> np.ndarray:
        from PIL import Image

        return np.asarray(
            Image.open(self.frames["files"][idx]).convert("L"), dtype=np.float32
        )

    def events(self) -> Iterator[tuple]:
        """Time-ordered (t, kind, index) with kind in {"gyro", "accel",
        "frame"} — ADVIO streams gyro/accel separately
        (reference test_advio.cpp addAcc/addGyro)."""
        items = (
            [(t, "gyro", i) for i, t in enumerate(self.gyro["t"])]
            + [(t, "accel", i) for i, t in enumerate(self.accel["t"])]
            + [(t, "frame", i) for i, t in enumerate(self.frames["t"])]
        )
        items.sort(key=lambda x: (x[0], x[1]))
        yield from items


def run_advio(advio_dir: str, setting_yaml: Optional[str] = None,
              max_frames: Optional[int] = None, caps=None):
    """test_advio equivalent: separate gyro/accel streams through the handler
    interleaver."""
    from rd_vio_tpu.config import Config, load_config
    from rd_vio_tpu.models.image_backend import JaxImageBackend
    from rd_vio_tpu.models.odometry import Odometry

    ds = AdvioDataset(advio_dir)
    cfg = load_config(setting_yaml=setting_yaml) if setting_yaml else Config()
    intr = ds.intrinsics
    cfg.camera_intrinsic = np.array(
        [[intr["fx"], 0, intr["cx"]], [0, intr["fy"], intr["cy"]], [0, 0, 1.0]]
    )
    cfg.camera_resolution = intr["resolution"]
    odo = Odometry(cfg, JaxImageBackend(cfg), caps=caps)

    est_t, est_p = [], []
    n = 0
    for t, kind, i in ds.events():
        if kind == "gyro":
            odo.add_gyroscope(t, ds.gyro["v"][i])
        elif kind == "accel":
            odo.add_accelerometer(t, ds.accel["v"][i])
        else:
            odo.add_frame(t, ds.load_image(i))
            n += 1
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None:
                    est_t.append(ls[0])
                    est_p.append(ls[2])
            if max_frames and n >= max_frames:
                break
    return np.asarray(est_t), np.asarray(est_p), ds, odo
