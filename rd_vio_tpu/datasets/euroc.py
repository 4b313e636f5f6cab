"""EuRoC MAV dataset reader (mav0 layout).

Behavioral reference: /root/reference/examples/dataset.hpp:454-624 (EuRoC
class: cam0/data.csv + PNG images, imu0/data.csv gyro+accel, undistortion on
read) and examples/test_euroc.cpp (interleaved IMU/frame streaming).

PNG decoding via PIL; undistortion via the precomputed remap table
(ops/image/undistort). Ground truth from state_groundtruth_estimate0 for ATE.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class EurocEvent:
    t: float
    kind: str  # "imu" | "frame"
    gyro: Optional[np.ndarray] = None
    accel: Optional[np.ndarray] = None
    image_path: Optional[str] = None


class EurocDataset:
    def __init__(self, mav0_dir: str, undistort=None):
        """mav0_dir: path containing cam0/, imu0/, state_groundtruth_estimate0/.

        undistort: optional callable (H, W) image -> undistorted image
        (built from the sensor YAML via ops/image/undistort)."""
        self.root = mav0_dir
        self.undistort = undistort
        self.imu = self._read_imu(os.path.join(mav0_dir, "imu0", "data.csv"))
        self.frames = self._read_cam(os.path.join(mav0_dir, "cam0", "data.csv"))
        gt_path = os.path.join(
            mav0_dir, "state_groundtruth_estimate0", "data.csv"
        )
        self.ground_truth = (
            self._read_gt(gt_path) if os.path.exists(gt_path) else None
        )

    @staticmethod
    def _read_imu(path):
        ts, gyro, accel = [], [], []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(int(row[0]) * 1e-9)
                gyro.append([float(x) for x in row[1:4]])
                accel.append([float(x) for x in row[4:7]])
        return {
            "t": np.asarray(ts),
            "gyro": np.asarray(gyro),
            "accel": np.asarray(accel),
        }

    def _read_cam(self, path):
        ts, files = [], []
        data_dir = os.path.join(os.path.dirname(path), "data")
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(int(row[0]) * 1e-9)
                files.append(os.path.join(data_dir, row[1].strip()))
        return {"t": np.asarray(ts), "files": files}

    @staticmethod
    def _read_gt(path):
        ts, p, q = [], [], []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts.append(int(row[0]) * 1e-9)
                p.append([float(x) for x in row[1:4]])
                q.append([float(x) for x in row[4:8]])  # w x y z
        return {"t": np.asarray(ts), "p": np.asarray(p), "q": np.asarray(q)}

    def load_image(self, path) -> np.ndarray:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("L"), dtype=np.float32)
        if self.undistort is not None:
            img = np.asarray(self.undistort(img))
        return img

    def events(self) -> Iterator[EurocEvent]:
        """Time-ordered interleaved IMU + frame events
        (reference test_euroc.cpp:46-95)."""
        items = [
            (t, 0, i) for i, t in enumerate(self.imu["t"])
        ] + [(t, 1, i) for i, t in enumerate(self.frames["t"])]
        items.sort()
        for t, kind, i in items:
            if kind == 0:
                yield EurocEvent(
                    t=t, kind="imu",
                    gyro=self.imu["gyro"][i], accel=self.imu["accel"][i],
                )
            else:
                yield EurocEvent(
                    t=t, kind="frame", image_path=self.frames["files"][i]
                )


def make_undistorter(cfg):
    """Build an image undistorter from a Config (no-op when the distortion
    flag is off)."""
    if not cfg.camera_distortion_flag:
        return None
    import jax.numpy as jnp

    from rd_vio_tpu.ops.image.undistort import build_remap, remap_bilinear

    W, H = cfg.camera_resolution
    map_y, map_x = build_remap(
        cfg.camera_intrinsic, cfg.camera_distortion,
        cfg.camera_distortion_model, W, H,
    )
    my = jnp.asarray(map_y)
    mx = jnp.asarray(map_x)

    def undistort(img):
        return remap_bilinear(jnp.asarray(img, jnp.float32), my, mx)

    return undistort


def run_euroc(mav0_dir: str, sensor_yaml: str, setting_yaml: str,
              max_frames: Optional[int] = None, caps=None):
    """test_euroc equivalent: stream a EuRoC sequence through the Odometry and
    return (est_t, est_p, dataset, odometry)."""
    from rd_vio_tpu.config import load_config
    from rd_vio_tpu.models.image_backend import JaxImageBackend
    from rd_vio_tpu.models.odometry import Odometry

    cfg = load_config(sensor_yaml, setting_yaml)
    und = make_undistorter(cfg)
    ds = EurocDataset(mav0_dir, undistort=und)
    backend = JaxImageBackend(cfg)
    odo = Odometry(cfg, backend, caps=caps)

    est_t, est_p = [], []
    n = 0
    for ev in ds.events():
        if ev.kind == "imu":
            odo.add_motion(ev.t, ev.gyro, ev.accel)
        else:
            odo.add_frame(ev.t, ds.load_image(ev.image_path))
            n += 1
            if odo.state() == 1:
                ls = odo.handler.get_latest_state()
                if ls is not None:
                    est_t.append(ls[0])
                    est_p.append(ls[2])
            if max_frames and n >= max_frames:
                break
    return np.asarray(est_t), np.asarray(est_p), ds, odo
