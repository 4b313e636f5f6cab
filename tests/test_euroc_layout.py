"""EuRoC-layout integration: synthesize a tiny mav0 dataset (rendered PNGs +
CSVs + YAML calib), then run the complete test_euroc-equivalent path —
readers, config loading, undistortion, image frontend, full VIO."""

import os

import numpy as np
import pytest

from rd_vio_tpu.datasets import euroc, synthetic
from rd_vio_tpu.datasets.renderer import SequenceRenderer


@pytest.fixture(scope="module")
def mav0(tmp_path_factory):
    from PIL import Image

    seq = synthetic.generate(duration=5.0, n_landmarks=1500, max_keypoints=150)
    rend = SequenceRenderer(seq, image_size=(320, 240))

    root = tmp_path_factory.mktemp("mav0")
    (root / "imu0").mkdir()
    (root / "cam0" / "data").mkdir(parents=True)
    (root / "state_groundtruth_estimate0").mkdir()

    with open(root / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
        for i, t in enumerate(seq.t_imu):
            f.write(
                f"{int(t*1e9)},"
                + ",".join(f"{v:.9f}" for v in seq.gyro[i])
                + ","
                + ",".join(f"{v:.9f}" for v in seq.accel[i])
                + "\n"
            )
    with open(root / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i, t in enumerate(seq.t_frame):
            name = f"{int(t*1e9)}.png"
            img = rend.render(i).astype(np.uint8)
            Image.fromarray(img, mode="L").save(root / "cam0" / "data" / name)
            f.write(f"{int(t*1e9)},{name}\n")
    with open(root / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        for i, t in enumerate(seq.t_frame):
            f.write(
                f"{int(t*1e9)},"
                + ",".join(f"{v:.9f}" for v in seq.p_wb[i])
                + ","
                + ",".join(f"{v:.9f}" for v in seq.q_wb[i])
                + "\n"
            )

    sensor_yaml = root / "sensor.yaml"
    K = rend.K
    with open(sensor_yaml, "w") as f:
        f.write(f"""%YAML:1.0
imu:
  extrinsic:
    q_bi: [0.0, 0.0, 0.0, 1.0]
    p_bi: [0.0, 0.0, 0.0]
  noise:
    cov_g: [2.9e-08, 0.0, 0.0, 0.0, 2.9e-08, 0.0, 0.0, 0.0, 2.9e-08]
    cov_a: [4.0e-6, 0.0, 0.0, 0.0, 4.0e-6, 0.0, 0.0, 0.0, 4.0e-6]
    cov_bg: [3.8e-10, 0.0, 0.0, 0.0, 3.8e-10, 0.0, 0.0, 0.0, 3.8e-10]
    cov_ba: [9.0e-6, 0.0, 0.0, 0.0, 9.0e-6, 0.0, 0.0, 0.0, 9.0e-6]
cam0:
  resolution: [320, 240]
  camera_model: pinhole
  distortion_model: radtan
  intrinsics: [{K[0,0]}, {K[1,1]}, {K[0,2]}, {K[1,2]}]
  camera_distortion_flag: 0
  distortion: [0.0, 0.0, 0.0, 0.0]
  time_offset: 0.0
  extrinsic:
    q_bc: [0.0, 0.0, 0.0, 1.0]
    p_bc: [0.0, 0.0, 0.0]
  noise: [0.5, 0.0, 0.0, 0.5]
""")
    setting_yaml = root / "setting.yaml"
    with open(setting_yaml, "w") as f:
        f.write("""%YAML:1.0
feature_tracker:
  min_keypoint_distance: 12.0
  max_keypoint_detection: 120
""")
    return str(root), str(sensor_yaml), str(setting_yaml), seq


def test_python_reader_parses(mav0):
    root, sensor_yaml, setting_yaml, seq = mav0
    ds = euroc.EurocDataset(root)
    assert len(ds.imu["t"]) == len(seq.t_imu)
    assert len(ds.frames["t"]) == len(seq.t_frame)
    assert ds.ground_truth is not None
    img = ds.load_image(ds.frames["files"][0])
    assert img.shape == (240, 320)


def test_run_euroc_end_to_end(mav0):
    root, sensor_yaml, setting_yaml, seq = mav0
    from rd_vio_tpu.utils.trajectory import associate, ate_rmse

    est_t, est_p, ds, odo = euroc.run_euroc(root, sensor_yaml, setting_yaml)
    assert odo.state() == 1, "EuRoC-layout pipeline never reached tracking"
    assert len(est_p) > 20
    gt = ds.ground_truth
    ie, ig = associate(np.asarray(est_t), gt["t"])
    err = ate_rmse(np.asarray(est_p)[ie], gt["p"][ig])
    assert err < 0.6, f"ATE {err:.3f} m on EuRoC-layout run"
