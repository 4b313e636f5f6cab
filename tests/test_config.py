"""Config parity: the reference's own YAML files must load unchanged
(reference yaml_config.cpp schema)."""

import os

import numpy as np
import pytest

from rd_vio_tpu.config import Config, load_config

REF = "/root/reference/configs"


def test_defaults_match_reference_code():
    """Code defaults mirror reference config.cpp:8-73."""
    c = Config()
    assert c.sliding_window_size == 10
    assert c.sliding_window_subframe_size == 3
    assert c.sliding_window_force_keyframe_landmarks == 35
    assert c.feature_tracker_min_keypoint_distance == 20.0
    assert c.feature_tracker_max_keypoint_detection == 150
    assert c.initializer_keyframe_num == 8
    assert c.initializer_keyframe_gap == 5
    assert c.solver_iteration_limit == 10
    assert c.rotation_misalignment_threshold == 0.1
    assert c.rotation_ransac_threshold == 10.0
    assert c.random == 648
    assert c.parsac_flag is False
    assert c.parsac_keyframe_check_size == 3


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs absent")
def test_loads_reference_setting_yaml():
    c = load_config(setting_yaml=os.path.join(REF, "setting.yaml"))
    # values overridden by the yaml (reference configs/setting.yaml)
    assert c.sliding_window_size == 12
    assert c.sliding_window_subframe_size == 5
    assert c.sliding_window_force_keyframe_landmarks == 50
    assert c.feature_tracker_min_keypoint_distance == 10.0
    assert c.feature_tracker_max_keypoint_detection == 200
    assert c.feature_tracker_max_frames == 20
    assert c.solver_iteration_limit == 30
    assert c.rotation_misalignment_threshold == 0.02
    assert c.parsac_flag is True
    assert c.parsac_dynamic_probability == 0.15
    assert c.parsac_threshold == 1.0
    assert c.parsac_keyframe_check_size == 1


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs absent")
def test_loads_reference_euroc_sensor_yaml():
    c = load_config(sensor_yaml=os.path.join(REF, "euroc_sensor.yaml"))
    np.testing.assert_allclose(c.camera_intrinsic[0, 0], 458.654)
    np.testing.assert_allclose(c.camera_intrinsic[1, 2], 248.375)
    assert c.camera_resolution == (752, 480)
    assert c.camera_distortion_flag == 1
    np.testing.assert_allclose(c.camera_distortion[0], -0.28340811)
    # q_bc is stored wxyz from the yaml's xyzw
    np.testing.assert_allclose(c.camera_to_body_rotation[0], 7.1230146066895372e-01)
    np.testing.assert_allclose(c.keypoint_noise_cov, 0.5 * np.eye(2))
    np.testing.assert_allclose(np.diag(c.gyroscope_noise_cov), 2.8791302399999997e-08)
    np.testing.assert_allclose(np.diag(c.accelerometer_bias_noise_cov), 9.0e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs absent")
def test_loads_both_files_together():
    c = load_config(
        sensor_yaml=os.path.join(REF, "euroc_sensor.yaml"),
        setting_yaml=os.path.join(REF, "setting.yaml"),
    )
    assert c.sliding_window_size == 12
    np.testing.assert_allclose(c.camera_intrinsic[0, 0], 458.654)


# -- mandatory-key strictness (reference yaml_config.cpp:141-201) -----------

def _write_sensor_yaml(tmp_path, drop=None):
    """Minimal valid sensor yaml; drop= removes one dotted key."""
    import yaml

    d = {
        "cam0": {
            "intrinsics": [400.0, 400.0, 320.0, 240.0],
            "resolution": [640, 480],
            "camera_distortion_flag": 0,
            "distortion": [0.0, 0.0, 0.0, 0.0],
            "time_offset": 0.0,
            "extrinsic": {"q_bc": [0.0, 0.0, 0.0, 1.0], "p_bc": [0.0, 0.0, 0.0]},
            "noise": [0.5, 0.0, 0.0, 0.5],
        },
        "imu": {
            "extrinsic": {"q_bi": [0.0, 0.0, 0.0, 1.0], "p_bi": [0.0, 0.0, 0.0]},
            "noise": {
                "cov_g": np.diag([1e-4] * 3).ravel().tolist(),
                "cov_a": np.diag([1e-3] * 3).ravel().tolist(),
                "cov_bg": np.diag([1e-6] * 3).ravel().tolist(),
                "cov_ba": np.diag([1e-5] * 3).ravel().tolist(),
            },
        },
    }
    if drop is not None:
        cur = d
        parts = drop.split(".")
        for k in parts[:-1]:
            cur = cur[k]
        del cur[parts[-1]]
    p = tmp_path / "sensor.yaml"
    p.write_text(yaml.safe_dump(d))
    return str(p)


def test_sensor_yaml_complete_loads(tmp_path):
    c = load_config(sensor_yaml=_write_sensor_yaml(tmp_path))
    np.testing.assert_allclose(c.camera_intrinsic[0, 0], 400.0)


@pytest.mark.parametrize("key", [
    "cam0.intrinsics", "cam0.resolution", "cam0.camera_distortion_flag",
    "cam0.distortion", "cam0.time_offset", "cam0.extrinsic",
    "cam0.noise", "imu.extrinsic", "imu.noise",
])
def test_missing_mandatory_sensor_key_raises(tmp_path, key):
    from rd_vio_tpu.config import ConfigMissingError

    with pytest.raises(ConfigMissingError):
        load_config(sensor_yaml=_write_sensor_yaml(tmp_path, drop=key))


def test_missing_file_raises():
    from rd_vio_tpu.config import ConfigLoadError

    with pytest.raises(ConfigLoadError):
        load_config(sensor_yaml="/nonexistent/sensor.yaml")


def test_bad_yaml_raises(tmp_path):
    from rd_vio_tpu.config import ConfigParseError

    p = tmp_path / "bad.yaml"
    p.write_text("cam0: [unterminated")
    with pytest.raises(ConfigParseError):
        load_config(sensor_yaml=str(p))


def test_wrong_shape_noise_raises(tmp_path):
    from rd_vio_tpu.config import ConfigTypeError
    import yaml as _y

    path = _write_sensor_yaml(tmp_path)
    d = _y.safe_load(open(path))
    d["imu"]["noise"]["cov_g"] = [1.0, 2.0]  # not 3x3
    open(path, "w").write(_y.safe_dump(d))
    with pytest.raises(ConfigTypeError):
        load_config(sensor_yaml=path)
