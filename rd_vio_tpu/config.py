"""Configuration for the TPU-native RD-VIO engine.

Mirrors every knob of the reference's abstract ``Config``
(reference: src/rdvio/include/rdvio/types.h:91-151, src/rdvio/src/config.cpp:8-73)
with the same names and code defaults, and loads the same two-file YAML schema
(algorithm settings + sensor calibration, e.g. configs/setting.yaml and
configs/euroc_sensor.yaml of the reference) so reference configs work unchanged.

Quaternions in YAML are [x, y, z, w] (Eigen coeff order, as in the reference);
internally we store wxyz (see rd_vio_tpu.ops.lie).
"""

from __future__ import annotations

import dataclasses
import io
import math
from typing import Optional

import numpy as np

GRAVITY_NOMINAL = 9.80665  # reference: src/rdvio/include/rdvio/types.h:26


# typed config exceptions (reference yaml_config.h:10-27): a miscalibrated
# silent run is worse than a crash, so missing mandatory sensor keys raise
class ConfigError(RuntimeError):
    """Base class for configuration errors."""


class ConfigLoadError(ConfigError):
    def __init__(self, filename: str):
        super().__init__(f"cannot load config {filename}")


class ConfigParseError(ConfigError):
    pass


class ConfigMissingError(ConfigError):
    def __init__(self, config_path: str):
        super().__init__(f'config "{config_path}" is mandatory')


class ConfigTypeError(ConfigError):
    def __init__(self, config_path: str):
        super().__init__(f'config "{config_path}" has wrong type')


def _xyzw_to_wxyz(q_xyzw) -> np.ndarray:
    q = np.asarray(q_xyzw, dtype=np.float64)
    return np.array([q[3], q[0], q[1], q[2]], dtype=np.float64)


@dataclasses.dataclass
class Config:
    """All tunables, defaults matching reference config.cpp:8-73."""

    # --- camera calibration (reference: yaml_config.cpp cam0 block) ---
    camera_intrinsic: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array(
            [[500.0, 0.0, 376.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]]
        )
    )  # 3x3 K
    camera_distortion_flag: int = 0
    camera_distortion_model: str = "radtan"  # "radtan" | "equidistant"
    camera_distortion: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(4)
    )  # k1 k2 p1 p2
    camera_resolution: tuple = (752, 480)
    camera_time_offset: float = 0.0
    camera_to_body_rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0, 0.0])
    )  # wxyz, q_bc
    camera_to_body_translation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )  # p_bc
    keypoint_noise_cov: np.ndarray = dataclasses.field(
        default_factory=lambda: 0.5 * np.eye(2)
    )  # [px^2]

    # --- imu calibration ---
    imu_to_body_rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0, 0.0])
    )  # wxyz, q_bi
    imu_to_body_translation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )  # p_bi
    gyroscope_noise_cov: np.ndarray = dataclasses.field(
        default_factory=lambda: 1e-4 * np.eye(3)
    )
    accelerometer_noise_cov: np.ndarray = dataclasses.field(
        default_factory=lambda: 1e-2 * np.eye(3)
    )
    gyroscope_bias_noise_cov: np.ndarray = dataclasses.field(
        default_factory=lambda: 1e-8 * np.eye(3)
    )
    accelerometer_bias_noise_cov: np.ndarray = dataclasses.field(
        default_factory=lambda: 1e-6 * np.eye(3)
    )

    # --- output frame ---
    output_to_body_rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0, 0.0])
    )  # wxyz, q_bo
    output_to_body_translation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )  # p_bo

    # --- sliding window (reference config.cpp:17-21) ---
    sliding_window_size: int = 10
    sliding_window_subframe_size: int = 3
    sliding_window_force_keyframe_landmarks: int = 35
    sliding_window_tracker_frequent: int = 1

    # --- feature tracker (config.cpp:23-37) ---
    feature_tracker_min_keypoint_distance: float = 20.0
    feature_tracker_max_keypoint_detection: int = 150
    feature_tracker_max_init_frames: int = 60
    feature_tracker_max_frames: int = 200
    feature_tracker_clahe_clip_limit: float = 6.0
    feature_tracker_clahe_width: int = 8
    feature_tracker_clahe_height: int = 8
    feature_tracker_predict_keypoints: bool = True

    # --- initializer (config.cpp:39-51) ---
    initializer_keyframe_num: int = 8
    initializer_keyframe_gap: int = 5
    initializer_min_matches: int = 50
    initializer_min_parallax: float = 10.0
    initializer_min_triangulation: int = 50
    initializer_min_landmarks: int = 30
    initializer_refine_imu: bool = True

    # --- solver (config.cpp:53-55) ---
    solver_iteration_limit: int = 10
    solver_time_limit: float = 1.0e6

    # --- rotation detector (config.cpp:57-59) ---
    rotation_misalignment_threshold: float = 0.1
    rotation_ransac_threshold: float = 10.0  # degrees

    # --- randomness (config.cpp:61) ---
    random: int = 648

    # --- parsac (config.cpp:63-71) ---
    parsac_flag: bool = False
    parsac_dynamic_probability: float = 0.0
    parsac_threshold: float = 3.0
    parsac_norm_scale: float = 1.0
    parsac_keyframe_check_size: int = 3

    # --- TPU-build capacities (new; fixed shapes for jit) ---
    max_keypoints: int = 256  # K_max per frame (>= max_keypoint_detection)
    max_landmarks: int = 768  # L_max in the sliding window map
    max_observations: int = 4096  # O_max reprojection factor slots per solve
    max_imu_per_interval: int = 64  # IMU samples per frame-to-frame interval
    ransac_hypotheses: int = 256  # K batched hypotheses per robust solve
    # fixed hypothesis-bank size for the DEVICE PARSAC judge + 2D-2D check
    # programs (parsac_host_masks=False): a static bank is the right shape
    # for one batched TPU dispatch. The HOST twins instead mirror the
    # reference's confidence-adaptive iteration bound (parsac.h:159-164 /
    # imu_parsac.h:135-140: N = log(1-0.999)/log(1-ratio^5), shrinking as
    # better models appear and growing back toward parsac_max_iteration in
    # dynamic-heavy scenes — VERDICT r4 item 7) and use this value only as
    # the evaluation chunk size (32: the adaptive bound on benign frames is
    # ~5-20, so one chunk usually suffices and the chunk size IS the
    # judge's per-frame host cost; A/B table in BASELINE.md round-5).
    parsac_judge_hypotheses: int = 32
    # adaptive-iteration cap for the HOST PARSAC twins — the reference's
    # max_iteration (stereo.cpp:127 / pnp.h:170 defaults: 1000)
    parsac_max_iteration: int = 1000
    # subframe-result FIFO depth: how many in-flight subwindow results the
    # per-frame drain may leave pending (host mirror <= depth+1 refinements
    # stale, deterministically). Round 4 used 1; at depth 1 the ~25 ms fetch
    # round trip does not fit inside one frame interval on the tunneled
    # chip, so every frame's drain blocked ~20-24 ms (bench r5 real-path
    # stage table). Depth 2 gives each fetch two frame intervals; solve
    # correctness never depends on the mirror (the device chain carries the
    # fresh states).
    sliding_window_fifo_depth: int = 2
    # EXPERIMENTAL async keyframe step (round 5): the fused keyframe program
    # chains its localize anchor from the previous subwindow solve's device
    # states and returns results through the ordered async FIFO — the
    # pipeline never blocks on the keyframe fetch. Default OFF: deferring
    # the keyframe apply by one frame degrades synthetic-suite ATE
    # 0.001 -> ~0.33 m (measured round 5; an immediate-drain variant of the
    # same code path stays at 0.002, and disabling only the deferred
    # validation-verdict writes recovers to 0.14, so the loss concentrates
    # in one-frame-late track verdicts compounding through the keyframe
    # cadence — unresolved). The batched lockstep runtime (rd_vio_tpu.batch)
    # applies keyframe results within the SAME tick and is unaffected.
    sliding_window_keyframe_async: bool = False
    # per-frame mask RANSAC placement: True runs it on host NumPy (the result
    # gates host control flow; on a latency-bound tunneled chip a device
    # round trip per frame dominates), False dispatches the fused device
    # program (ops/frontend_step.ft_step) — right for direct-attached parts
    feature_tracker_host_masks: bool = True
    # same placement choice for the per-frame IMU-PARSAC judge + 2D-2D
    # keyframe checks (ops/parsac_np vs ops/parsac device programs)
    parsac_host_masks: bool = True
    # KLT tracker implementation: "xla" = batched-gather XLA programs
    # (ops/image/klt), "pallas" = VMEM-resident Pallas kernel
    # (ops/image/klt_pallas; falls back to interpret mode off-TPU).
    # A/B: scripts/bench_klt.py; equivalence: tests/test_klt_pallas.py
    klt_backend: str = "xla"
    # device-resident frontend loop (ops/frontend_loop): keypoint state stays
    # on the TPU frame-to-frame; the host consumes results one frame stale,
    # hiding the per-frame device round trip. Only active for image backends
    # with device pyramids (JaxImageBackend); False restores the per-frame
    # dispatch+fetch path
    feature_tracker_device_loop: bool = True
    # in-flight pairs of the device loop before a blocking finalize: each
    # async result fetch gets this many frame intervals to land; frames
    # reach the optimizer depth-1 frames later (pure latency, throughput
    # unchanged). Depth 3 (round 5): with the frame interval down to ~80 ms
    # and ~34 ms of queued device work per frame, two intervals no longer
    # covered program + ~25 ms tunnel round trip — ft.finalize blocked
    # p50 26 ms at depth 2 and p50 1.3 ms at depth 3 (real-pixel bench,
    # +0.4 fps).
    feature_tracker_pipeline_depth: int = 3
    # initializer essential hypotheses: False = batched 8-point (device,
    # ops/epipolar), True = Nistér 5-point host solve (ops/essential5; the
    # reference's essential.cpp:9-218 path). A/B: scripts/ab_essential.py —
    # equivalent on the synthetic corpus, 8pt stays the default
    initializer_use_5pt: bool = False
    solver_dtype: str = "float64"  # keyframe/marginalization solves (prior conditioning)
    fast_solver_dtype: str = "float32"  # prior-free per-frame solves (localize/subwindow)
    # keyframe window solve: f32 is safe because the marginalization prior
    # enters in SQUARE-ROOT form (sqrt_inv_cov rows stacked into J, so H's
    # 1e30-scale gauge entries never materialize at reduced precision in the
    # factorization inputs) and the marginalization itself stays f64 —
    # the square-root sliding-window BA argument (arXiv 2109.02182). ~8x
    # faster than emulated f64 on TPU v5e; set "float64" to restore the
    # all-double reference behavior.
    window_solver_dtype: str = "float32"

    def solver_np_dtype(self):
        return np.dtype(self.solver_dtype)

    def log_config(self, log=None) -> str:
        """Full configuration dump (reference config.cpp:75-205 log_config)."""
        lines = ["Configurations:"]
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                v = np.array2string(np.asarray(v), precision=5, separator=", ")
            lines.append(f"  Config::{f.name}: {v}")
        text = "\n".join(lines)
        if log is not None:
            log.info(text)
        return text


def _load_opencv_yaml(path: str) -> dict:
    """Load an OpenCV-style YAML (tolerates the '%YAML:1.0' directive)."""
    import yaml

    try:
        with open(path, "r") as f:
            text = f.read()
    except OSError as e:
        raise ConfigLoadError(path) from e
    lines = [ln for ln in text.splitlines() if not ln.startswith("%YAML")]
    try:
        return yaml.safe_load(io.StringIO("\n".join(lines))) or {}
    except yaml.YAMLError as e:
        raise ConfigParseError(str(e)) from e


def load_config(sensor_yaml: Optional[str] = None, setting_yaml: Optional[str] = None) -> Config:
    """Build a Config from the reference's two YAML files.

    Mirrors reference src/rdvio_extra/src/yaml_config.cpp:82-339: every field
    defaults from code defaults then is overridden by the YAML when present.
    """
    cfg = Config()
    if setting_yaml:
        d = _load_opencv_yaml(setting_yaml)
        _apply_settings(cfg, d)
    if sensor_yaml:
        d = _load_opencv_yaml(sensor_yaml)
        _apply_sensor(cfg, d)
    return cfg


def _get(d: dict, *path, default=None):
    cur = d
    for k in path:
        if not isinstance(cur, dict) or k not in cur:
            return default
        cur = cur[k]
    return cur


def _apply_settings(cfg: Config, d: dict) -> None:
    def set_if(attr, *path, cast=None):
        v = _get(d, *path)
        if v is not None:
            setattr(cfg, attr, cast(v) if cast else v)

    q_bo = _get(d, "output", "q_bo")
    if q_bo is not None:
        cfg.output_to_body_rotation = _xyzw_to_wxyz(q_bo)
    p_bo = _get(d, "output", "p_bo")
    if p_bo is not None:
        cfg.output_to_body_translation = np.asarray(p_bo, dtype=np.float64)

    set_if("sliding_window_size", "sliding_window", "size", cast=int)
    set_if("sliding_window_subframe_size", "sliding_window", "subframe_size", cast=int)
    set_if(
        "sliding_window_force_keyframe_landmarks",
        "sliding_window",
        "force_keyframe_landmarks",
        cast=int,
    )
    set_if(
        "sliding_window_tracker_frequent",
        "sliding_window",
        "tracker_frequent",
        cast=int,
    )

    ft = "feature_tracker"
    set_if("feature_tracker_min_keypoint_distance", ft, "min_keypoint_distance", cast=float)
    set_if("feature_tracker_max_keypoint_detection", ft, "max_keypoint_detection", cast=int)
    set_if("feature_tracker_max_init_frames", ft, "max_init_frames", cast=int)
    set_if("feature_tracker_max_frames", ft, "max_frames", cast=int)
    set_if("feature_tracker_predict_keypoints", ft, "predict_keypoints", cast=bool)
    set_if("feature_tracker_clahe_clip_limit", ft, "clahe_clip_limit", cast=float)
    set_if("feature_tracker_clahe_width", ft, "clahe_width", cast=int)
    set_if("feature_tracker_clahe_height", ft, "clahe_height", cast=int)

    ini = "initializer"
    set_if("initializer_keyframe_num", ini, "keyframe_num", cast=int)
    set_if("initializer_keyframe_gap", ini, "keyframe_gap", cast=int)
    set_if("initializer_min_matches", ini, "min_matches", cast=int)
    set_if("initializer_min_parallax", ini, "min_parallax", cast=float)
    set_if("initializer_min_triangulation", ini, "min_triangulation", cast=int)
    set_if("initializer_min_landmarks", ini, "min_landmarks", cast=int)
    set_if("initializer_refine_imu", ini, "refine_imu", cast=bool)

    set_if("solver_iteration_limit", "solver", "iteration_limit", cast=int)
    set_if("solver_time_limit", "solver", "time_limit", cast=float)

    set_if("rotation_misalignment_threshold", "rotation", "misalignment_threshold", cast=float)
    set_if("rotation_ransac_threshold", "rotation", "ransac_threshold", cast=float)

    set_if("parsac_flag", "parsac", "parsac_flag", cast=bool)
    set_if("parsac_dynamic_probability", "parsac", "dynamic_probability", cast=float)
    set_if("parsac_threshold", "parsac", "threshold", cast=float)
    set_if("parsac_norm_scale", "parsac", "norm_scale", cast=float)
    set_if("parsac_keyframe_check_size", "parsac", "keyframe_check_size", cast=int)


def _require(d: dict, *path):
    """Mandatory sensor-calibration key (reference yaml_config.cpp:141-201
    passes required=true for these): raise instead of silently keeping a
    default — a miscalibrated silent run is worse than a crash."""
    v = _get(d, *path)
    if v is None:
        raise ConfigMissingError(".".join(path))
    return v


def _apply_sensor(cfg: Config, d: dict) -> None:
    # imu block (reference yaml_config.cpp:141-201; all keys mandatory)
    cfg.imu_to_body_rotation = _xyzw_to_wxyz(_require(d, "imu", "extrinsic", "q_bi"))
    cfg.imu_to_body_translation = np.asarray(
        _require(d, "imu", "extrinsic", "p_bi"), dtype=np.float64
    )
    for attr, key in [
        ("gyroscope_noise_cov", "cov_g"),
        ("accelerometer_noise_cov", "cov_a"),
        ("gyroscope_bias_noise_cov", "cov_bg"),
        ("accelerometer_bias_noise_cov", "cov_ba"),
    ]:
        v = _require(d, "imu", "noise", key)
        try:
            setattr(cfg, attr, np.asarray(v, dtype=np.float64).reshape(3, 3))
        except (TypeError, ValueError) as e:
            raise ConfigTypeError(f"imu.noise.{key}") from e

    # cam0 block (mandatory per reference yaml_config.cpp:141-178)
    intr = _require(d, "cam0", "intrinsics")
    try:
        fu, fv, cu, cv = [float(x) for x in intr]
    except (TypeError, ValueError) as e:
        raise ConfigTypeError("cam0.intrinsics") from e
    cfg.camera_intrinsic = np.array(
        [[fu, 0.0, cu], [0.0, fv, cv], [0.0, 0.0, 1.0]]
    )
    res = _require(d, "cam0", "resolution")
    cfg.camera_resolution = (int(res[0]), int(res[1]))
    cfg.camera_distortion_flag = int(_require(d, "cam0", "camera_distortion_flag"))
    dist_model = _get(d, "cam0", "distortion_model")  # optional (repo addition)
    if dist_model is not None:
        cfg.camera_distortion_model = str(dist_model)
    cfg.camera_distortion = np.asarray(
        _require(d, "cam0", "distortion"), dtype=np.float64
    )[:4]
    cfg.camera_time_offset = float(_require(d, "cam0", "time_offset"))
    cfg.camera_to_body_rotation = _xyzw_to_wxyz(_require(d, "cam0", "extrinsic", "q_bc"))
    cfg.camera_to_body_translation = np.asarray(
        _require(d, "cam0", "extrinsic", "p_bc"), dtype=np.float64
    )
    try:
        cfg.keypoint_noise_cov = np.asarray(
            _require(d, "cam0", "noise"), dtype=np.float64
        ).reshape(2, 2)
    except (TypeError, ValueError) as e:
        raise ConfigTypeError("cam0.noise") from e
