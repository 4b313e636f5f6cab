"""ADVIO-layout integration: synthesize a tiny advio-01 sequence (rendered
frames muxed into a real MJPEG .mov + separate gyro/accel CSVs), then run the
complete test_advio-equivalent path — MOV demux, flip-on-read, separate
IMU-stream interleaving, image frontend, full VIO.

Reference: examples/dataset.hpp:633-821 (ADVIO class), examples/test_advio.
"""

import os

import numpy as np
import pytest

from rd_vio_tpu.datasets import advio, synthetic
from rd_vio_tpu.datasets.renderer import SequenceRenderer
from rd_vio_tpu.datasets.video import MovReader, write_mjpeg_mov


def test_mov_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = [
        np.clip(rng.normal(128, 40, (48, 64)), 0, 255).astype(np.uint8)
        for _ in range(7)
    ]
    path = str(tmp_path / "clip.mov")
    write_mjpeg_mov(path, frames, fps=30.0, quality=95)

    rd = MovReader(path)
    assert rd.codec == b"jpeg"
    assert len(rd) == 7
    assert (rd.width, rd.height) == (64, 48)
    np.testing.assert_allclose(np.diff(rd.timestamps), 1 / 30.0, atol=1e-3)
    for i in (0, 3, 6):
        dec = rd.decode(i)
        assert dec.shape == (48, 64)
        assert np.abs(dec - frames[i]).mean() < 4.0  # JPEG-lossy bound


def test_mov_unsupported_codec_hint(tmp_path):
    frames = [np.zeros((16, 16), np.uint8)]
    path = str(tmp_path / "h264.mov")
    write_mjpeg_mov(path, frames)
    data = bytearray(open(path, "rb").read())
    # retag the stsd sample-entry fourcc (the only lowercase b"jpeg": the
    # compressor string is "Motion JPEG") as H.264
    i = data.rindex(b"jpeg")
    data[i:i + 4] = b"avc1"
    open(path, "wb").write(bytes(data))

    rd = MovReader(path)
    assert rd.codec == b"avc1"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        rd.decode(0)


def test_seq_group_mapping():
    assert advio.seq_group(1) == 0 and advio.seq_group(12) == 0
    assert advio.seq_group(13) == 1 and advio.seq_group(17) == 1
    assert advio.seq_group(18) == 2 and advio.seq_group(19) == 2
    assert advio.seq_group(20) == 3 and advio.seq_group(23) == 3
    with pytest.raises(ValueError):
        advio.seq_group(24)
    # table shape parity with dataset.hpp:634-665
    assert len(advio.SEQ_INTRINSICS) == len(advio.SEQ_DISTORTIONS) == 4


@pytest.fixture(scope="module")
def advio_root(tmp_path_factory):
    seq = synthetic.generate(duration=5.0, n_landmarks=1500, max_keypoints=150)
    rend = SequenceRenderer(seq, image_size=(320, 240))

    root = tmp_path_factory.mktemp("advio")
    iphone = root / "advio-01" / "iphone"
    iphone.mkdir(parents=True)

    # frames.mov: store PRE-flipped frames so the reader's reference
    # flip(-1) (dataset.hpp:725-728) restores the rendered orientation
    frames = [rend.render(i)[::-1, ::-1] for i in range(len(seq.t_frame))]
    write_mjpeg_mov(str(iphone / "frames.mov"), frames, fps=20.0, quality=95)

    with open(iphone / "frames.csv", "w") as f:
        for i, t in enumerate(seq.t_frame):
            f.write(f"{t:.6f},{i}\n")
    with open(iphone / "gyro.csv", "w") as f:
        for i, t in enumerate(seq.t_imu):
            f.write(f"{t:.6f}," + ",".join(f"{v:.9f}" for v in seq.gyro[i]) + "\n")
    with open(iphone / "accelerometer.csv", "w") as f:
        for i, t in enumerate(seq.t_imu):
            f.write(f"{t:.6f}," + ",".join(f"{v:.9f}" for v in seq.accel[i]) + "\n")
    return str(root), seq, rend


def test_advio_reader_parses(advio_root):
    root, seq, rend = advio_root
    ds = advio.AdvioDataset(root, seq_id=1, undistort=False)
    assert ds._mov is not None  # no frames/ dir -> demuxed video path
    assert len(ds.frames["t"]) == len(seq.t_frame)
    assert len(ds.gyro["t"]) == len(seq.t_imu)
    assert len(ds.accel["t"]) == len(seq.t_imu)
    img = ds.load_image(0)
    assert img.shape == (240, 320)
    # flip-on-read restores the rendered orientation (JPEG-lossy bound)
    assert np.abs(img - rend.render(0)).mean() < 4.0
    # events are time-ordered and carry all three kinds
    evs = list(ds.events())
    assert [e[0] for e in evs] == sorted(e[0] for e in evs)
    assert {k for _, k, _ in evs} == {"gyro", "accel", "frame"}


def test_run_advio_end_to_end(advio_root):
    root, seq, rend = advio_root
    from rd_vio_tpu.utils.trajectory import associate, ate_rmse

    def hook(cfg, ds):
        # the synthesized sequence is rendered with the test camera, not an
        # iPhone: override the table calibration (everything else — MOV
        # decode, flip, stream interleave — exercises the reference path)
        cfg.camera_intrinsic = rend.K
        cfg.camera_resolution = (320, 240)
        cfg.feature_tracker_min_keypoint_distance = 12.0
        cfg.feature_tracker_max_keypoint_detection = 120

    est_t, est_p, ds, odo = advio.run_advio(
        root, seq_id=1, undistort=False, config_hook=hook
    )
    assert odo.state() == 1, "ADVIO-layout pipeline never reached tracking"
    assert len(est_p) > 20
    gt_t, gt_p = seq.t_frame, seq.p_wb
    ie, ig = associate(np.asarray(est_t), np.asarray(gt_t))
    err = ate_rmse(np.asarray(est_p)[ie], np.asarray(gt_p)[ig])
    assert err < 0.6, f"ATE {err:.3f} m on ADVIO-layout run"
