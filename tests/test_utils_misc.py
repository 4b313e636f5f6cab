"""Tests for viewer plot export, UDP pose streaming, and metrics."""

import json
import socket
import struct

import numpy as np

from rd_vio_tpu.utils import metrics, pose_stream, viewer


def test_trajectory_plot_export(tmp_path, rng):
    est = np.cumsum(rng.standard_normal((100, 3)) * 0.01, axis=0)
    gt = est + 0.005
    lm = rng.standard_normal((50, 3))
    out = viewer.save_trajectory_plot(
        str(tmp_path / "traj.png"), est, gt, lm
    )
    import os

    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000


def test_slimevr_packets_loopback():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]

    cli = pose_stream.SlimeVrClient(port=port)
    cli.handshake()
    data, _ = rx.recvfrom(2048)
    ptype, pid = struct.unpack(">IQ", data[:12])
    assert ptype == pose_stream.HANDSHAKE and pid == 0

    cli.send_rotation([1.0, 0.0, 0.0, 0.0])
    got_rot = False
    for _ in range(3):
        data, _ = rx.recvfrom(2048)
        ptype, pid = struct.unpack(">IQ", data[:12])
        if ptype == pose_stream.ROTATION:
            x, y, z, w = struct.unpack(">ffff", data[12:28])
            assert w == 1.0 and x == y == z == 0.0
            got_rot = True
            break
    assert got_rot
    cli.close()
    rx.close()


def test_json_pose_publisher_loopback():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    pub = pose_stream.JsonPosePublisher(port=port)
    pub.publish(1.25, [1, 0, 0, 0], [0.5, -0.5, 1.0])
    msg = json.loads(rx.recvfrom(2048)[0])
    assert msg["t"] == 1.25 and msg["p"] == [0.5, -0.5, 1.0]
    pub.close()
    rx.close()


def test_stage_timer_and_metrics(tmp_path):
    st = metrics.StageTimer()
    with st.time("stage_a"):
        pass
    with st.time("stage_a"):
        pass
    stats = st.stats()
    assert stats["stage_a"]["n"] == 2

    log = metrics.MetricsLogger(str(tmp_path / "m.jsonl"))
    log.log(frame=1, tracked=42)
    log.close()
    lines = open(tmp_path / "m.jsonl").read().strip().splitlines()
    assert json.loads(lines[0])["tracked"] == 42
