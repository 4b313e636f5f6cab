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


def test_slimevr_discovery_loopback():
    """Broadcast discovery (reference slime.cpp:196-275): a fake server on
    loopback answers the handshake with 'Hey OVR =D 5'; the client must
    switch to direct addressing."""
    import socket
    import struct
    import threading

    from rd_vio_tpu.utils.pose_stream import HANDSHAKE, SlimeVrClient

    server = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.settimeout(5.0)

    def serve():
        data, addr = server.recvfrom(1024)
        ptype = struct.unpack(">I", data[:4])[0]
        assert ptype == HANDSHAKE
        server.sendto(bytes([HANDSHAKE]) + b"Hey OVR =D 5", addr)

    th = threading.Thread(target=serve, daemon=True)
    th.start()

    c = SlimeVrClient(host="127.0.0.1", port=port)
    try:
        # loopback: broadcast doesn't reach 127.0.0.1's bound socket on all
        # platforms — aim the discovery broadcast at the local server
        assert c.discover_server(device_id=3, timeout=5.0,
                                 broadcast_host="127.0.0.1")
        assert c.connected
        # post-discovery packets go to the responding address
        assert c.addr[0] == "127.0.0.1"
    finally:
        th.join(timeout=5.0)
        c.close()
        server.close()


def test_viewer_topics(tmp_path):
    """The Viewer must carry every pviz.hpp topic (trajectory, keyframes,
    global/local point clouds, image topics) and render them headlessly."""
    import numpy as np

    from rd_vio_tpu.utils.viewer import Viewer

    v = Viewer(title="t", out_dir=str(tmp_path / "viz"))
    T = np.eye(4)
    for i in range(5):
        T2 = T.copy()
        T2[:3, 3] = [i * 0.1, 0.05 * i, 0]
        v.publish_trajectory(T2)
        if i % 2 == 0:
            v.publish_keyframe(i, T2)
    v.publish_trajectory(np.eye(3), np.array([0.6, 0.3, 0.0]))
    v.publish_local_point_cloud(np.random.default_rng(0).normal(size=(30, 3)))
    for j in range(10):
        v.publish_global_point_cloud(j, [j * 0.1, 0.0, 1.0])
    v.remove_global_point_cloud(3)
    v.remove_keyframe(2)
    p_img = v.publish_topic("tracking", np.zeros((24, 32), np.uint8))
    assert p_img and (p_img.endswith(".png") or p_img.endswith(".npy"))
    out = v.render(str(tmp_path / "map.png"))
    import os

    assert os.path.exists(out)
    assert len(v.keyframes) == 2 and len(v.global_points) == 9
    v.remove_keyframes()
    v.remove_global_point_clouds()
    v.remove_local_point_cloud()
    assert not v.keyframes and not v.global_points
