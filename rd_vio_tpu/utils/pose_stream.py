"""UDP pose streaming — counterpart of the reference's SlimeVR client
(reference examples/slime.cpp:1-324: discovery handshake, heartbeat, rotation
packets to a SlimeVR full-body-tracking server).

Implements the SlimeVR owoTrack-style packet framing the reference uses:
big-endian (packet_type: u32, packet_id: u64, payload). Handshake (type 3),
heartbeat (type 0), rotation quaternion (type 1, x y z w f32). A generic JSON
pose publisher is also provided for non-SlimeVR consumers.
"""

from __future__ import annotations

import json
import socket
import struct
import time
from typing import Optional

import numpy as np

HANDSHAKE = 3
HEARTBEAT = 0
ROTATION = 1


class SlimeVrClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 6969):
        self.addr = (host, port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setblocking(False)
        self.packet_id = 0
        self._last_heartbeat = 0.0

    def _send(self, ptype: int, payload: bytes = b""):
        msg = struct.pack(">IQ", ptype, self.packet_id) + payload
        self.packet_id += 1
        try:
            self.sock.sendto(msg, self.addr)
        except OSError:
            pass  # non-blocking best-effort, like the reference's UDP client

    def handshake(self, board_type: int = 13, imu_type: int = 0,
                  mcu_type: int = 3, firmware: str = "rd_vio_tpu"):
        fw = firmware.encode()[:15]
        payload = struct.pack(
            ">III", board_type, imu_type, mcu_type
        ) + struct.pack(">III", 0, 0, 0) + struct.pack(">I", 0)
        payload += bytes([len(fw)]) + fw
        payload += bytes(6)  # mac
        self._send(HANDSHAKE, payload)

    def heartbeat(self, interval: float = 0.8):
        now = time.monotonic()
        if now - self._last_heartbeat >= interval:
            self._send(HEARTBEAT)
            self._last_heartbeat = now

    def send_rotation(self, q_wxyz):
        """Rotation packet: SlimeVR expects x y z w order."""
        q = np.asarray(q_wxyz, dtype=np.float32)
        payload = struct.pack(">ffff", q[1], q[2], q[3], q[0])
        self._send(ROTATION, payload)
        self.heartbeat()

    def close(self):
        self.sock.close()


class JsonPosePublisher:
    """Plain JSON-over-UDP pose stream for generic consumers."""

    def __init__(self, host: str = "127.0.0.1", port: int = 9870):
        self.addr = (host, port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setblocking(False)

    def publish(self, t: float, q_wxyz, p):
        msg = json.dumps({
            "t": float(t),
            "q": [float(x) for x in q_wxyz],
            "p": [float(x) for x in p],
        }).encode()
        try:
            self.sock.sendto(msg, self.addr)
        except OSError:
            pass

    def close(self):
        self.sock.close()
