"""TRUE multi-process distributed BA (SURVEY.md §4.5): two processes with 4
virtual CPU devices each form an 8-device global mesh via
jax.distributed.initialize; solve_ba_sharded must match the single-device
solver across the process boundary (exercises host data movement and
per-process addressable shards that a single-process mesh hides)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_ba(tmp_path):
    # bounded by the workers' communicate(timeout=840) below
    # (pytest-timeout is not available in this environment)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        results.append((p.returncode, stdout, stderr))
    for i, (rc, stdout, stderr) in enumerate(results):
        assert rc == 0, f"worker {i} rc={rc}\n{stderr[-3000:]}"
    for out in outs:
        d = json.loads(out.read_text())
        assert d["ok"], d
        assert d["n_local_devices"] == 4
