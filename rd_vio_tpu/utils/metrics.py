"""Structured per-frame metrics and stage timing.

The reference only has scoped wall-clock debug timers and per-call latency
prints (SURVEY.md §5 tracing). Here: a stage-latency ring buffer + JSONL
emission of per-frame metrics (tracked keypoints, inlier ratios, solver
iterations, stage timings), and context-manager timers.
"""

from __future__ import annotations

import collections
import contextlib
import json
import threading
import time
from typing import Dict, Optional


class StageTimer:
    """Per-stage wall-clock ring buffers (reference unique_timer.h analogue).

    `suppressed()` disables recording for the current thread: warmup shadow
    pipelines (utils/warmup.py) share the jitted-program caches with the real
    pipeline but must not pollute its stage statistics."""

    _tls = threading.local()

    def __init__(self, window: int = 256):
        self.window = window
        self.samples: Dict[str, collections.deque] = {}

    @classmethod
    @contextlib.contextmanager
    def suppressed(cls):
        prev = getattr(cls._tls, "off", False)
        cls._tls.off = True
        try:
            yield
        finally:
            cls._tls.off = prev

    @contextlib.contextmanager
    def time(self, stage: str):
        if getattr(self._tls, "off", False):
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.samples.setdefault(
                stage, collections.deque(maxlen=self.window)
            ).append(dt)

    def reset(self):
        """Drop all recorded samples (bench phase boundaries)."""
        self.samples.clear()

    def stats(self) -> Dict[str, dict]:
        out = {}
        for k, dq in self.samples.items():
            if not dq:
                continue
            xs = sorted(dq)
            n = len(xs)
            out[k] = {
                "n": n,
                "mean_ms": 1e3 * sum(xs) / n,
                "p50_ms": 1e3 * xs[n // 2],
                "p90_ms": 1e3 * xs[min(n - 1, int(n * 0.9))],
            }
        return out


class MetricsLogger:
    """JSONL per-frame metrics sink."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self.latest: dict = {}

    def log(self, **kv):
        self.latest = kv
        if self._fh:
            self._fh.write(json.dumps(kv) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


GLOBAL_TIMER = StageTimer()
