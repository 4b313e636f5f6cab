"""Fast device->host conversion.

On tunneled TPU platforms (axon) `np.asarray(jax_array)` takes a slow
per-buffer path (~0.7 s per call measured) while `jax.device_get` is one
batched transfer (~30 ms). `asnp` routes jax arrays through device_get and
passes host data straight to numpy; `fetch` batches a whole pytree in one
round trip — use it whenever more than one result is needed.
"""

from __future__ import annotations

import concurrent.futures
from typing import Optional

import jax
import numpy as np


def asnp(x, dtype=None) -> np.ndarray:
    """np.asarray with the fast device_get path for jax arrays."""
    if isinstance(x, jax.Array):
        x = jax.device_get(x)
    return np.asarray(x, dtype) if dtype is not None else np.asarray(x)


def fetch(tree):
    """One batched device->host transfer of an arbitrary pytree."""
    return jax.device_get(tree)


_FETCH_POOL: Optional[concurrent.futures.ThreadPoolExecutor] = None


def _fetch_pool() -> concurrent.futures.ThreadPoolExecutor:
    global _FETCH_POOL
    if _FETCH_POOL is None:
        # 8 workers: tunnel round trips OVERLAP (measured round 4: N
        # concurrent device_gets complete in ~one 25 ms RTT total), so the
        # pool must never be the serializer. The depth-2 frontend FIFO plus
        # the estimator FIFO plus keyframe extras keep up to ~5 fetches in
        # flight; with only 2 workers the later fetches queued for a full
        # RTT behind the earlier ones and the wait landed back on the
        # critical path.
        _FETCH_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=8, thread_name_prefix="rdvio-fetch"
        )
    return _FETCH_POOL


class AsyncFetch:
    """A device->host transfer started immediately on a helper thread.

    On the tunneled TPU the transfer costs one ~30 ms round trip; starting it
    right after the dispatch and consuming it one pipeline step later hides
    that round trip behind host work (the consumer's wait() is ~0 when the
    result landed in the meantime)."""

    def __init__(self, tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, jax.Array):
                try:
                    leaf.copy_to_host_async()  # runtime hint; optional
                except Exception:  # noqa: BLE001 — best-effort only
                    pass
        self._future = _fetch_pool().submit(jax.device_get, tree)

    def wait(self):
        return self._future.result()

    def done(self) -> bool:
        """True when the transfer has landed (wait() would not block)."""
        return self._future.done()


def fetch_async(tree) -> AsyncFetch:
    """Start fetching a pytree without blocking; .wait() yields numpy."""
    return AsyncFetch(tree)
