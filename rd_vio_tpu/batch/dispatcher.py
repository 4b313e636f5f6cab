"""Coalescing dispatcher for the batched multi-sequence runtime.

Round-4 measured the single-sequence pipeline latency-bound: the chip is busy
17-38% of each frame and every dispatch/fetch pays a fixed host + ~25 ms
tunnel cost, so running N sequences as N threads (round-4 bench phase 4)
scaled only 1.34x at N=4 — the per-sequence dispatch overhead and the GIL
serialized everything (VERDICT r4 item 1).

This module changes the execution model: per lockstep tick, every sequence's
host pipeline ASSEMBLES its solve (NumPy, per sequence) and SUBMITS it here;
`flush()` stacks the N problem pytrees along a new leading axis and runs ONE
vmapped device program per stage — the per-frame localize+subwindow chain and
the fused keyframe step (localize + triangulate + window BA + validation +
marginalization, builders.py) — so N streams share one dispatch, one device
round trip, and one result fetch. Device-resident state that used to be
per-sequence (the subwindow chain states of round 4's `_dev_sub`, the
marginalization priors) lives in batched (N, ...) trees owned by this
dispatcher; per-row updates are masked in-program so sequences on different
branches (keyframe vs subframe tick) stay independent.

There is no reference counterpart: the reference (SummerSigh/rd_vio) is a
single-session CPU pipeline. This is the sequence-parallel scaling axis of
SURVEY.md §5 made device-native.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from rd_vio_tpu.estimation.state import FrameStates
from rd_vio_tpu.models import builders
from rd_vio_tpu.utils.host import fetch, fetch_async


def _stack_trees(trees):
    """Stack a list of same-structure (NumPy-leaf) pytrees along axis 0."""
    return jax.tree_util.tree_map(lambda *leaves: np.stack(leaves), *trees)


def _mask_rows(mask):
    """Reshape an (N,) bool mask for broadcasting against (N, ...) leaves."""
    def apply(new, old):
        m = mask.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(m, new.astype(old.dtype), old)
    return apply


@jax.jit
def _batched_sub_jit(pa_loc, pa_sub, j_slots, chain, lip, sp, active, calib,
                     max_iterations):
    """N per-frame localize+subwindow chains as ONE program (vmap of
    builders._fused_localize_subwindow_chain_jit). Returns the updated
    batched chain states (inactive rows keep their previous states) and the
    host transfer tuple (the same tree apply_result_np consumes, with a
    leading sequence axis)."""
    def one(pl, ps, js, prev, l, s):
        return builders._fused_localize_subwindow_chain_jit.__wrapped__(
            pl, ps, js, prev, l, s, calib, max_iterations
        )

    res = jax.vmap(one)(pa_loc, pa_sub, j_slots, chain, lip, sp)
    new_chain = jax.tree_util.tree_map(_mask_rows(active), res.states, chain)
    s = res.states
    transfer = (s.q, s.p, s.v, s.bg, s.ba, res.inv_depth)
    return new_chain, transfer


@jax.jit
def _batched_kf_jit(arrays, priors, calib, max_iterations):
    """N fused keyframe steps as ONE program (vmap of
    builders._fused_keyframe_jit). The marginalizations run as a SEPARATE
    chained program (_batched_marg_jit) dispatched right after — exactly the
    single-sequence split (builders.py): the host's synchronous fetch of the
    keyframe results then never waits on the f64 marginalization, which
    overlaps the following ticks on the device."""
    def one(a, prior):
        return builders._fused_keyframe_jit.__wrapped__(
            a["pa_loc"], a["b"], a["qcw"], a["pcw"], a["m_tri"], a["us"],
            a["tri_aqc"], a["tri_apc"], a["pa_w"], a["j_w"], a["wlm_tri"],
            prior, a["va"], calib, max_iterations,
        )

    res, res_loc, valid_out, tri_ok, tri_invd = jax.vmap(one)(arrays, priors)
    s = res.states
    sl = res_loc.states
    transfer = (s.q, s.p, s.v, s.bg, s.ba, res.inv_depth,
                sl.q, sl.p, sl.v, sl.bg, sl.ba, valid_out, tri_ok, tri_invd)
    return res, valid_out, tri_ok, tri_invd, transfer


@jax.jit
def _batched_marg_jit(res_states, res_invd, valid_out, tri_ok, tri_invd,
                      arrays, priors, kf_mask, calib):
    """N chained slot-0 marginalizations (vmap of _marginalize_tail_jit);
    the batched prior tree updates only on rows whose sequence actually
    keyframed this tick (kf_mask) — dummy rows keep their prior. Output
    stays device-resident; the host never fetches it."""
    def one(s, invd, v, ok, ti, a, prior):
        return builders._marginalize_tail_jit.__wrapped__(
            s, invd, v, ti, ok,
            a["pa_m"], a["mlm_vti"], a["mlm_from_w"], a["mlm_tri"],
            prior, calib,
        )

    new_priors = jax.vmap(one)(
        res_states, res_invd, valid_out, tri_ok, tri_invd, arrays, priors
    )
    return jax.tree_util.tree_map(_mask_rows(kf_mask), new_priors, priors)


@jax.jit
def _set_row_jit(tree, row_tree, i):
    return jax.tree_util.tree_map(
        lambda t, r: t.at[i].set(jnp.asarray(r).astype(t.dtype)),
        tree, row_tree,
    )


@jax.jit
def _get_row_jit(tree, i):
    return jax.tree_util.tree_map(lambda t: t[i], tree)


class _SharedFetch:
    """One batched device->host transfer shared by N RowFutures."""

    def __init__(self):
        self._af = None
        self._host = None
        self._lock = threading.Lock()

    def bind_async(self, af):
        self._af = af

    def bind_host(self, tree):
        self._host = tree

    def result(self):
        with self._lock:
            if self._host is None:
                if self._af is None:
                    raise RuntimeError(
                        "batched result consumed before the dispatcher "
                        "flushed its tick — call BatchDispatcher.flush()"
                    )
                self._host = self._af.wait()
            return self._host


class RowFuture:
    """Row view of a _SharedFetch: wait() yields this sequence's slice of
    the batched transfer (same structure apply_result_np consumes)."""

    __slots__ = ("_shared", "_row")

    def __init__(self, shared: _SharedFetch, row: int):
        self._shared = shared
        self._row = row

    def wait(self):
        tree = self._shared.result()
        return jax.tree_util.tree_map(lambda a: a[self._row], tree)

    def done(self) -> bool:
        return self._shared._host is not None or (
            self._shared._af is not None and self._shared._af.done()
        )


class BatchDispatcher:
    """Per-tick coalescer for N lockstep sequences (see module docstring).

    Protocol per tick: each sequence's host pipeline calls submit_sub() OR
    submit_kf() at most once, then the driver calls flush() exactly once.
    flush() dispatches at most two device programs (batched keyframe, then
    batched subwindow), synchronously fetches the keyframe results (their
    host application gates next-tick host state), runs the registered
    keyframe continuations, and leaves the subwindow fetch ASYNC — its
    RowFutures resolve during the next tick's drain, exactly like the
    single-sequence async FIFO."""

    def __init__(self, n: int, calib: builders.CalibArrays,
                 max_iterations: int):
        self.n = n
        self.calib = calib
        self.max_iterations = int(max_iterations)
        # submissions may arrive from the driver's host worker pool
        self._submit_lock = threading.Lock()
        # per-tick submissions
        self._sub: Dict[int, tuple] = {}
        self._kf: Dict[int, tuple] = {}
        self._kf_continuations: List = []
        # dummy-row caches (last submission per sequence)
        self._sub_cache: List[Optional[tuple]] = [None] * n
        self._kf_cache: List[Optional[dict]] = [None] * n
        # batched device state
        self._chain: Optional[FrameStates] = None  # (N, Wf, ...) states
        self._priors = None  # batched PriorFactor tree, (N, ...) leaves
        self._prior_writes: Dict[int, object] = {}  # row -> device tree
        # steady-state markers (benchmark steady-window detection): how many
        # batched keyframe flushes have run, and how many sequences have
        # ever submitted a batched program
        self.n_kf_flushes = 0
        self.ever_submitted = set()

    # -- prior row plumbing (BatchSWT transition + rare host paths) -------
    def put_prior_row(self, i: int, prior_tree):
        """Queue sequence i's device-resident prior for insertion into the
        batched tree at the next flush (before the keyframe program runs)."""
        self._prior_writes[i] = prior_tree

    def get_prior_row(self, i: int):
        """Materialize sequence i's prior as a standalone device tree (rare
        host fallback paths, e.g. double marginalization)."""
        self._apply_prior_writes()
        if self._priors is None:
            return None
        return _get_row_jit(self._priors, i)

    def _apply_prior_writes(self):
        for i, tree in self._prior_writes.items():
            if self._priors is None:
                self._priors = jax.tree_util.tree_map(
                    lambda r: jnp.zeros((self.n,) + np.shape(r),
                                        jnp.asarray(r).dtype),
                    tree,
                )
            self._priors = _set_row_jit(self._priors, tree, i)
        self._prior_writes.clear()

    # -- submissions ------------------------------------------------------
    def submit_sub(self, i: int, pa_loc, pa_sub, j_slot: int,
                   loc_ip_prev: int, sub_prev: np.ndarray) -> RowFuture:
        shared = _SharedFetch()
        with self._submit_lock:
            self._sub[i] = (pa_loc, pa_sub, np.int32(j_slot),
                            np.int32(loc_ip_prev),
                            np.asarray(sub_prev, np.int32), shared)
        return RowFuture(shared, i)

    def submit_kf(self, i: int, arrays: dict, continuation) -> RowFuture:
        shared = _SharedFetch()
        with self._submit_lock:
            self._kf[i] = (arrays, shared)
            self._kf_continuations.append(continuation)
        return RowFuture(shared, i)

    # -- the tick barrier --------------------------------------------------
    def flush(self):
        from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as T

        if self._kf:
            with T.time("batch.kf"):
                self._flush_kf()
        if self._sub:
            with T.time("batch.sub"):
                self._flush_sub()

    def _flush_kf(self):
        self._apply_prior_writes()
        rows = []
        mask = np.zeros(self.n, bool)
        shareds = {}
        for i in range(self.n):
            if i in self._kf:
                arrays, shared = self._kf[i]
                self._kf_cache[i] = arrays
                shareds[i] = shared
                mask[i] = True
            else:
                arrays = self._kf_cache[i]
                if arrays is None:
                    # never keyframed yet: borrow any live submission's
                    # arrays purely as a well-conditioned dummy problem
                    arrays = next(iter(self._kf.values()))[0]
            rows.append(arrays)
        stacked = _stack_trees(rows)
        res, valid_out, tri_ok, tri_invd, transfer = _batched_kf_jit(
            stacked, self._priors, self.calib.tree, self.max_iterations,
        )
        # marginalizations chain as a second device program the host never
        # waits on (the f64 marginalization is the most expensive piece of
        # the keyframe tail on TPU — fusing it into the fetched program made
        # the tick block ~350 ms at N=4)
        self._priors = _batched_marg_jit(
            res.states, res.inv_depth, valid_out, tri_ok, tri_invd,
            stacked, self._priors, jnp.asarray(mask), self.calib.tree,
        )
        # synchronous fetch: keyframe results gate host bookkeeping (window
        # states, track flags, marginalization host tail) before the next
        # tick's specs are assembled — one batched round trip for all N
        host = fetch(transfer)
        for i, shared in shareds.items():
            shared.bind_host(host)
        self.n_kf_flushes += 1
        self.ever_submitted.update(shareds)
        self._kf.clear()
        conts, self._kf_continuations = self._kf_continuations, []
        for c in conts:
            c()

    def _flush_sub(self):
        if self._chain is None:
            any_pa_sub = next(iter(self._sub.values()))[1]
            Wf = any_pa_sub.q.shape[0]
            dt = any_pa_sub.q.dtype
            self._chain = FrameStates(
                q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dt), (self.n, Wf, 1)),
                p=jnp.zeros((self.n, Wf, 3), dt),
                v=jnp.zeros((self.n, Wf, 3), dt),
                bg=jnp.zeros((self.n, Wf, 3), dt),
                ba=jnp.zeros((self.n, Wf, 3), dt),
            )
        pa_locs, pa_subs, j_slots, lips, sps = [], [], [], [], []
        mask = np.zeros(self.n, bool)
        shareds = {}
        for i in range(self.n):
            if i in self._sub:
                pa_loc, pa_sub, js, lip, sp, shared = self._sub[i]
                self._sub_cache[i] = (pa_loc, pa_sub, js)
                shareds[i] = shared
                mask[i] = True
            else:
                cached = self._sub_cache[i]
                if cached is None:
                    s0 = next(iter(self._sub.values()))
                    cached = (s0[0], s0[1], s0[2])
                pa_loc, pa_sub, js = cached
                lip = np.int32(-1)
                sp = np.full(len(next(iter(self._sub.values()))[4]), -1,
                             np.int32)
            pa_locs.append(pa_loc)
            pa_subs.append(pa_sub)
            j_slots.append(js)
            lips.append(lip)
            sps.append(sp)
        self._chain, transfer = _batched_sub_jit(
            _stack_trees(pa_locs), _stack_trees(pa_subs),
            np.stack(j_slots), self._chain, np.stack(lips), np.stack(sps),
            jnp.asarray(mask), self.calib.tree, self.max_iterations,
        )
        af = fetch_async(transfer)
        for i, shared in shareds.items():
            shared.bind_async(af)
        self._sub.clear()
