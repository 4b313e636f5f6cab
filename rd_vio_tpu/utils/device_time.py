"""Device-time calibration for the duty-cycle bench metric (VERDICT r3
item 4).

`block_until_ready` does not wait on tunneled TPU deployments and any
`device_get` costs a fixed ~25 ms round trip, so per-call wall timing cannot
separate device compute from dispatch/transfer. The proven methodology
(scripts/bench_klt.py, scripts/bench_frontend_loop.py) is chained
device-to-device execution with ONE final fetch; this module packages it as
in-program `lax.scan` chains so even host dispatch cost is excluded:

  wall(scan of K bodies) - wall(scan of 1 body) = (K-1) * t_device(body)

The pipeline captures one representative set of live arguments per
steady-state program (enable with `CAPTURE=True`; `builders` and
`FeatureTracker` call `capture(...)` at dispatch time); `measure_all()`
replays them under scan and returns per-program device milliseconds. The
bench multiplies by observed per-frame program counts to report
`device_busy_ms_per_frame` and `duty_cycle`.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

CAPTURE = False
REGISTRY: Dict[str, dict] = {}


def capture(name: str, **kw):
    """Record one live argument set for `name` (first capture wins — the
    shapes are static, so any steady-state instance is representative)."""
    if CAPTURE and name not in REGISTRY:
        REGISTRY[name] = kw


def reset():
    REGISTRY.clear()


def _timed(fn, *args, reps_long: int = 8) -> float:
    """Device ms per body iteration via the two-length scan difference."""
    short = fn(1, *args)
    jax.block_until_ready(short)  # compile
    long_ = fn(reps_long, *args)
    jax.block_until_ready(long_)  # compile
    t0 = time.perf_counter()
    jax.device_get(fn(1, *args))
    t1 = time.perf_counter()
    jax.device_get(fn(reps_long, *args))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 0.0) / (reps_long - 1) * 1e3


def measure_subwindow() -> Optional[float]:
    """Device ms of the chained localize+subwindow program (the per-frame
    subframe-path program)."""
    cap = REGISTRY.get("subwindow")
    if cap is None:
        return None
    from rd_vio_tpu.models import builders

    import functools

    @functools.lru_cache(maxsize=4)
    def make(reps):
        @jax.jit
        def run(pa_loc, pa_sub, j_slot, prev, lip, sp, calib, it):
            def body(carry, _):
                res = builders._fused_localize_subwindow_chain_jit.__wrapped__(
                    pa_loc, pa_sub, j_slot, carry, lip, sp, calib, it
                )
                return res.states, res.cost
            s, c = jax.lax.scan(body, prev, None, length=reps)
            return c
        return run

    a = cap
    return _timed(
        lambda reps, *args: make(reps)(*args),
        a["pa_loc"], a["pa_sub"], a["j_slot"], a["prev"], a["loc_ip_prev"],
        a["sub_prev"], a["calib"], a["max_iterations"],
    )


def measure_keyframe() -> Optional[float]:
    """Device ms of one fused keyframe step INCLUDING the chained
    marginalization program (per keyframe, not per frame)."""
    cap = REGISTRY.get("keyframe")
    if cap is None:
        return None
    from rd_vio_tpu.models import builders

    import functools

    @functools.lru_cache(maxsize=4)
    def make(reps):
        @jax.jit
        def run(args, prior):
            def body(prior_c, _):
                res, res_loc, valid_out, tri_ok, tri_invd = (
                    builders._fused_keyframe_jit.__wrapped__(
                        args["pa_loc"], args["b"], args["qcw"], args["pcw"],
                        args["m_tri"], args["us"], args["tri_aqc"],
                        args["tri_apc"], args["pa_w"], args["j_w"],
                        args["wlm_tri"], prior_c, args["va"], args["calib"],
                        args["max_iterations"],
                    )
                )
                new_prior = builders._marginalize_tail_jit.__wrapped__(
                    res.states, res.inv_depth, valid_out, tri_invd, tri_ok,
                    args["pa_m"], args["mlm_vti"], args["mlm_from_w"],
                    args["mlm_tri"], prior_c, args["calib"],
                )
                return new_prior, res.cost
            p, c = jax.lax.scan(body, prior, None, length=reps)
            return c
        return run

    a = dict(cap)
    prior = a.pop("prior")
    return _timed(lambda reps, *args: make(reps)(*args), a, prior)


def measure_ft_loop() -> Optional[float]:
    """Device ms of the frontend-loop per-frame program (the captured
    variant is the config's steady-state majority: detect when
    sliding_window_tracker_frequent == 1, track-only otherwise)."""
    cap = REGISTRY.get("ft_loop")
    if cap is None:
        return None
    from rd_vio_tpu.ops import frontend_loop as fl

    import functools

    @functools.lru_cache(maxsize=4)
    def make(reps):
        kw = cap["kwargs"]

        @jax.jit
        def run(state, pyr_a, pyr_b, R_pred, key, drop, K, rot_thr):
            def body(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                st2, fetch = fl.ft_loop_step.__wrapped__(
                    st, pyr_a, pyr_b, R_pred, sub, drop, K, rot_thr, **kw
                )
                return (st2, k), fetch["misalign"]
            (s, _), mis = jax.lax.scan(body, (state, key), None, length=reps)
            return mis
        return run

    a = cap
    return _timed(
        lambda reps, *args: make(reps)(*args),
        a["state"], a["pyr_a"], a["pyr_b"], a["R_pred"], a["key"], a["drop"],
        a["K"], a["rot_thr"],
    )


def measure_all() -> Dict[str, float]:
    out = {}
    for name, fn in (("subwindow", measure_subwindow),
                     ("keyframe", measure_keyframe),
                     ("ft_loop", measure_ft_loop)):
        try:
            v = fn()
            if v is not None:
                out[name] = v
        except Exception as e:  # noqa: BLE001 — calibration is best-effort
            import sys

            print(f"[device_time] {name} calibration failed: {e}",
                  file=sys.stderr, flush=True)
    return out
