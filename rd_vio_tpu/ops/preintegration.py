"""IMU preintegration as a masked `lax.scan`, with covariance + bias Jacobians.

Behavioral reference: /root/reference/src/rdvio_estimation/src/preintegrator.cpp
(increment: preintegrator.cpp:22-76, integrate: 78-95, sqrt_inv_cov: 97-100,
predict: 102-112) and the error-state ordering ES_Q=0, ES_P=3, ES_V=6,
ES_BG=9, ES_BA=12 (estimation/state.h:11-18).

TPU-first design: raw samples live in fixed-capacity padded arrays
(dt, w, a)[N_max]; padding uses dt=0, which is an exact no-op of the
discrete-time update, so one jitted scan handles any sample count without
dynamic shapes. The whole scan re-runs from scratch at a given bias
linearization point, matching the reference's `integrate` semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops.lie import (
    expmap,
    hat,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    right_jacobian,
)

# error-state layout (reference state.h:11-18)
ES_Q, ES_P, ES_V, ES_BG, ES_BA, ES_SIZE = 0, 3, 6, 9, 12, 15

GRAVITY = jnp.asarray([0.0, 0.0, -9.80665])


class PreintDelta(NamedTuple):
    """Integrated IMU delta between two frames (reference preintegrator.h:11-18)."""

    t: jnp.ndarray  # scalar, total dt
    q: jnp.ndarray  # (4,) wxyz
    p: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    cov: jnp.ndarray  # (15, 15), order (q, p, v, bg, ba)
    # bias jacobians (reference preintegrator.h:20-26)
    dq_dbg: jnp.ndarray  # (3, 3)
    dp_dbg: jnp.ndarray
    dp_dba: jnp.ndarray
    dv_dbg: jnp.ndarray
    dv_dba: jnp.ndarray


def zero_delta(dtype=jnp.float64) -> PreintDelta:
    z3 = jnp.zeros((3, 3), dtype)
    return PreintDelta(
        t=jnp.zeros((), dtype),
        q=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
        p=jnp.zeros((3,), dtype),
        v=jnp.zeros((3,), dtype),
        cov=jnp.zeros((15, 15), dtype),
        dq_dbg=z3,
        dp_dbg=z3,
        dp_dba=z3,
        dv_dbg=z3,
        dv_dba=z3,
    )


def integrate_sequential(dts, ws, accs, bg, ba, cov_w, cov_a, cov_bg, cov_ba) -> PreintDelta:
    """Sequential `lax.scan` reference implementation of `integrate` (kept as
    the step-for-step mirror of preintegrator.cpp:22-95 for cross-checking;
    the production path is the associative-scan `integrate` below)."""
    dtype = ws.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    def step(d: PreintDelta, sample):
        dt, w_raw, a_raw = sample
        w = w_raw - bg
        a = a_raw - ba
        dq_inc = expmap(w * dt)  # (4,)
        R_inc_T = quat_to_matrix(dq_inc).T
        Rk = quat_to_matrix(d.q)
        Rk_hat_a = Rk @ hat(a)
        Jr = right_jacobian(w * dt)

        # --- covariance propagation (preintegrator.cpp:29-57) ---
        A = jnp.eye(9, dtype=dtype)
        A = A.at[ES_Q : ES_Q + 3, ES_Q : ES_Q + 3].set(R_inc_T)
        A = A.at[ES_V : ES_V + 3, ES_Q : ES_Q + 3].set(-dt * Rk_hat_a)
        A = A.at[ES_P : ES_P + 3, ES_Q : ES_Q + 3].set(-0.5 * dt * dt * Rk_hat_a)
        A = A.at[ES_P : ES_P + 3, ES_V : ES_V + 3].set(dt * eye3)

        B = jnp.zeros((9, 6), dtype=dtype)
        B = B.at[ES_Q : ES_Q + 3, 0:3].set(dt * Jr)
        B = B.at[ES_V : ES_V + 3, 3:6].set(dt * Rk)
        B = B.at[ES_P : ES_P + 3, 3:6].set(0.5 * dt * dt * Rk)

        inv_dt = 1.0 / jnp.maximum(dt, 1.0e-7)
        Wn = jnp.zeros((6, 6), dtype=dtype)
        Wn = Wn.at[0:3, 0:3].set(cov_w * inv_dt)
        Wn = Wn.at[3:6, 3:6].set(cov_a * inv_dt)

        cov9 = d.cov[:9, :9]
        cov9 = A @ cov9 @ A.T + B @ Wn @ B.T
        cov = d.cov.at[:9, :9].set(cov9)
        cov = cov.at[ES_BG : ES_BG + 3, ES_BG : ES_BG + 3].add(cov_bg * dt)
        cov = cov.at[ES_BA : ES_BA + 3, ES_BA : ES_BA + 3].add(cov_ba * dt)

        # --- bias jacobians (preintegrator.cpp:59-70) ---
        dp_dbg = d.dp_dbg + dt * d.dv_dbg - 0.5 * dt * dt * Rk_hat_a @ d.dq_dbg
        dp_dba = d.dp_dba + dt * d.dv_dba - 0.5 * dt * dt * Rk
        dv_dbg = d.dv_dbg - dt * Rk_hat_a @ d.dq_dbg
        dv_dba = d.dv_dba - dt * Rk
        dq_dbg = R_inc_T @ d.dq_dbg - dt * Jr

        # --- mean propagation (preintegrator.cpp:72-75) ---
        qa = quat_rotate(d.q, a)
        p_new = d.p + dt * d.v + 0.5 * dt * dt * qa
        v_new = d.v + dt * qa
        q_new = quat_normalize(quat_mul(d.q, dq_inc))

        return (
            PreintDelta(
                t=d.t + dt,
                q=q_new,
                p=p_new,
                v=v_new,
                cov=cov,
                dq_dbg=dq_dbg,
                dp_dbg=dp_dbg,
                dp_dba=dp_dba,
                dv_dbg=dv_dbg,
                dv_dba=dv_dba,
            ),
            None,
        )

    init = zero_delta(dtype)
    out, _ = jax.lax.scan(step, init, (dts.astype(dtype), ws, accs))
    return out


def integrate(dts, ws, accs, bg, ba, cov_w, cov_a, cov_bg, cov_ba) -> PreintDelta:
    """Integrate padded IMU samples from scratch at bias (bg, ba).

    Args:
      dts: (N,) per-sample integration interval; 0 entries are exact no-ops.
      ws, accs: (N, 3) raw gyro / accel samples.
      bg, ba: (3,) bias linearization point.
      cov_w/cov_a: (3,3) continuous white-noise covs; cov_bg/cov_ba random walk.

    Semantics match `integrate_sequential` (= reference preintegrator.cpp:22-95)
    up to fp reassociation, but the recurrences are evaluated with
    **associative scans and prefix sums** — O(log N) depth of batched matmuls
    instead of an N-step sequential chain. On a padded 384-sample keyframe
    chain this is the difference between ~280 ms and ~ms-level latency on TPU
    (the sequential scan serializes hundreds of tiny 9x9 ops; the parallel
    form runs them as ~2 log2 N batched layers).

    Decomposition of the per-step recurrences (see integrate_sequential):
      * orientation prefix: quaternion product chain -> associative_scan.
      * mean p, v: affine in the prefix quantities -> cumulative sums.
      * bias Jacobian dq_dbg: X_i = A_i X_{i-1} + B_i -> associative affine
        composition; the remaining Jacobians are cumulative sums over prefix
        values.
      * covariance: C_i = A_i C_{i-1} A_i^T + N_i -> associative congruence
        composition on (A, C) pairs.
    Padded dt=0 samples compose as exact identities in every recurrence.
    """
    dtype = ws.dtype
    dts = dts.astype(dtype)
    N = dts.shape[0]
    dt1 = dts[:, None]
    dt2 = (dts * dts)[:, None]

    w = ws - bg[None, :]
    a = accs - ba[None, :]
    wdt = w * dt1

    # --- orientation prefix products ------------------------------------
    dq = expmap(wdt)  # (N, 4)
    Q = jax.lax.associative_scan(quat_mul, dq)  # inclusive prefixes
    Q = quat_normalize(Q)
    q_id = jnp.zeros((1, 4), dtype).at[0, 0].set(1.0)
    q_prev = jnp.concatenate([q_id, Q[:-1]], axis=0)  # (N, 4) prefix BEFORE i

    R_prev = quat_to_matrix(q_prev)  # (N, 3, 3)
    qa = quat_rotate(q_prev, a)  # (N, 3)

    # --- mean (p, v) as prefix sums --------------------------------------
    dtqa = dt1 * qa
    v_pref = jnp.cumsum(dtqa, axis=0)
    v_prev = v_pref - dtqa  # exclusive prefix
    v_out = v_pref[-1]
    p_out = jnp.sum(dt1 * v_prev + 0.5 * dt2 * qa, axis=0)
    t_out = jnp.sum(dts)

    # --- bias Jacobians ---------------------------------------------------
    Jr = right_jacobian(wdt)  # (N, 3, 3)
    R_incT = jnp.swapaxes(quat_to_matrix(dq), -1, -2)
    RkHat = R_prev @ hat(a)  # (N, 3, 3)

    def affine_combine(e1, e2):
        # e1 earlier, e2 later: x -> A2 (A1 x + B1) + B2
        A1, B1 = e1
        A2, B2 = e2
        return A2 @ A1, A2 @ B1 + B2

    A_q, B_q = jax.lax.associative_scan(
        affine_combine, (R_incT, -dt1[..., None] * Jr)
    )
    dq_dbg_pref = B_q  # X_0 = 0 -> X_i = composed offset
    z33 = jnp.zeros((1, 3, 3), dtype)
    dq_dbg_prev = jnp.concatenate([z33, dq_dbg_pref[:-1]], axis=0)
    dq_dbg = dq_dbg_pref[-1]

    dv_dbg_step = -dt1[..., None] * (RkHat @ dq_dbg_prev)
    dv_dbg_pref = jnp.cumsum(dv_dbg_step, axis=0)
    dv_dbg_prev = dv_dbg_pref - dv_dbg_step
    dv_dbg = dv_dbg_pref[-1]

    dv_dba_step = -dt1[..., None] * R_prev
    dv_dba_pref = jnp.cumsum(dv_dba_step, axis=0)
    dv_dba_prev = dv_dba_pref - dv_dba_step
    dv_dba = dv_dba_pref[-1]

    dp_dbg = jnp.sum(
        dt1[..., None] * dv_dbg_prev - 0.5 * dt2[..., None] * (RkHat @ dq_dbg_prev),
        axis=0,
    )
    dp_dba = jnp.sum(
        dt1[..., None] * dv_dba_prev - 0.5 * dt2[..., None] * R_prev, axis=0
    )

    # --- covariance: congruence composition -------------------------------
    eye3 = jnp.eye(3, dtype=dtype)
    eye9 = jnp.eye(9, dtype=dtype)
    A = jnp.tile(eye9, (N, 1, 1))
    A = A.at[:, ES_Q : ES_Q + 3, ES_Q : ES_Q + 3].set(R_incT)
    A = A.at[:, ES_V : ES_V + 3, ES_Q : ES_Q + 3].set(-dt1[..., None] * RkHat)
    A = A.at[:, ES_P : ES_P + 3, ES_Q : ES_Q + 3].set(
        -0.5 * dt2[..., None] * RkHat
    )
    A = A.at[:, ES_P : ES_P + 3, ES_V : ES_V + 3].set(dt1[..., None] * eye3)

    B = jnp.zeros((N, 9, 6), dtype)
    B = B.at[:, ES_Q : ES_Q + 3, 0:3].set(dt1[..., None] * Jr)
    B = B.at[:, ES_V : ES_V + 3, 3:6].set(dt1[..., None] * R_prev)
    B = B.at[:, ES_P : ES_P + 3, 3:6].set(0.5 * dt2[..., None] * R_prev)

    inv_dt = 1.0 / jnp.maximum(dts, 1.0e-7)
    Wn = jnp.zeros((N, 6, 6), dtype)
    Wn = Wn.at[:, 0:3, 0:3].set(cov_w[None] * inv_dt[:, None, None])
    Wn = Wn.at[:, 3:6, 3:6].set(cov_a[None] * inv_dt[:, None, None])
    Nmat = B @ Wn @ jnp.swapaxes(B, -1, -2)

    def cov_combine(e1, e2):
        # e1 earlier, e2 later: C -> A2 (A1 C A1^T + N1) A2^T + N2
        A1, C1 = e1
        A2, C2 = e2
        return A2 @ A1, A2 @ C1 @ jnp.swapaxes(A2, -1, -2) + C2

    _, C_pref = jax.lax.associative_scan(cov_combine, (A, Nmat))
    cov9 = C_pref[-1]

    cov = jnp.zeros((15, 15), dtype)
    cov = cov.at[:9, :9].set(cov9)
    cov = cov.at[ES_BG : ES_BG + 3, ES_BG : ES_BG + 3].set(cov_bg * t_out)
    cov = cov.at[ES_BA : ES_BA + 3, ES_BA : ES_BA + 3].set(cov_ba * t_out)

    return PreintDelta(
        t=t_out,
        q=Q[-1],
        p=p_out,
        v=v_out,
        cov=cov,
        dq_dbg=dq_dbg,
        dp_dbg=dp_dbg,
        dp_dba=dp_dba,
        dv_dbg=dv_dbg,
        dv_dba=dv_dba,
    )


def sqrt_inv_cov(cov, gauge_eps: float = 0.0):
    """Whitening matrix U with U^T U = cov^-1, via the upper Cholesky factor of
    cov^{-1} (reference preintegrator.cpp:97-100: LLT(cov^-1).L.T).

    Computed TPU-safely as inv(L).T ordering-equivalent: chol(inv(cov)) needs an
    inverse; we form inv(cov) by Cholesky solve against identity.
    """
    n = cov.shape[-1]
    eye = jnp.eye(n, dtype=cov.dtype)
    L = jnp.linalg.cholesky(cov + gauge_eps * eye)
    inv_cov = jax.scipy.linalg.cho_solve((L, True), eye)
    inv_cov = 0.5 * (inv_cov + inv_cov.T)
    Lic = jnp.linalg.cholesky(inv_cov)
    return Lic.T


def predict(delta: PreintDelta, q, p, v, bg, ba):
    """Gravity-aware forward propagation of a frame state by an integrated
    delta (reference preintegrator.cpp:102-112). Returns (q', p', v', bg, ba)."""
    g = GRAVITY.astype(p.dtype)
    v_new = v + g * delta.t + quat_rotate(q, delta.v)
    p_new = p + 0.5 * g * delta.t**2 + v * delta.t + quat_rotate(q, delta.p)
    q_new = quat_normalize(quat_mul(q, delta.q))
    return q_new, p_new, v_new, bg, ba


def propagate_state(q, p, v, dt, w, a, bg, ba):
    """Single forward-Euler IMU state propagation used for IMU-rate pose
    prediction (reference handler.cpp:13-26). Batched-friendly."""
    g = GRAVITY.astype(p.dtype)
    a_world = quat_rotate(q, a - ba) + g
    q_new = quat_normalize(quat_mul(q, expmap((w - bg) * dt)))
    p_new = p + dt * v + 0.5 * dt * dt * a_world
    v_new = v + dt * a_world
    return q_new, p_new, v_new
