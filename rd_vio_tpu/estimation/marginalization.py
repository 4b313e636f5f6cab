"""Sliding-window marginalization: Schur-out the oldest frame into a
square-root prior.

Behavioral reference: /root/reference/src/rdvio_estimation/include/rdvio/
estimation/ceres/marginalization_factor.h:74-475 — accumulate (a) the current
prior, (b) the keyframe-preintegration factor(s) touching the victim, (c) all
reprojection factors of tracks anchored at the victim (landmark inverse depth
Schur-eliminated analytically per track, scalar 1/info), then take the Schur
complement of the victim's 15x15 block and refactorize via eigendecomposition
with eigenvalue clipping > 1e-8 into (sqrt_inv_cov, infovec).

TPU-first notes: the victim is always slot 0 (reference map.cpp:50-62 only
marginalizes frame 0), so the frame remap reduces to a static 15-row shift.
No robust loss is applied here (matches the reference, which uses raw J^T J).
The 15x15 victim inverse uses an eigh pseudo-inverse (LU is f32-only on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rd_vio_tpu.estimation import ba
from rd_vio_tpu.estimation import factors as F
from rd_vio_tpu.estimation.state import ES_SIZE, FrameStates


def _eigh_pinv(M, clip=1e-12):
    w, V = jnp.linalg.eigh(0.5 * (M + M.T))
    w_inv = jnp.where(w > clip * jnp.maximum(jnp.max(w), 1.0), 1.0 / w, 0.0)
    return (V * w_inv[None, :]) @ V.T


@functools.partial(jax.jit, static_argnames=())
def marginalize_frame0(states: FrameStates, inv_depth, pb: ba.BAProblem):
    """Marginalize window slot 0. `pb` must contain: the current prior, the
    preintegration factor(s) adjacent to slot 0 (reference: j in {1}), and the
    reprojection observations of tracks anchored at slot 0 (valid-masked).

    Returns the new PriorFactor, already shifted so the prior's slot k refers
    to the old slot k+1 (the caller shifts its own frame arrays identically).
    """
    W = states.q.shape[0]
    D = W * ES_SIZE
    dtype = states.q.dtype
    L = inv_depth.shape[0]

    # --- accumulate information from the three factor groups ---
    r_p, J_p = ba.linearize_prior(states, pb)
    r_m, Jc_m = ba.linearize_imu(states, pb)
    wm = pb.imu.valid.astype(dtype)[:, None]
    rm = (r_m * wm).reshape(-1)
    Jm = (Jc_m * wm[..., None]).reshape(-1, D)
    r_v, Jc_v, Jl_v = ba.linearize_reprojection(states, inv_depth, pb)
    wv = pb.reproj.valid.astype(dtype)[:, None]
    rv = (r_v * wv).reshape(-1)
    Jv = (Jc_v * wv[..., None]).reshape(-1, D)
    Jlv = (Jl_v * wv).reshape(-1)
    lm_rows = jnp.repeat(pb.reproj.lm, 2)

    J_all = jnp.concatenate([J_p, Jm, Jv], axis=0)
    r_all = jnp.concatenate([r_p, rm, rv], axis=0)
    info = J_all.T @ J_all
    vec = J_all.T @ r_all

    # --- analytic per-track landmark elimination (reference ...:386-398) ---
    Hll = jax.ops.segment_sum(Jlv * Jlv, lm_rows, num_segments=L)
    bl = jax.ops.segment_sum(Jlv * rv, lm_rows, num_segments=L)
    Hcl = jax.ops.segment_sum(Jlv[:, None] * Jv, lm_rows, num_segments=L)
    inv_Hll = jnp.where(Hll > 1e-12, 1.0 / Hll, 0.0)
    info = info - Hcl.T @ (Hcl * inv_Hll[:, None])
    vec = vec - Hcl.T @ (bl * inv_Hll)

    # --- Schur complement of the victim block (slot 0) ---
    C = info[:ES_SIZE, :ES_SIZE]
    B = info[ES_SIZE:, :ES_SIZE]  # (D-15, 15)
    P = _eigh_pinv(C)
    info_rest = info[ES_SIZE:, ES_SIZE:] - B @ P @ B.T
    vec_rest = vec[ES_SIZE:] - B @ P @ vec[:ES_SIZE]

    # --- shift up by one slot into the fixed-capacity layout ---
    info_new = jnp.zeros((D, D), dtype).at[: D - ES_SIZE, : D - ES_SIZE].set(info_rest)
    vec_new = jnp.zeros((D,), dtype).at[: D - ES_SIZE].set(vec_rest)

    # --- sqrt refactorization with eigenvalue clipping (reference ...:440-460) ---
    w, V = jnp.linalg.eigh(0.5 * (info_new + info_new.T))
    keep = w > 1.0e-8
    lam = jnp.where(keep, w, 0.0)
    lam_inv = jnp.where(keep, 1.0 / jnp.maximum(w, 1e-300), 0.0)
    S_new = jnp.sqrt(lam)[:, None] * V.T
    iv_new = jnp.sqrt(lam_inv)[:, None] * V.T @ vec_new

    shift = lambda a: jnp.roll(a, -1, axis=0)
    return F.PriorFactor(
        q_lin=shift(states.q), p_lin=shift(states.p), v_lin=shift(states.v),
        bg_lin=shift(states.bg), ba_lin=shift(states.ba),
        sqrt_inv_cov=S_new, infovec=iv_new,
    )
