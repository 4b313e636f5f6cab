"""Factor residuals for the sliding-window VI-BA, with autodiff Jacobians.

Behavioral reference (residual definitions matched exactly):
- reprojection: /root/reference/src/rdvio_estimation/include/rdvio/estimation/
  ceres/reprojection_factor.h:24-96 (inverse-depth along the anchor bearing,
  residual in the tangent basis of the observed bearing, whitened by the
  K-scaled pixel noise).
- preintegration: ceres/preintegration_factor.h:19-162 (15-dim residual with
  IMU extrinsic composition and first-order bias correction).
- rotation prior: ceres/rotation_factor.h:12-66 (rotation-only reprojection).
- marginalization prior: ceres/marginalization_factor.h:27-72
  (r = S @ dx + infovec).

TPU-first design: each residual is a pure function of the involved states;
Jacobians come from `jax.jacfwd` of the residual composed with the tangent
retraction at delta = 0 — this reproduces the reference's hand-derived
Jacobians (same manifold, same whitening) without transcription risk, and
vmaps over factor arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops.lie import (
    expmap,
    logmap,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    s2_tangential_basis,
)
from rd_vio_tpu.ops.preintegration import GRAVITY, PreintDelta
from rd_vio_tpu.estimation.state import ES_SIZE

# ---------------------------------------------------------------------------
# factor data (fixed-capacity arrays, masked)
# ---------------------------------------------------------------------------


class ReprojFactors(NamedTuple):
    """Reprojection observations, [O] leading axis."""

    tgt: jnp.ndarray  # (O,) target frame slot
    ref: jnp.ndarray  # (O,) anchor frame slot
    lm: jnp.ndarray  # (O,) landmark slot in [0, L)
    z_ref: jnp.ndarray  # (O, 3) anchor bearing (unit, camera frame)
    z_tgt: jnp.ndarray  # (O, 3) observed bearing (unit, camera frame)
    valid: jnp.ndarray  # (O,) bool


class ImuFactors(NamedTuple):
    """Preintegration factors between frame pairs, [F] leading axis."""

    i: jnp.ndarray  # (F,)
    j: jnp.ndarray  # (F,)
    delta: PreintDelta  # leaves have leading (F, ...)
    sqrt_inv_cov: jnp.ndarray  # (F, 15, 15)
    bg0: jnp.ndarray  # (F, 3) bias linearization point of the delta
    ba0: jnp.ndarray  # (F, 3)
    valid: jnp.ndarray  # (F,) bool


class ReprojPriorFactors(NamedTuple):
    """Reprojection PRIOR observations: anchor pose and inverse depth are
    constants baked into the factor data (reference
    CeresReprojectionPriorFactor, reprojection_factor.h:99-122). Only the
    target frame occupies a state slot — this keeps per-frame localization and
    subwindow solves tiny."""

    tgt: jnp.ndarray  # (P,)
    q_ref: jnp.ndarray  # (P, 4) fixed anchor pose
    p_ref: jnp.ndarray  # (P, 3)
    inv_depth: jnp.ndarray  # (P,) fixed
    z_ref: jnp.ndarray  # (P, 3)
    z_tgt: jnp.ndarray  # (P, 3)
    valid: jnp.ndarray  # (P,) bool


class ImuPriorFactors(NamedTuple):
    """Preintegration PRIOR: frame i state is constant data (reference
    CeresPreIntegrationPriorFactor, preintegration_factor.h:165-198)."""

    j: jnp.ndarray  # (F,)
    q_i: jnp.ndarray  # (F, 4)
    p_i: jnp.ndarray  # (F, 3)
    v_i: jnp.ndarray  # (F, 3)
    bg_i: jnp.ndarray  # (F, 3)
    ba_i: jnp.ndarray  # (F, 3)
    delta: "PreintDelta"  # leaves (F, ...)
    sqrt_inv_cov: jnp.ndarray  # (F, 15, 15)
    valid: jnp.ndarray  # (F,) bool


def empty_reproj_prior(P: int = 1, dtype=jnp.float64) -> "ReprojPriorFactors":
    unit_z = jnp.tile(jnp.asarray([0.0, 0, 1.0], dtype), (P, 1))
    return ReprojPriorFactors(
        tgt=jnp.zeros(P, jnp.int32),
        q_ref=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (P, 1)),
        p_ref=jnp.zeros((P, 3), dtype), inv_depth=jnp.ones(P, dtype),
        z_ref=unit_z, z_tgt=unit_z, valid=jnp.zeros(P, bool),
    )


def empty_imu_prior(Fp: int = 1, dtype=jnp.float64) -> "ImuPriorFactors":
    from rd_vio_tpu.ops.preintegration import zero_delta

    delta = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Fp,) + a.shape), zero_delta(dtype)
    )
    z3 = jnp.zeros((Fp, 3), dtype)
    return ImuPriorFactors(
        j=jnp.zeros(Fp, jnp.int32),
        q_i=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (Fp, 1)),
        p_i=z3, v_i=z3, bg_i=z3, ba_i=z3,
        delta=delta, sqrt_inv_cov=jnp.tile(jnp.eye(15, dtype=dtype)[None], (Fp, 1, 1)),
        valid=jnp.zeros(Fp, bool),
    )


class RotFactors(NamedTuple):
    """Rotation-only reprojection priors, [Or] leading axis; the anchor frame
    pose is held constant (reference rotation_factor.h)."""

    tgt: jnp.ndarray  # (Or,)
    q_ref: jnp.ndarray  # (Or, 4) fixed anchor rotation
    z_ref: jnp.ndarray  # (Or, 3)
    z_tgt: jnp.ndarray  # (Or, 3)
    valid: jnp.ndarray  # (Or,) bool


class PriorFactor(NamedTuple):
    """Marginalization prior over the whole window (fixed D = W*15)."""

    q_lin: jnp.ndarray  # (W, 4)
    p_lin: jnp.ndarray  # (W, 3)
    v_lin: jnp.ndarray  # (W, 3)
    bg_lin: jnp.ndarray  # (W, 3)
    ba_lin: jnp.ndarray  # (W, 3)
    sqrt_inv_cov: jnp.ndarray  # (D, D)
    infovec: jnp.ndarray  # (D,)


class Extrinsics(NamedTuple):
    q_bc: jnp.ndarray  # (4,) camera-to-body rotation
    p_bc: jnp.ndarray  # (3,)
    q_bi: jnp.ndarray  # (4,) imu-to-body rotation
    p_bi: jnp.ndarray  # (3,)


def initial_prior(W: int, states, gauge: float = 1.0e15, dtype=jnp.float64) -> PriorFactor:
    """Fresh prior: absolute (q, p) gauge of 1e15 on frame 0
    (reference marginalization_factor.h:28-31)."""
    D = W * ES_SIZE
    S = jnp.zeros((D, D), dtype)
    S = S.at[0:3, 0:3].set(gauge * jnp.eye(3, dtype=dtype))
    S = S.at[3:6, 3:6].set(gauge * jnp.eye(3, dtype=dtype))
    return PriorFactor(
        q_lin=states.q, p_lin=states.p, v_lin=states.v,
        bg_lin=states.bg, ba_lin=states.ba,
        sqrt_inv_cov=S, infovec=jnp.zeros((D,), dtype),
    )


# ---------------------------------------------------------------------------
# residuals (single factor; vmapped by the assembler)
# ---------------------------------------------------------------------------


def reprojection_residual(
    q_tgt, p_tgt, q_ref, p_ref, inv_depth, z_ref, z_tgt, ext: Extrinsics, sqrt_inv_cov2
):
    """Whitened 2-residual (reference reprojection_factor.h:36-51, 88)."""
    y_ref = z_ref / inv_depth
    y_ref_center = quat_rotate(ext.q_bc, y_ref) + ext.p_bc
    x = quat_rotate(q_ref, y_ref_center) + p_ref
    y_tgt_center = quat_rotate(quat_conj(q_tgt), x - p_tgt)
    y_tgt = quat_rotate(quat_conj(ext.q_bc), y_tgt_center - ext.p_bc)
    T = s2_tangential_basis(z_tgt)  # (3, 2)
    local_tangent = jnp.concatenate([T, z_tgt[:, None]], axis=-1)  # (3, 3)
    u = local_tangent.T @ y_tgt
    r = u[:2] / u[2]
    return sqrt_inv_cov2 @ r


def rotation_prior_residual(q_tgt, q_ref, z_ref, z_tgt, ext: Extrinsics, sqrt_inv_cov2):
    """Rotation-only reprojection (reference rotation_factor.h:23-56)."""
    z_ref_center = quat_rotate(ext.q_bc, z_ref) + ext.p_bc
    z_tgt_center = quat_rotate(quat_conj(q_tgt), quat_rotate(q_ref, z_ref_center))
    z_t = quat_rotate(quat_conj(ext.q_bc), z_tgt_center - ext.p_bc)
    T = s2_tangential_basis(z_tgt)
    local_tangent = jnp.concatenate([T, z_tgt[:, None]], axis=-1)
    u = local_tangent.T @ z_t
    r = u[:2] / u[2]
    return sqrt_inv_cov2 @ r


def preintegration_residual(
    q_i, p_i, v_i, bg_i, ba_i, q_j, p_j, v_j, bg_j, ba_j,
    delta: PreintDelta, sqrt_inv_cov15, bg0, ba0, ext: Extrinsics,
):
    """Whitened 15-residual (reference preintegration_factor.h:19-162).

    Frame poses are body ("center") poses; the IMU pose composes the
    imu-to-body extrinsic. (bg0, ba0) is the bias linearization point of the
    stored delta; first-order correction via the stored bias Jacobians.
    """
    g = GRAVITY.astype(p_i.dtype)
    qi = quat_mul(q_i, ext.q_bi)
    pi = p_i + quat_rotate(q_i, ext.p_bi)
    qj = quat_mul(q_j, ext.q_bi)
    pj = p_j + quat_rotate(q_j, ext.p_bi)

    dt = delta.t
    dbg = bg_i - bg0
    dba = ba_i - ba0

    dq_corr = quat_mul(delta.q, expmap(delta.dq_dbg @ dbg))
    r_q = logmap(quat_mul(quat_conj(dq_corr), quat_mul(quat_conj(qi), qj)))
    r_p = quat_rotate(quat_conj(qi), pj - pi - dt * v_i - 0.5 * dt * dt * g) - (
        delta.p + delta.dp_dbg @ dbg + delta.dp_dba @ dba
    )
    r_v = quat_rotate(quat_conj(qi), v_j - v_i - dt * g) - (
        delta.v + delta.dv_dbg @ dbg + delta.dv_dba @ dba
    )
    r_bg = bg_j - bg_i
    r_ba = ba_j - ba_i
    r = jnp.concatenate([r_q, r_p, r_v, r_bg, r_ba])
    return sqrt_inv_cov15 @ r


def prior_residual(states, prior: PriorFactor):
    """r = S @ dx + infovec (reference ceres/marginalization_factor.h:27-72)."""
    from rd_vio_tpu.estimation.state import FrameStates, local_delta

    lin = FrameStates(
        q=prior.q_lin, p=prior.p_lin, v=prior.v_lin, bg=prior.bg_lin, ba=prior.ba_lin
    )
    dx = local_delta(states, lin).reshape(-1)
    return prior.sqrt_inv_cov @ dx + prior.infovec
