"""Fixed-capacity struct-of-arrays window state and the error-state retraction.

Behavioral reference: /root/reference/src/rdvio_estimation/include/rdvio/
estimation/state.h (PoseState/MotionState/error-state layout ES_Q..ES_BA) and
ceres/quaternion_parameterization.h:10-41 (right-multiply expmap retraction).

The reference's pointer-graph Map/Frame becomes a pytree of [W]-leading arrays;
invalid slots are masked. All algorithm steps are pure functions state->state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rd_vio_tpu.ops.lie import expmap, logmap, quat_conj, quat_mul, quat_normalize

ES_Q, ES_P, ES_V, ES_BG, ES_BA, ES_SIZE = 0, 3, 6, 9, 12, 15


class FrameStates(NamedTuple):
    """Window frame states, [W] leading axis. Pose (q, p) maps body->world."""

    q: jnp.ndarray  # (W, 4) wxyz
    p: jnp.ndarray  # (W, 3)
    v: jnp.ndarray  # (W, 3)
    bg: jnp.ndarray  # (W, 3)
    ba: jnp.ndarray  # (W, 3)


def zero_states(W: int, dtype=jnp.float64) -> FrameStates:
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (W, 1))
    z = jnp.zeros((W, 3), dtype)
    return FrameStates(q=q, p=z, v=z, bg=z, ba=z)


def retract(states: FrameStates, delta: jnp.ndarray) -> FrameStates:
    """states ⊞ delta with delta (W, 15) in (q, p, v, bg, ba) order.

    Quaternion uses the right-multiply expmap manifold
    (reference quaternion_parameterization.h:12-17)."""
    dq = expmap(delta[:, ES_Q : ES_Q + 3])
    return FrameStates(
        q=quat_normalize(quat_mul(states.q, dq)),
        p=states.p + delta[:, ES_P : ES_P + 3],
        v=states.v + delta[:, ES_V : ES_V + 3],
        bg=states.bg + delta[:, ES_BG : ES_BG + 3],
        ba=states.ba + delta[:, ES_BA : ES_BA + 3],
    )


def local_delta(states: FrameStates, lin: FrameStates) -> jnp.ndarray:
    """Per-frame 15-dim deviation of `states` from linearization `lin`
    (reference ceres/marginalization_factor.h:29-45): logmap(q_lin^-1 q) for
    rotation, plain differences elsewhere. Returns (W, 15)."""
    rq = logmap(quat_mul(quat_conj(lin.q), states.q))
    return jnp.concatenate(
        [rq, states.p - lin.p, states.v - lin.v, states.bg - lin.bg, states.ba - lin.ba],
        axis=-1,
    )
