"""Batched fixed-iteration RANSAC engines for TPU.

Behavioral reference: /root/reference/src/rdvio_util/include/rdvio/util/ransac.h
(generic adaptive-iteration RANSAC, ransac.h:26-82) and the concrete wrappers in
src/rdvio_geometry/src/stereo.cpp:11-184 and geometry/pnp.h:96-131 (error
functions and chi-square thresholds t1=3.84, t2=5.99).

TPU-first redesign (SURVEY.md §2 L1): instead of a sequential loop with
adaptive early exit, we draw K hypotheses at once with `jax.random`
(Gumbel-top-M sampling without replacement per hypothesis), solve all minimal
problems batched, score all N points x K models in one vectorized pass, and
argmax. K is chosen to upper-bound the reference's effective iteration count
(config ``ransac_hypotheses``). Invalid data slots are masked everywhere, so
fixed-capacity padded arrays work without recompilation.

Sample sizes: essential uses 8 (8-point solver; see ops/epipolar.py for why),
homography 4, rotation 2, PnP 6 — matching the reference's ModelDoF except
essential (5 -> 8).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops import epipolar, homography, pnp, wahba

CHI2_1DOF = 3.84  # reference stereo.cpp:59 (t1)
CHI2_2DOF = 5.99  # reference stereo.cpp:85,113 (t2)


class RansacResult(NamedTuple):
    model: jnp.ndarray  # best model parameters
    inlier_mask: jnp.ndarray  # (N,) bool
    inlier_count: jnp.ndarray  # scalar int
    best_score: jnp.ndarray  # scalar (inlier count or parsac score)


def sample_indices(key, valid, num_hypotheses: int, sample_size: int, logits=None):
    """Draw `num_hypotheses` minimal sample index sets without replacement.

    Gumbel-top-k trick: per hypothesis, add iid Gumbel noise to per-point
    logits (uniform by default) and take the top `sample_size`. Invalid points
    get -inf logits and are never drawn.

    Returns (K, M) int32 indices.
    """
    n = valid.shape[0]
    base = jnp.where(valid, 0.0, -jnp.inf) if logits is None else jnp.where(valid, logits, -jnp.inf)
    g = jax.random.gumbel(key, (num_hypotheses, n), dtype=jnp.float32)
    scores = g + base[None, :].astype(jnp.float32)
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx


def _best_by_count(models, errors, threshold, valid):
    """Pick the model with most masked inliers. errors: (K, N)."""
    inl = (errors <= threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    # tie-break by lower mean inlier error (reference keeps first-found;
    # deterministic argmax is equivalent in distribution)
    best = jnp.argmax(counts)
    model = jax.tree_util.tree_map(lambda m: m[best], models)
    return RansacResult(
        model=model,
        inlier_mask=inl[best],
        inlier_count=counts[best],
        best_score=counts[best].astype(jnp.float64),
    )


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_essential(key, p1, p2, valid, threshold: float, num_hypotheses: int = 256):
    """find_essential_matrix (reference stereo.cpp:38-66): symmetric epipolar
    error with inlier bound 2*t1*threshold^2; threshold in normalized units."""
    idx = sample_indices(key, valid, num_hypotheses, 8)
    E = epipolar.solve_essential_8pt(p1[idx], p2[idx])  # (K, 3, 3)
    err = epipolar.essential_geometric_error(E, p1[None], p2[None]) + \
        epipolar.essential_geometric_error(
            jnp.swapaxes(E, -1, -2), p2[None], p1[None]
        )
    return _best_by_count(E, err, 2.0 * CHI2_1DOF * threshold**2, valid)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_rotation(key, b1, b2, valid, threshold: float, num_hypotheses: int = 256):
    """find_rotation_matrix (reference stereo.cpp:68-92): angular error
    acos((R b1).b2) with bound t2*threshold^2 (threshold in radians)."""
    idx = sample_indices(key, valid, num_hypotheses, 2)
    R = wahba.solve_rotation(b1[idx], b2[idx])  # (K, 3, 3)
    err = wahba.rotation_angular_error(R, b1[None], b2[None])
    return _best_by_count(R, err, CHI2_2DOF * threshold**2, valid)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_homography(key, p1, p2, valid, threshold: float, num_hypotheses: int = 256):
    """find_homography_matrix (reference stereo.cpp:94-117): symmetric transfer
    error with bound 2*t2*threshold^2."""
    idx = sample_indices(key, valid, num_hypotheses, 4)
    H = homography.solve_homography_dlt(p1[idx], p2[idx])  # (K, 3, 3)
    # H^-1 via adjugate (avoids f32-only LU on TPU); scale cancels in the error
    Hinv = _adjugate_3x3(H)
    err = homography.homography_geometric_error(H, p1[None], p2[None]) + \
        homography.homography_geometric_error(Hinv, p2[None], p1[None])
    return _best_by_count(H, err, 2.0 * CHI2_2DOF * threshold**2, valid)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_pnp(key, x_world, p_norm, valid, threshold: float, num_hypotheses: int = 256):
    """find_pnp_matrix (reference pnp.h:96-131): reprojection error on the
    normalized plane with bound 2*t2*threshold^2. Returns model (R|t) as (3,4)."""
    idx = sample_indices(key, valid, num_hypotheses, 6)
    R, t = pnp.solve_pnp_dlt(x_world[idx], p_norm[idx])  # (K,3,3), (K,3)
    err = pnp.pnp_reprojection_error(R, t, x_world[None], p_norm[None])
    err = jnp.where(jnp.isfinite(err), err, 1e18)
    models = jnp.concatenate([R, t[..., None]], axis=-1)
    return _best_by_count(models, err, 2.0 * CHI2_2DOF * threshold**2, valid)


def _adjugate_3x3(M):
    """Adjugate of a 3x3 (batched): inv(M) up to det scale, LU-free."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
