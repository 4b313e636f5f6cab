"""Batched PARSAC and IMU-PARSAC: bucketed, prior-gated robust estimation.

Behavioral reference: /root/reference/src/rdvio_util/include/rdvio/util/parsac.h
(bucketed RANSAC with per-bin confidence priors carried across frames,
coverage x confidence score: parsac.h:73-236) and util/imu_parsac.h (IMU prior
gate at imu_parsac.h:170-198, overlap gating at 109-119, track-length
weighting t = 1 - dynamic_prob^(0.10*binLen) at 233-237). These are the core
RD-VIO dynamic-object rejection machinery.

TPU-first redesign: the 20x20 bin bookkeeping (valid-bin compaction, per-bin
inlier lists) becomes masked segment-sums over a fixed 400-bin axis; the
sequential weighted sampler becomes a single Gumbel categorical whose per-point
logit log(conf[bin]/size[bin]) reproduces "draw bin by confidence, then a
uniform point inside it" as one compound distribution; K hypotheses are
evaluated at once. (The reference's Sampler::draw_by_weight actually indexes
*data* with a *bin* index — parsac.h:118-126; we implement the evidently
intended bin-weighted semantics instead.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rd_vio_tpu.ops import epipolar, pnp
from rd_vio_tpu.ops.ransac import CHI2_1DOF, CHI2_2DOF, sample_indices

N_BINS_X = 20  # reference parsac.h:238 SetBins(20, 20)
N_BINS_Y = 20
N_BINS = N_BINS_X * N_BINS_Y
MIN_PRIOR_BIN_CONFIDENCE = 0.5  # reference parsac.h:70 m_parsacMinPriorBinConfidence


class ParsacResult(NamedTuple):
    model: jnp.ndarray
    inlier_mask: jnp.ndarray  # (N,) bool
    inlier_count: jnp.ndarray
    best_score: jnp.ndarray
    bin_confidences: jnp.ndarray  # (400,) updated posterior, carry to next frame
    prior_ok: jnp.ndarray  # bool; False => IMU gate failed, model is identity


def default_bin_confidences(dtype=jnp.float64):
    """Initial prior: 0.5 everywhere (reference pnp.h:158,199 static init)."""
    return jnp.full((N_BINS,), 0.5, dtype=dtype)


def compute_bins(pts, norm_scale: float):
    """Bucket normalized points into the 20x20 grid (reference parsac.h:256-284).

    Returns (bin_idx (N,), bin_loc (400, 2) bin-center locations)."""
    w = 2.0 * norm_scale / N_BINS_X
    h = 2.0 * norm_scale / N_BINS_Y
    ix = jnp.clip(((pts[..., 0] + norm_scale) / w).astype(jnp.int32), 0, N_BINS_X - 1)
    iy = jnp.clip(((pts[..., 1] + norm_scale) / h).astype(jnp.int32), 0, N_BINS_Y - 1)
    bin_idx = ix + N_BINS_X * iy
    gx = (jnp.arange(N_BINS_X, dtype=pts.dtype) + 0.5) * w - norm_scale
    gy = (jnp.arange(N_BINS_Y, dtype=pts.dtype) + 0.5) * h - norm_scale
    locs = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1).reshape(-1, 2)
    return bin_idx, locs


def _bin_sum(values, bin_idx, valid):
    return jax.ops.segment_sum(
        jnp.where(valid, values, 0.0), bin_idx, num_segments=N_BINS
    )


def _parsac_scores(inl, valid, bin_idx, bin_size, bin_loc, t_weight):
    """Coverage x confidence score per hypothesis (reference parsac.h:196-236).

    inl: (K, N) inlier masks. Returns (scores (K,), bin_conf (K, 400))."""
    dtype = bin_loc.dtype
    inl_f = inl.astype(dtype)
    inl_per_bin = jax.vmap(lambda m: _bin_sum(m, bin_idx, valid))(inl_f)  # (K, 400)
    size_safe = jnp.maximum(bin_size, 1.0)
    conf = t_weight[None, :] * inl_per_bin / size_safe[None, :]
    conf = jnp.where(bin_size[None, :] > 0, conf, 0.0)  # only valid bins
    S = jnp.sum(conf, axis=-1)  # (K,)
    Q = jnp.sum(conf * conf, axis=-1)
    S_safe = jnp.maximum(S, 1e-12)
    mean = (conf @ bin_loc) / S_safe[:, None]  # (K, 2)
    d = bin_loc[None, :, :] - mean[:, None, :]  # (K, 400, 2)
    Cxx = jnp.sum(conf * d[..., 0] * d[..., 0], axis=-1)
    Cxy = jnp.sum(conf * d[..., 0] * d[..., 1], axis=-1)
    Cyy = jnp.sum(conf * d[..., 1] * d[..., 1], axis=-1)
    norm = S / jnp.maximum(S * S - Q, 1e-12)
    img_ratio = norm * jnp.sqrt(jnp.maximum(Cxx * Cyy - Cxy * Cxy, 0.0))
    return img_ratio * S, conf


def _sampling_logits(bin_idx, bin_size, bin_conf_prior):
    """Per-point logits reproducing bin-weighted sampling
    (reference parsac.h:103-126): clamp prior to >=0.5 on valid bins,
    normalize, then P(point) = conf[bin]/size[bin]. Falls back to uniform when
    <=20 valid bins (reference parsac.h:121-125)."""
    valid_bin = bin_size > 0
    conf = jnp.maximum(bin_conf_prior, MIN_PRIOR_BIN_CONFIDENCE)
    conf = jnp.where(valid_bin, conf, 0.0)
    n_valid_bins = jnp.sum(valid_bin)
    point_logit = jnp.log(jnp.maximum(conf[bin_idx], 1e-12)) - jnp.log(
        jnp.maximum(bin_size[bin_idx], 1.0)
    )
    return jnp.where(n_valid_bins > 20, point_logit, jnp.zeros_like(point_logit))


def _run_parsac(
    key,
    solver,
    evaluator,
    sample_size,
    pts_bucket,
    valid,
    threshold,
    bin_conf_prior,
    norm_scale,
    num_hypotheses,
    lens=None,
    dynamic_prob=0.0,
    prior_mask=None,
    identity_model=None,
):
    """Shared PARSAC/IMU-PARSAC core. solver: idx -> models (K, ...);
    evaluator: models -> errors (K, N)."""
    dtype = pts_bucket.dtype
    bin_idx, bin_loc = compute_bins(pts_bucket, norm_scale)
    ones = jnp.ones(valid.shape, dtype)
    bin_size = _bin_sum(ones, bin_idx, valid)

    # track-length weighting (reference imu_parsac.h:233-237, 330-334)
    if lens is not None:
        bin_len = _bin_sum(lens.astype(dtype), bin_idx, valid) / jnp.maximum(bin_size, 1.0)
        t_weight = 1.0 - jnp.power(
            jnp.asarray(dynamic_prob, dtype), 0.10 * bin_len
        )
        t_weight = jnp.where(bin_size > 0, t_weight, 0.0)
    else:
        t_weight = jnp.ones((N_BINS,), dtype)

    logits = _sampling_logits(bin_idx, bin_size, bin_conf_prior)
    idx = sample_indices(key, valid, num_hypotheses, sample_size, logits=logits)
    models = solver(idx)
    errors = evaluator(models)  # (K, N)
    inl = (errors <= threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    scores, _ = _parsac_scores(inl, valid, bin_idx, bin_size, bin_loc, t_weight)

    if prior_mask is not None:
        # candidate must overlap the IMU-prior inliers in >= sample_size points
        # (reference imu_parsac.h:109-119); selection tie-breaks on overlap.
        overlap = jnp.sum(inl & prior_mask[None, :], axis=-1)
        scores = jnp.where(overlap >= sample_size, scores, -jnp.inf)
        rank_count = overlap
    else:
        rank_count = counts

    best = jnp.argmax(scores + 1e-9 * rank_count.astype(scores.dtype))
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    best_mask = inl[best]
    best_count = rank_count[best]
    best_score = scores[best]

    # posterior bin confidences of the winning model (reference parsac.h:164-168)
    _, conf_all = _parsac_scores(
        best_mask[None, :], valid, bin_idx, bin_size, bin_loc, t_weight
    )
    new_bin_conf = conf_all[0]

    prior_ok = jnp.asarray(True)
    if prior_mask is not None:
        # final fallback (reference imu_parsac.h:146-149): too few overlap
        # inliers => identity model + all-inliers
        failed = best_count < sample_size
        best_model = jnp.where(failed, identity_model, best_model)
        best_mask = jnp.where(failed, valid, best_mask)
        new_bin_conf = jnp.where(failed, bin_conf_prior, new_bin_conf)
        prior_ok = ~failed

    return ParsacResult(
        model=best_model,
        inlier_mask=best_mask,
        inlier_count=best_count,
        best_score=best_score,
        bin_confidences=new_bin_conf,
        prior_ok=prior_ok,
    )


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def parsac_essential(
    key, p1, p2, valid, bin_conf_prior, threshold: float,
    norm_scale: float = 1.0, num_hypotheses: int = 256,
):
    """find_essential_matrix_parsac (reference stereo.cpp:124-160): buckets p2,
    symmetric epipolar error, inlier bound 2*t1*threshold^2."""

    def solver(idx):
        return epipolar.solve_essential_8pt(p1[idx], p2[idx])

    def evaluator(E):
        return epipolar.essential_geometric_error(E, p1[None], p2[None]) + \
            epipolar.essential_geometric_error(
                jnp.swapaxes(E, -1, -2), p2[None], p1[None]
            )

    return _run_parsac(
        key, solver, evaluator, 8, p2, valid,
        2.0 * CHI2_1DOF * threshold**2, bin_conf_prior, norm_scale, num_hypotheses,
    )


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def parsac_pnp(
    key, x_world, p_norm, valid, bin_conf_prior, threshold: float,
    norm_scale: float = 1.0, num_hypotheses: int = 256,
):
    """find_pnp_matrix_parsac (reference pnp.h:133-162). Model is (3, 4) [R|t]
    world-to-camera; buckets the 2D observations."""

    def solver(idx):
        R, t = pnp.solve_pnp_dlt(x_world[idx], p_norm[idx])
        return jnp.concatenate([R, t[..., None]], axis=-1)

    def evaluator(models):
        err = pnp.pnp_reprojection_error(
            models[..., :3], models[..., 3], x_world[None], p_norm[None]
        )
        return jnp.where(jnp.isfinite(err), err, 1e18)

    return _run_parsac(
        key, solver, evaluator, 6, p_norm, valid,
        2.0 * CHI2_2DOF * threshold**2, bin_conf_prior, norm_scale, num_hypotheses,
    )


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def imu_parsac_pnp(
    key, x_world, p_norm, valid, lens, prior_R, prior_t, bin_conf_prior,
    threshold: float, dynamic_prob: float, norm_scale: float = 1.0,
    num_hypotheses: int = 256,
):
    """find_pnp_matrix_parsac_imu (reference pnp.h:164-203 + imu_parsac.h):
    the RD-VIO static/dynamic classifier.

    The IMU-predicted pose (prior_R, prior_t) gates everything: its inliers at
    2x the threshold form the prior distribution; if fewer than 15% / 20 points
    agree with the IMU prior the solve degenerates to identity + all-inliers
    (imu_parsac.h:170-198). Candidate models count only via their overlap with
    the prior inliers. The returned inlier_mask is the static/dynamic labeling.
    """
    thr = 2.0 * CHI2_2DOF * threshold**2
    n = valid.shape[0]

    prior_err = pnp.pnp_reprojection_error(prior_R, prior_t, x_world, p_norm)
    prior_err = jnp.where(jnp.isfinite(prior_err), prior_err, 1e18)
    prior_mask = (prior_err <= 2.0 * thr) & valid
    prior_count = jnp.sum(prior_mask)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    prior_gate_ok = (prior_count.astype(jnp.float64) / n_valid >= 0.15) & (
        prior_count >= 20
    )

    identity_model = jnp.concatenate(
        [jnp.eye(3, dtype=x_world.dtype), jnp.zeros((3, 1), dtype=x_world.dtype)],
        axis=-1,
    )

    def solver(idx):
        R, t = pnp.solve_pnp_dlt(x_world[idx], p_norm[idx])
        return jnp.concatenate([R, t[..., None]], axis=-1)

    def evaluator(models):
        err = pnp.pnp_reprojection_error(
            models[..., :3], models[..., 3], x_world[None], p_norm[None]
        )
        return jnp.where(jnp.isfinite(err), err, 1e18)

    res = _run_parsac(
        key, solver, evaluator, 6, p_norm, valid, thr, bin_conf_prior,
        norm_scale, num_hypotheses, lens=lens, dynamic_prob=dynamic_prob,
        prior_mask=prior_mask, identity_model=identity_model,
    )

    # IMU gate failure overrides everything (reference imu_parsac.h:66-69)
    model = jnp.where(prior_gate_ok, res.model, identity_model)
    mask = jnp.where(prior_gate_ok, res.inlier_mask, valid)
    bin_conf = jnp.where(prior_gate_ok, res.bin_confidences, bin_conf_prior)
    return ParsacResult(
        model=model,
        inlier_mask=mask,
        inlier_count=jnp.where(prior_gate_ok, res.inlier_count, jnp.sum(valid)),
        best_score=res.best_score,
        bin_confidences=bin_conf,
        prior_ok=prior_gate_ok & res.prior_ok,
    )


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def parsac_essential_chain(
    key, p1, p2, valid, enable, bin_conf_prior, threshold,
    norm_scale: float = 1.0, num_hypotheses: int = 256,
):
    """K sequential 2D-2D PARSAC checks as ONE device program.

    The reference's update_track_status runs find_essential_matrix_parsac
    once per recent keyframe (sliding_window_tracker.cpp:720-769), each call
    consuming the bin confidences the previous one produced. Dispatching them
    separately costs one device round trip per checked keyframe; this scan
    chains the confidence state on device and returns all masks at once.

    Args:
      p1, p2: (K, N, 2) normalized points per check.
      valid:  (K, N) bool.
      enable: (K,) bool — disabled checks (too few matches) pass their
        bin-confidence carry through unchanged, mirroring the host `continue`.
      threshold: scalar (normalized units), shared by all checks (m_th is
        fixed within a frame).
    Returns:
      masks (K, N) bool, final bin confidences (400,).
    """
    keys = jax.random.split(key, p1.shape[0])

    def step(conf, xs):
        k, q1, q2, v, en = xs
        res = parsac_essential(
            k, q1, q2, v, conf, threshold,
            norm_scale=norm_scale, num_hypotheses=num_hypotheses,
        )
        new_conf = jnp.where(en, res.bin_confidences, conf)
        return new_conf, res.inlier_mask & v

    conf_out, masks = jax.lax.scan(
        step, bin_conf_prior, (keys, p1, p2, valid, enable)
    )
    return masks, conf_out
