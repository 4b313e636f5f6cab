"""Host (NumPy) twin of ops/parsac — PARSAC / IMU-PARSAC.

Behavioral reference: util/parsac.h:73-236 and util/imu_parsac.h (same
citations as ops/parsac.py, whose math this mirrors 1:1).

Placement rationale (same as ops/frontend_step_np): with parsac ON the judge
+ keyframe-check block runs EVERY frame and its masks gate host control flow
(TT_STATIC tags, the adaptive m_th, the keyframe decision's landmark counts)
— on a tunneled chip that is 1-2 blocking ~30 ms round trips per frame for
~10 ms of arithmetic over <=256 points x <=256 hypotheses. The device
programs in ops/parsac.py remain the direct-attached path
(config.parsac_host_masks=False).

Only the PRNG stream differs from the device path (NumPy Philox vs JAX
threefry); tests assert decision-level equivalence on planted scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from rd_vio_tpu.ops.frontend_step_np import (
    _rng_from_key,
    essential_geometric_error_np,
    solve_essential_8pt_np,
)

N_BINS_X = 20  # reference parsac.h:238 SetBins(20, 20)
N_BINS_Y = 20
N_BINS = N_BINS_X * N_BINS_Y
MIN_PRIOR_BIN_CONFIDENCE = 0.5  # reference parsac.h:70
CHI2_1DOF = 3.84
CHI2_2DOF = 5.99


class ParsacResultNp(NamedTuple):
    model: np.ndarray
    inlier_mask: np.ndarray
    inlier_count: int
    best_score: float
    bin_confidences: np.ndarray
    prior_ok: bool


def default_bin_confidences_np():
    return np.full((N_BINS,), 0.5)


def compute_bins_np(pts, norm_scale: float):
    w = 2.0 * norm_scale / N_BINS_X
    h = 2.0 * norm_scale / N_BINS_Y
    ix = np.clip(((pts[..., 0] + norm_scale) / w).astype(np.int32), 0, N_BINS_X - 1)
    iy = np.clip(((pts[..., 1] + norm_scale) / h).astype(np.int32), 0, N_BINS_Y - 1)
    bin_idx = ix + N_BINS_X * iy
    gx = (np.arange(N_BINS_X, dtype=pts.dtype) + 0.5) * w - norm_scale
    gy = (np.arange(N_BINS_Y, dtype=pts.dtype) + 0.5) * h - norm_scale
    locs = np.stack(np.meshgrid(gx, gy, indexing="xy"), axis=-1).reshape(-1, 2)
    return bin_idx, locs


def _bin_sum_np(values, bin_idx, valid):
    out = np.zeros(N_BINS, dtype=np.float64)
    np.add.at(out, bin_idx, np.where(valid, values, 0.0))
    return out


def _bin_sum_batch_np(values, bin_idx, valid):
    """(K, N) values -> (K, 400) per-bin sums."""
    K = values.shape[0]
    v = np.where(valid[None, :], values, 0.0)
    flat_idx = (np.arange(K)[:, None] * N_BINS + bin_idx[None, :]).ravel()
    out = np.bincount(flat_idx, weights=v.ravel(), minlength=K * N_BINS)
    return out.reshape(K, N_BINS)


def _parsac_scores_np(inl, valid, bin_idx, bin_size, bin_loc, t_weight):
    inl_per_bin = _bin_sum_batch_np(inl.astype(np.float64), bin_idx, valid)
    size_safe = np.maximum(bin_size, 1.0)
    conf = t_weight[None, :] * inl_per_bin / size_safe[None, :]
    conf = np.where(bin_size[None, :] > 0, conf, 0.0)
    S = conf.sum(axis=-1)
    Q = (conf * conf).sum(axis=-1)
    S_safe = np.maximum(S, 1e-12)
    mean = (conf @ bin_loc) / S_safe[:, None]
    d = bin_loc[None, :, :] - mean[:, None, :]
    Cxx = np.sum(conf * d[..., 0] * d[..., 0], axis=-1)
    Cxy = np.sum(conf * d[..., 0] * d[..., 1], axis=-1)
    Cyy = np.sum(conf * d[..., 1] * d[..., 1], axis=-1)
    norm = S / np.maximum(S * S - Q, 1e-12)
    img_ratio = norm * np.sqrt(np.maximum(Cxx * Cyy - Cxy * Cxy, 0.0))
    return img_ratio * S, conf


def _sampling_logits_np(bin_idx, bin_size, bin_conf_prior):
    valid_bin = bin_size > 0
    conf = np.maximum(bin_conf_prior, MIN_PRIOR_BIN_CONFIDENCE)
    conf = np.where(valid_bin, conf, 0.0)
    point_logit = np.log(np.maximum(conf[bin_idx], 1e-12)) - np.log(
        np.maximum(bin_size[bin_idx], 1.0)
    )
    if valid_bin.sum() > 20:
        return point_logit
    return np.zeros_like(point_logit)


def _sample_with_logits_np(rng, valid, num_hypotheses, sample_size, logits):
    n = valid.shape[0]
    base = np.where(valid, logits, -np.inf).astype(np.float32)
    g = rng.gumbel(size=(num_hypotheses, n)).astype(np.float32)
    scores = g + base[None, :]
    idx = np.argpartition(-scores, sample_size - 1, axis=1)[:, :sample_size]
    return idx.astype(np.int32)


def _run_parsac_np(
    rng, solver, evaluator, sample_size, pts_bucket, valid, threshold,
    bin_conf_prior, norm_scale, num_hypotheses,
    lens=None, dynamic_prob=0.0, prior_mask=None, identity_model=None,
    max_iteration=None, confidence: float = 0.999,
):
    """Mirror of ops/parsac._run_parsac, with the reference's ADAPTIVE
    iteration bound (parsac.h:113-164 / imu_parsac.h:72-140): hypotheses are
    evaluated `num_hypotheses` at a time (the chunk — one vectorized
    solver/evaluator pass) and the total stops once it reaches
    N = log(1-confidence)/log(1-ratio^5) for the best model so far, capped
    at `max_iteration` (the reference's default cap is 1000). Benign frames
    finish in one chunk; dynamic-heavy scenes adapt UP toward the cap,
    exactly as the reference does (VERDICT r4 item 7)."""
    from rd_vio_tpu.ops.frontend_step_np import adaptive_iteration_bound

    bin_idx, bin_loc = compute_bins_np(np.asarray(pts_bucket, np.float64), norm_scale)
    bin_size = _bin_sum_np(np.ones(valid.shape), bin_idx, valid)

    if lens is not None:
        bin_len = _bin_sum_np(np.asarray(lens, np.float64), bin_idx, valid) / \
            np.maximum(bin_size, 1.0)
        t_weight = 1.0 - np.power(dynamic_prob, 0.10 * bin_len)
        t_weight = np.where(bin_size > 0, t_weight, 0.0)
    else:
        t_weight = np.ones(N_BINS)

    logits = _sampling_logits_np(bin_idx, bin_size, bin_conf_prior)
    n_valid = max(int(valid.sum()), 1)
    cap = int(max_iteration if max_iteration is not None else num_hypotheses)
    chunk = max(int(num_hypotheses), sample_size)

    best_model = None
    best_mask = np.zeros(valid.shape, bool)
    best_count = 0
    best_score = -np.inf
    best_comb = -np.inf
    done = 0
    bound = cap
    while done < bound:
        k = min(chunk, bound - done)
        idx = _sample_with_logits_np(rng, valid, k, sample_size, logits)
        models = solver(idx)
        errors = evaluator(models)  # (k, N)
        inl = (errors <= threshold) & valid[None, :]
        counts = inl.sum(axis=-1)
        scores, _ = _parsac_scores_np(
            inl, valid, bin_idx, bin_size, bin_loc, t_weight)

        if prior_mask is not None:
            overlap = (inl & prior_mask[None, :]).sum(axis=-1)
            scores = np.where(overlap >= sample_size, scores, -np.inf)
            rank_count = overlap
        else:
            rank_count = counts

        comb = scores + 1e-9 * rank_count
        b = int(np.argmax(comb))
        if best_model is None or comb[b] > best_comb:
            best_comb = float(comb[b])
            best_model = models[b]
            best_mask = inl[b]
            best_count = int(rank_count[b])
            best_score = float(scores[b])
            # the reference adapts on the score-best model's PLAIN inlier
            # ratio (parsac.h:160: inlier_count / size)
            bound = min(bound, adaptive_iteration_bound(
                int(counts[b]) / n_valid, confidence, cap))
        done += k

    _, conf_all = _parsac_scores_np(
        best_mask[None, :], valid, bin_idx, bin_size, bin_loc, t_weight
    )
    new_bin_conf = conf_all[0]

    prior_ok = True
    if prior_mask is not None and best_count < sample_size:
        best_model = identity_model
        best_mask = valid.copy()
        new_bin_conf = np.asarray(bin_conf_prior)
        prior_ok = False

    return ParsacResultNp(
        model=best_model, inlier_mask=best_mask, inlier_count=best_count,
        best_score=best_score, bin_confidences=new_bin_conf, prior_ok=prior_ok,
    )


def parsac_essential_np(
    key_or_rng, p1, p2, valid, bin_conf_prior, threshold,
    norm_scale: float = 1.0, num_hypotheses: int = 256,
    max_iteration=None,
):
    """Mirror of ops/parsac.parsac_essential."""
    rng = key_or_rng if isinstance(key_or_rng, np.random.Generator) \
        else _rng_from_key(key_or_rng)
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    valid = np.asarray(valid, bool)

    def solver(idx):
        return solve_essential_8pt_np(p1[idx], p2[idx])

    def evaluator(E):
        return essential_geometric_error_np(E, p1[None], p2[None]) + \
            essential_geometric_error_np(np.swapaxes(E, -1, -2), p2[None], p1[None])

    return _run_parsac_np(
        rng, solver, evaluator, 8, p2, valid,
        2.0 * CHI2_1DOF * threshold**2, np.asarray(bin_conf_prior),
        norm_scale, num_hypotheses, max_iteration=max_iteration,
    )


def parsac_essential_chain_np(
    key, p1, p2, valid, enable, bin_conf_prior, threshold,
    norm_scale: float = 1.0, num_hypotheses: int = 256,
    max_iteration=None,
):
    """Mirror of ops/parsac.parsac_essential_chain (sequential checks chaining
    bin confidences; disabled checks pass the carry through)."""
    rng = _rng_from_key(key)
    conf = np.asarray(bin_conf_prior).copy()
    masks = np.zeros(valid.shape, bool)
    for k in range(p1.shape[0]):
        if not enable[k]:  # host advantage: skip disabled checks outright
            continue
        res = parsac_essential_np(
            rng, p1[k], p2[k], valid[k], conf, threshold,
            norm_scale=norm_scale, num_hypotheses=num_hypotheses,
            max_iteration=max_iteration,
        )
        masks[k] = res.inlier_mask & valid[k]
        conf = res.bin_confidences
    return masks, conf


def solve_pnp_dlt_np(x_world, p_norm):
    """Mirror of ops/pnp.solve_pnp_dlt (batched DLT P6P)."""
    X, Y, Z = x_world[..., 0], x_world[..., 1], x_world[..., 2]
    u, v = p_norm[..., 0], p_norm[..., 1]
    zero = np.zeros_like(X)
    one = np.ones_like(X)
    r1 = np.stack(
        [X, Y, Z, one, zero, zero, zero, zero, -u * X, -u * Y, -u * Z, -u],
        axis=-1,
    )
    r2 = np.stack(
        [zero, zero, zero, zero, X, Y, Z, one, -v * X, -v * Y, -v * Z, -v],
        axis=-1,
    )
    A = np.concatenate([r1, r2], axis=-2)
    M = np.swapaxes(A, -1, -2) @ A
    _, vecs = np.linalg.eigh(M)
    p = vecs[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    Rraw = P[..., :, :3]
    traw = P[..., :, 3]
    U, S, Vt = np.linalg.svd(Rraw)
    scale = S.mean(axis=-1)
    R = U @ Vt
    detR = np.linalg.det(R)
    R = R * detR[..., None, None]
    t = traw * (detR / np.maximum(scale, 1e-12))[..., None]
    depths = np.einsum("...ij,...nj->...ni", R, x_world)[..., 2] + t[..., None, 2]
    flip = depths.mean(axis=-1) < 0
    R = np.where(flip[..., None, None], -R, R)
    detR = np.linalg.det(R)
    R = R * detR[..., None, None]
    t = np.where(flip[..., None], -t, t) * detR[..., None]
    return R, t


def pnp_reprojection_error_np(R_cw, t_cw, x_world, p_norm):
    if R_cw.ndim == 3 and (
        x_world.ndim == 2 or (x_world.ndim == 3 and x_world.shape[0] == 1)
    ):
        # bank of K models vs ONE shared point set: one (3K, 3) @ (3, N) BLAS
        # GEMM (np.einsum lowers this to the slow c_einsum loop — see
        # frontend_step_np._batched_apply; ~2.3 ms -> ~0.2 ms at K=128,N=256).
        # Genuinely per-model point batches (leading dim > 1) fall through to
        # the einsum branch (ADVICE r3: collapsing them here would silently
        # score every model against model 0's points).
        K = R_cw.shape[0]
        pts = x_world[0] if x_world.ndim == 3 else x_world
        xc = (R_cw.reshape(3 * K, 3) @ pts.T).reshape(K, 3, -1)
        x_cam = xc.transpose(0, 2, 1) + t_cw[..., None, :]
    else:
        x_cam = (
            np.einsum("...ij,...nj->...ni", R_cw, x_world)
            + t_cw[..., None, :]
        )
    z = x_cam[..., 2]
    zs = np.where(np.abs(z[..., None]) < 1e-12, 1e-12, z[..., None])
    pred = x_cam[..., :2] / zs
    err = np.sum((pred - p_norm) ** 2, axis=-1)
    return np.where(z > 1e-6, err, np.inf)


def imu_parsac_pnp_np(
    key, x_world, p_norm, valid, lens, prior_R, prior_t, bin_conf_prior,
    threshold: float, dynamic_prob: float, norm_scale: float = 1.0,
    num_hypotheses: int = 256, max_iteration=None,
):
    """Mirror of ops/parsac.imu_parsac_pnp (the static/dynamic classifier)."""
    rng = _rng_from_key(key)
    x_world = np.asarray(x_world, np.float64)
    p_norm = np.asarray(p_norm, np.float64)
    valid = np.asarray(valid, bool)
    thr = 2.0 * CHI2_2DOF * threshold**2

    prior_err = pnp_reprojection_error_np(prior_R, prior_t, x_world, p_norm)
    prior_err = np.where(np.isfinite(prior_err), prior_err, 1e18)
    prior_mask = (prior_err <= 2.0 * thr) & valid
    prior_count = int(prior_mask.sum())
    n_valid = max(int(valid.sum()), 1)
    prior_gate_ok = (prior_count / n_valid >= 0.15) and (prior_count >= 20)

    identity_model = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=-1)

    def solver(idx):
        R, t = solve_pnp_dlt_np(x_world[idx], p_norm[idx])
        return np.concatenate([R, t[..., None]], axis=-1)

    def evaluator(models):
        err = pnp_reprojection_error_np(
            models[..., :3], models[..., 3], x_world[None], p_norm[None]
        )
        return np.where(np.isfinite(err), err, 1e18)

    res = _run_parsac_np(
        rng, solver, evaluator, 6, p_norm, valid, thr,
        np.asarray(bin_conf_prior), norm_scale, num_hypotheses,
        lens=np.asarray(lens), dynamic_prob=dynamic_prob,
        prior_mask=prior_mask, identity_model=identity_model,
        max_iteration=max_iteration,
    )

    if not prior_gate_ok:
        return ParsacResultNp(
            model=identity_model, inlier_mask=valid.copy(),
            inlier_count=int(valid.sum()), best_score=res.best_score,
            bin_confidences=np.asarray(bin_conf_prior), prior_ok=False,
        )
    return res
