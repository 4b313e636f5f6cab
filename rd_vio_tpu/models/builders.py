"""Host->device assembly: turn Map/Track bookkeeping into fixed-shape jitted
problems (BA solves, marginalization, preintegration, triangulation) and apply
results back.

This is the seam between the branchy host state machine (reference L6 logic)
and the device kernels (rd_vio_tpu.estimation / ops). All arrays are padded to
static capacities so every solve in the steady state hits the same compiled
executable.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from rd_vio_tpu.utils.host import asnp, fetch
import jax
import jax.numpy as jnp

from rd_vio_tpu.estimation import ba, factors as F
from rd_vio_tpu.estimation.state import FrameStates
from rd_vio_tpu.utils import device_time
from rd_vio_tpu.models.map import (
    FT_FIX_MOTION, FT_FIX_POSE, Frame, Map, Track, TT_TRIANGULATED, TT_VALID,
)
from rd_vio_tpu.models.quat_np import q_to_R, qconj, qmul, qrot
from rd_vio_tpu.ops import preintegration as pre
from rd_vio_tpu.ops import triangulate as tri


# steady-state coverage counter: warmup uses this to confirm its shadow run
# actually reached the fully-fused keyframe program (window filled), not just
# the pre-steady localize/refine branch. THREAD-LOCAL (ADVICE r4): the shadow
# pipeline is synchronous on the warmup thread, so its count can never be
# satisfied by a concurrently-running real pipeline's keyframes.
import threading as _threading


class _KfFusedCounter(_threading.local):
    def __init__(self):
        self.n = 0


KF_FUSED_COUNT = _KfFusedCounter()


@dataclasses.dataclass(frozen=True)
class Caps:
    """Static capacities; one value set => one compiled executable per solve."""

    W: int = 20  # frame slots per solve
    L: int = 512  # landmark slots
    O: int = 3072  # reprojection factor slots
    P: int = 512  # fixed-anchor reprojection-prior slots
    Fi: int = 24  # imu factor slots
    Fp: int = 4  # fixed-i imu-prior slots
    R: int = 256  # rotation-prior factor slots
    IMU: int = 96  # imu samples per frame interval
    IMU_KF: int = 512  # imu samples per keyframe chain
    TRI_VIEWS: int = 24  # views per track in batched triangulation
    # pad size of the PER-KEYFRAME in-program triangulation batch. Pending
    # (not-yet-triangulated) tracks per keyframe are ~1-10 in steady state;
    # padding this batch to L (round 1-4 behavior) made the f64 DLT eigh of
    # 256 dummy slots a dominant slice of the fused keyframe program's
    # device time (measured round 5 via the batched runtime's kf flush).
    # Overflow pends to the next keyframe with a loud warning, as before.
    TRI_PAD: int = 64


class CalibTree(NamedTuple):
    """Device-side calibration constants as a jit-passable pytree."""

    ext: F.Extrinsics
    sqrt_inv_cov2: jnp.ndarray
    cov_w: jnp.ndarray
    cov_a: jnp.ndarray
    cov_bg: jnp.ndarray
    cov_ba: jnp.ndarray


@dataclasses.dataclass
class CalibArrays:
    """Config-derived device constants (+ host mirrors of the extrinsics:
    the branchy host code reads them in per-track loops, and fetching a
    device constant costs a full round trip on tunneled TPU deployments)."""

    ext: F.Extrinsics
    sqrt_inv_cov2: jnp.ndarray
    cov_w: jnp.ndarray
    cov_a: jnp.ndarray
    cov_bg: jnp.ndarray
    cov_ba: jnp.ndarray
    K: np.ndarray  # host intrinsics
    q_bc_h: np.ndarray = None  # host extrinsic mirrors
    p_bc_h: np.ndarray = None
    q_bi_h: np.ndarray = None
    p_bi_h: np.ndarray = None
    cov_w_h: np.ndarray = None  # host noise-cov mirrors (host preintegration)
    cov_a_h: np.ndarray = None
    cov_bg_h: np.ndarray = None
    cov_ba_h: np.ndarray = None

    def __post_init__(self):
        if self.q_bc_h is None:
            (self.q_bc_h, self.p_bc_h, self.q_bi_h, self.p_bi_h,
             self.cov_w_h, self.cov_a_h, self.cov_bg_h, self.cov_ba_h) = fetch(
                (self.ext.q_bc, self.ext.p_bc, self.ext.q_bi, self.ext.p_bi,
                 self.cov_w, self.cov_a, self.cov_bg, self.cov_ba)
            )

    @property
    def tree(self) -> CalibTree:
        return CalibTree(
            ext=self.ext, sqrt_inv_cov2=self.sqrt_inv_cov2,
            cov_w=self.cov_w, cov_a=self.cov_a,
            cov_bg=self.cov_bg, cov_ba=self.cov_ba,
        )

    @staticmethod
    def from_config(cfg):
        Km = asnp(cfg.camera_intrinsic)
        # K-scaled pixel whitening (reference handler.cpp:117-119)
        sic2 = np.diag(
            [
                Km[0, 0] / np.sqrt(cfg.keypoint_noise_cov[0, 0]),
                Km[1, 1] / np.sqrt(cfg.keypoint_noise_cov[1, 1]),
            ]
        )
        return CalibArrays(
            ext=F.Extrinsics(
                q_bc=jnp.asarray(cfg.camera_to_body_rotation),
                p_bc=jnp.asarray(cfg.camera_to_body_translation),
                q_bi=jnp.asarray(cfg.imu_to_body_rotation),
                p_bi=jnp.asarray(cfg.imu_to_body_translation),
            ),
            sqrt_inv_cov2=jnp.asarray(sic2),
            cov_w=jnp.asarray(cfg.gyroscope_noise_cov),
            cov_a=jnp.asarray(cfg.accelerometer_noise_cov),
            cov_bg=jnp.asarray(cfg.gyroscope_bias_noise_cov),
            cov_ba=jnp.asarray(cfg.accelerometer_bias_noise_cov),
            K=Km,
        )


# ---------------------------------------------------------------------------
# preintegration
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=())
def _integrate_batch(dts, ws, accs, bg0, ba0, cov_w, cov_a, cov_bg, cov_ba):
    def one(dt, w, a, bg, ba_):
        d = pre.integrate(dt, w, a, bg, ba_, cov_w, cov_a, cov_bg, cov_ba)
        sic = pre.sqrt_inv_cov(d.cov + 1e-14 * jnp.eye(15))
        return d, sic

    return jax.vmap(one)(dts, ws, accs, bg0, ba0)


def pad_imu(frame_imu: Tuple[np.ndarray, np.ndarray, np.ndarray], cap: int):
    dt, w, a = frame_imu
    n = min(len(dt), cap)
    dts = np.zeros(cap)
    ws = np.zeros((cap, 3))
    accs = np.zeros((cap, 3))
    dts[:n] = dt[:n]
    ws[:n] = w[:n]
    accs[:n] = a[:n]
    return dts, ws, accs


def integrate_frames(
    imu_list: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    bg0s: np.ndarray,
    ba0s: np.ndarray,
    calib: CalibArrays,
    cap: int,
):
    """Batched preintegration of len(imu_list) intervals, padded to `cap`."""
    n = len(imu_list)
    dts = np.zeros((n, cap))
    ws = np.zeros((n, cap, 3))
    accs = np.zeros((n, cap, 3))
    for i, imu in enumerate(imu_list):
        dts[i], ws[i], accs[i] = pad_imu(imu, cap)
    delta, sic = _integrate_batch(
        jnp.asarray(dts), jnp.asarray(ws), jnp.asarray(accs),
        jnp.asarray(bg0s), jnp.asarray(ba0s),
        calib.cov_w, calib.cov_a, calib.cov_bg, calib.cov_ba,
    )
    return delta, sic


def predict_frame(frame_prev: Frame, frame: Frame, calib: CalibArrays, cap: int):
    """Preintegrate frame's interval at prev biases and propagate the state
    (reference mirror_frame tail / judge_track_status head). Mean-only math,
    fully host-side: covariance/bias Jacobians are only needed by BA factors
    (integrated by the native host preintegrator during assembly)."""
    from rd_vio_tpu.ops import preintegration_np as pre_np

    frame.q, frame.p, frame.v = pre_np.predict_frame_mean(
        frame_prev.q, frame_prev.p, frame_prev.v, frame_prev.bg, frame_prev.ba,
        frame.imu_dt, frame.imu_w, frame.imu_a,
    )
    frame.bg = frame_prev.bg.copy()
    frame.ba = frame_prev.ba.copy()


def propagate_chain(frames: List[Frame], start: Frame, calib: CalibArrays, cap: int):
    """Re-propagate `frames` (in order) from `start`'s state — pure host math
    (reference feature_tracker.cpp:36-69 re-anchoring loop). Mean-only, so no
    device work at all; the chain is short (a few frames x ~10 samples)."""
    from rd_vio_tpu.ops import preintegration_np as pre_np

    prev = start
    for f in frames:
        f.q, f.p, f.v = pre_np.predict_frame_mean(
            prev.q, prev.p, prev.v, prev.bg, prev.ba,
            f.imu_dt, f.imu_w, f.imu_a,
        )
        f.bg, f.ba = prev.bg.copy(), prev.ba.copy()
        prev = f


# ---------------------------------------------------------------------------
# BA problem assembly
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReprojArrays:
    """Pre-vectorized reprojection factors (the SoA fast lane of the window
    and marginalization specs — VERDICT r4 item 3): same content as the
    `reproj` tuple list, already gathered into flat arrays by the model
    layer so _assemble skips its per-factor Python loop."""

    tgt: np.ndarray  # (n,) int32 target slot
    ref: np.ndarray  # (n,) int32 anchor slot
    lm: np.ndarray  # (n,) int32 landmark slot
    zr: np.ndarray  # (n, 3) anchor bearing
    zt: np.ndarray  # (n, 3) target bearing


@dataclasses.dataclass
class BASpec:
    """Declarative solve description filled by the model layer."""

    frames: List[Frame]  # slot order; slot 0..len-1
    fix_pose: List[bool]
    fix_motion: List[bool]
    opt_tracks: List[Track]  # landmark slots (inverse depth optimized)
    # (tgt_frame, anchor_frame, track, fixed_depth) — fixed_depth=True for
    # "prior" flavor factors with the anchor included as a fixed frame slot
    reproj: List[Tuple[Frame, Frame, Track, bool]]
    # (frame_i, frame_j, (dt,w,a), bg0, ba0, use_kf_cap)
    imu: List[Tuple[Frame, Frame, tuple, np.ndarray, np.ndarray, bool]]
    # (tgt_frame, anchor_frame, track)
    rot: List[Tuple[Frame, Frame, Track]]
    prior: Optional[F.PriorFactor] = None  # over slots 0.. of `frames`
    # fixed-anchor reprojection priors: (tgt_frame, anchor_frame, track) —
    # anchor pose + inverse depth baked in as constants (no frame slot needed)
    reproj_prior: List[Tuple[Frame, Frame, Track]] = dataclasses.field(default_factory=list)
    # fixed-i preintegration priors: (frame_i, frame_j, (dt,w,a))
    imu_prior: List[Tuple[Frame, Frame, tuple]] = dataclasses.field(default_factory=list)
    # SoA fast lanes: when set, _assemble consumes these INSTEAD of the
    # `reproj` list / per-track opt_tracks loop (opt_invd aligns with
    # opt_tracks; landmark slot i == opt_tracks[i] for i < caps.L)
    reproj_arrays: Optional[ReprojArrays] = None
    opt_invd: Optional[np.ndarray] = None


def _anchor_row_maps(st, frames: List[Frame], kf_fids) -> tuple:
    """Per-store-row anchor lookup built once per window: for every track
    row anchored at a window KEYFRAME, its anchor's window slot and anchor
    bearing. The SoA replacement for per-factor `track.obs[anchor.id]`
    dict lookups (VERDICT r4 item 3)."""
    kfset = {int(x) for x in np.asarray(kf_fids).ravel()}
    a_slot = np.full(st.cap, -1, np.int64)
    a_bear = np.zeros((st.cap, 3))
    for ws, f in enumerate(frames):
        if f.id not in kfset:
            continue
        rows = st.rows_of(f.track_ids)
        msk = (rows >= 0) & (st.first_fid[np.clip(rows, 0, None)] == f.id)
        rr = rows[msk]
        a_slot[rr] = ws
        a_bear[rr] = f.bearings[np.flatnonzero(msk)]
    return a_slot, a_bear


def window_reproj_arrays(st, frames: List[Frame], kf_fids, bits, pend_row,
                         opt_rows, L: int) -> ReprojArrays:
    """Window VI-BA reprojection factors as flat arrays (reference
    refine_window :226-337 factor selection), frame-major with keypoint-index
    inner order — identical factor order to the former per-tuple loop."""
    a_slot, a_bear = _anchor_row_maps(st, frames, kf_fids)
    lm_of_row = np.full(st.cap, -1, np.int64)
    n_lm = min(len(opt_rows), L)
    lm_of_row[opt_rows[:n_lm]] = np.arange(n_lm)
    tgt_p, ref_p, lm_p, zr_p, zt_p = [], [], [], [], []
    for ws, f in enumerate(frames):
        rows = st.rows_of(f.track_ids)
        r = np.clip(rows, 0, None)
        fsel = (rows >= 0) & (
            ((st.flags[r] & bits) == bits) | pend_row[r]
        )
        ff = st.first_fid[r]
        fsel &= (ff != f.id) & np.isin(ff, kf_fids)
        fsel &= (lm_of_row[r] >= 0) & (a_slot[r] >= 0)
        idxs = np.flatnonzero(fsel)
        if len(idxs) == 0:
            continue
        rr = r[idxs]
        tgt_p.append(np.full(len(idxs), ws, np.int64))
        ref_p.append(a_slot[rr])
        lm_p.append(lm_of_row[rr])
        zr_p.append(a_bear[rr])
        zt_p.append(f.bearings[idxs])
    if not tgt_p:
        z = np.zeros(0, np.int32)
        return ReprojArrays(tgt=z, ref=z, lm=z,
                            zr=np.zeros((0, 3)), zt=np.zeros((0, 3)))
    return ReprojArrays(
        tgt=np.concatenate(tgt_p).astype(np.int32),
        ref=np.concatenate(ref_p).astype(np.int32),
        lm=np.concatenate(lm_p).astype(np.int32),
        zr=np.concatenate(zr_p), zt=np.concatenate(zt_p),
    )


def marg_reproj_arrays(st, frames: List[Frame], kf_fids, track_rows,
                       L: int) -> ReprojArrays:
    """Marginalization-problem reprojection factors as flat arrays
    (reference ceres/marginalization_factor.h:237-283 selection): every
    window-frame observation of the given victim-anchored tracks except the
    anchor's own. Frame-major order (the former loop was track-major);
    marginalization consumes sums, so factor order is immaterial."""
    a_slot, a_bear = _anchor_row_maps(st, frames, kf_fids)
    lm_of_row = np.full(st.cap, -1, np.int64)
    n_lm = min(len(track_rows), L)
    lm_of_row[track_rows[:n_lm]] = np.arange(n_lm)
    tgt_p, ref_p, lm_p, zr_p, zt_p = [], [], [], [], []
    for ws, f in enumerate(frames):
        rows = st.rows_of(f.track_ids)
        r = np.clip(rows, 0, None)
        fsel = (rows >= 0) & (lm_of_row[r] >= 0) & (a_slot[r] >= 0)
        fsel &= st.first_fid[r] != f.id  # anchor's own observation excluded
        idxs = np.flatnonzero(fsel)
        if len(idxs) == 0:
            continue
        rr = r[idxs]
        tgt_p.append(np.full(len(idxs), ws, np.int64))
        ref_p.append(a_slot[rr])
        lm_p.append(lm_of_row[rr])
        zr_p.append(a_bear[rr])
        zt_p.append(f.bearings[idxs])
    if not tgt_p:
        z = np.zeros(0, np.int32)
        return ReprojArrays(tgt=z, ref=z, lm=z,
                            zr=np.zeros((0, 3)), zt=np.zeros((0, 3)))
    return ReprojArrays(
        tgt=np.concatenate(tgt_p).astype(np.int32),
        ref=np.concatenate(ref_p).astype(np.int32),
        lm=np.concatenate(lm_p).astype(np.int32),
        zr=np.concatenate(zr_p), zt=np.concatenate(zt_p),
    )


def _frame_states(frames: List[Frame], W: int) -> FrameStates:
    q = np.tile([1.0, 0, 0, 0], (W, 1))
    p = np.zeros((W, 3))
    v = np.zeros((W, 3))
    bg = np.zeros((W, 3))
    ba_ = np.zeros((W, 3))
    for i, f in enumerate(frames):
        q[i], p[i], v[i], bg[i], ba_[i] = f.q, f.p, f.v, f.bg, f.ba
    return FrameStates(
        q=jnp.asarray(q), p=jnp.asarray(p), v=jnp.asarray(v),
        bg=jnp.asarray(bg), ba=jnp.asarray(ba_),
    )


def _cast_floats(tree, dtype):
    def cast(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a
    return jax.tree_util.tree_map(cast, tree)


class ProblemArrays(NamedTuple):
    """Host-assembled (NumPy) fixed-shape problem data: everything a solve
    needs except preintegration results (integrated on-device in
    `_finalize_problem`) and the marginalization prior (already device-
    resident). One pytree => ONE host->device transfer per solve instead of a
    device_put per field — on tunneled TPU deployments each transfer is a
    ~30 ms round trip, so this is the difference between ~1 and ~15 fps."""

    # window states (W, ...)
    q: np.ndarray
    p: np.ndarray
    v: np.ndarray
    bg: np.ndarray
    ba: np.ndarray
    opt_pose: np.ndarray
    opt_motion: np.ndarray
    # landmarks (L,)
    invd: np.ndarray
    opt_lm: np.ndarray
    # reprojection factors (O, ...)
    o_tgt: np.ndarray
    o_ref: np.ndarray
    o_lm: np.ndarray
    o_zr: np.ndarray
    o_zt: np.ndarray
    o_val: np.ndarray
    # imu factors (Fi, ...), preintegrated on host (native/preintegrator.cpp)
    fi_i: np.ndarray
    fi_j: np.ndarray
    fi_val: np.ndarray
    fi_bg0: np.ndarray
    fi_ba0: np.ndarray
    fi_delta: dict  # PreintDelta fields + "sqrt_inv_cov", leading (Fi, ...)
    # fixed-anchor reprojection priors (P, ...)
    pp_tgt: np.ndarray
    pp_qref: np.ndarray
    pp_pref: np.ndarray
    pp_invd: np.ndarray
    pp_zr: np.ndarray
    pp_zt: np.ndarray
    pp_val: np.ndarray
    # fixed-i imu priors (Fp, ...), preintegrated on host
    ip_j: np.ndarray
    ip_qi: np.ndarray
    ip_pi: np.ndarray
    ip_vi: np.ndarray
    ip_bgi: np.ndarray
    ip_bai: np.ndarray
    ip_val: np.ndarray
    ip_delta: dict  # PreintDelta fields + "sqrt_inv_cov", leading (Fp, ...)
    # rotation priors (R, ...)
    r_tgt: np.ndarray
    r_qref: np.ndarray
    r_zr: np.ndarray
    r_zt: np.ndarray
    r_val: np.ndarray


def _assemble(spec: BASpec, caps: Caps, calib: CalibArrays):
    """Host-side (pure NumPy + native preintegrator) assembly of a BASpec into
    fixed-shape arrays.

    Returns (ProblemArrays, lm_slot_by_track_id). No device work happens here;
    `_finalize_problem` (jitted by the callers) turns the arrays into a
    BAProblem on-device. IMU intervals are preintegrated HERE, on host f64
    (native/preintegrator.cpp): the handful of short sequential integrations
    cost ~1 ms natively vs ~60 ms as f64-emulated XLA ops on TPU."""
    W, L, O, Fi, R = caps.W, caps.L, caps.O, caps.Fi, caps.R
    if len(spec.frames) > W:
        # defensive: drop trailing (fixed-anchor) frames; factors referencing
        # them are skipped below via the slot lookup
        spec = dataclasses.replace(
            spec, frames=spec.frames[:W], fix_pose=spec.fix_pose[:W],
            fix_motion=spec.fix_motion[:W],
        )
    n = len(spec.frames)
    slot = {f.id: i for i, f in enumerate(spec.frames)}

    q = np.tile([1.0, 0, 0, 0], (W, 1))
    p = np.zeros((W, 3))
    v = np.zeros((W, 3))
    bg = np.zeros((W, 3))
    ba_ = np.zeros((W, 3))
    for i, f in enumerate(spec.frames):
        q[i], p[i], v[i], bg[i], ba_[i] = f.q, f.p, f.v, f.bg, f.ba

    opt_pose = np.zeros(W, bool)
    opt_motion = np.zeros(W, bool)
    for i, f in enumerate(spec.frames):
        opt_pose[i] = not spec.fix_pose[i]
        opt_motion[i] = not spec.fix_motion[i]

    lm_slot: Dict[int, int] = {}
    invd = np.ones(L)
    opt_lm = np.zeros(L, bool)
    if spec.opt_invd is not None:
        nl = len(spec.opt_tracks)
        if nl > L:
            logging.getLogger(__name__).warning(
                "solve assembly: landmark budget exhausted (L=%d); "
                "%d overflow landmarks dropped (raise Caps.L)", L, nl - L,
            )
            nl = L
        invd[:nl] = np.maximum(spec.opt_invd[:nl], 1e-6)
        opt_lm[:nl] = True
        lm_slot = {t.id: s for s, t in enumerate(spec.opt_tracks[:nl])}
    else:
        for t in spec.opt_tracks:
            if t.id in lm_slot or len(lm_slot) >= L:
                continue
            s = len(lm_slot)
            lm_slot[t.id] = s
            invd[s] = max(t.inv_depth, 1e-6)
            opt_lm[s] = True

    # reprojection factors
    o_tgt = np.zeros(O, np.int32)
    o_ref = np.zeros(O, np.int32)
    o_lm = np.zeros(O, np.int32)
    o_zr = np.tile([0.0, 0, 1.0], (O, 1))
    o_zt = np.tile([0.0, 0, 1.0], (O, 1))
    o_val = np.zeros(O, bool)
    oi = 0
    if spec.reproj_arrays is not None:
        ra = spec.reproj_arrays
        oi = len(ra.tgt)
        if oi > O:
            logging.getLogger(__name__).warning(
                "solve assembly: observation budget exhausted (O=%d); "
                "remaining reprojection factors dropped (raise Caps.O)", O,
            )
            oi = O
        o_tgt[:oi] = ra.tgt[:oi]
        o_ref[:oi] = ra.ref[:oi]
        o_lm[:oi] = ra.lm[:oi]
        o_zr[:oi] = ra.zr[:oi]
        o_zt[:oi] = ra.zt[:oi]
        o_val[:oi] = True
    for tgt, anchor, track, fixed_depth in spec.reproj:
        if oi >= O:
            logging.getLogger(__name__).warning(
                "solve assembly: observation budget exhausted (O=%d); "
                "remaining reprojection factors dropped (raise Caps.O)", O,
            )
            break
        if tgt.id not in slot or anchor.id not in slot:
            continue
        ls = lm_slot.get(track.id)
        if ls is None:
            if not fixed_depth or len(lm_slot) >= L:
                if not fixed_depth:
                    continue
                logging.getLogger(__name__).warning(
                    "solve assembly: landmark budget exhausted (L=%d); "
                    "remaining factors dropped (raise Caps.L)", L,
                )
                break
            ls = len(lm_slot)
            lm_slot[track.id] = ls
            invd[ls] = max(track.inv_depth, 1e-6)
            opt_lm[ls] = False  # fixed-depth prior flavor
        kt = track.obs.get(tgt.id)
        ka = track.obs.get(anchor.id)
        if kt is None or ka is None:
            continue
        o_tgt[oi] = slot[tgt.id]
        o_ref[oi] = slot[anchor.id]
        o_lm[oi] = ls
        o_zr[oi] = anchor.bearings[ka]
        o_zt[oi] = tgt.bearings[kt]
        o_val[oi] = True
        oi += 1

    # imu factors: preintegrate on host (f64 native), kf-cap chains padded at
    # the keyframe-chain cap
    from rd_vio_tpu.ops import preintegration_np as pre_np

    fi_i = np.zeros(Fi, np.int32)
    fi_j = np.zeros(Fi, np.int32)
    fi_val = np.zeros(Fi, bool)
    imu_entries = [e for e in spec.imu if e[0].id in slot and e[1].id in slot][:Fi]
    cap = caps.IMU_KF if any(e[5] for e in imu_entries) else caps.IMU
    fi_dts = np.zeros((Fi, cap))
    fi_ws = np.zeros((Fi, cap, 3))
    fi_accs = np.zeros((Fi, cap, 3))
    bg0 = np.zeros((Fi, 3))
    ba0 = np.zeros((Fi, 3))
    for k, e in enumerate(imu_entries):
        fi_i[k] = slot[e[0].id]
        fi_j[k] = slot[e[1].id]
        fi_val[k] = True
        bg0[k] = e[3]
        ba0[k] = e[4]
        fi_dts[k], fi_ws[k], fi_accs[k] = pad_imu(e[2], cap)
    fi_delta = pre_np.integrate_full_batch(
        fi_dts, fi_ws, fi_accs, bg0, ba0,
        calib.cov_w_h, calib.cov_a_h, calib.cov_bg_h, calib.cov_ba_h,
    )

    # fixed-anchor reprojection priors
    Pcap = caps.P
    pp_tgt = np.zeros(Pcap, np.int32)
    pp_qref = np.tile([1.0, 0, 0, 0], (Pcap, 1))
    pp_pref = np.zeros((Pcap, 3))
    pp_invd = np.ones(Pcap)
    pp_zr = np.tile([0.0, 0, 1.0], (Pcap, 1))
    pp_zt = np.tile([0.0, 0, 1.0], (Pcap, 1))
    pp_val = np.zeros(Pcap, bool)
    pi_ = 0
    for tgt, anchor, track in spec.reproj_prior:
        if pi_ >= Pcap:
            logging.getLogger(__name__).warning(
                "solve assembly: reprojection-prior budget exhausted "
                "(P=%d); remaining prior factors dropped (raise Caps.P)",
                Pcap,
            )
            break
        if tgt.id not in slot:
            continue
        kt = track.obs.get(tgt.id)
        ka = track.obs.get(anchor.id)
        if kt is None or ka is None or track.inv_depth <= 0:
            continue
        pp_tgt[pi_] = slot[tgt.id]
        pp_qref[pi_] = anchor.q
        pp_pref[pi_] = anchor.p
        pp_invd[pi_] = track.inv_depth
        pp_zr[pi_] = anchor.bearings[ka]
        pp_zt[pi_] = tgt.bearings[kt]
        pp_val[pi_] = True
        pi_ += 1

    # fixed-i imu priors (host-preintegrated)
    Fp = caps.Fp
    ip_j = np.zeros(Fp, np.int32)
    ip_qi = np.tile([1.0, 0, 0, 0], (Fp, 1))
    ip_pi = np.zeros((Fp, 3))
    ip_vi = np.zeros((Fp, 3))
    ip_bgi = np.zeros((Fp, 3))
    ip_bai = np.zeros((Fp, 3))
    ip_val = np.zeros(Fp, bool)
    ip_dts = np.zeros((Fp, caps.IMU))
    ip_ws = np.zeros((Fp, caps.IMU, 3))
    ip_accs = np.zeros((Fp, caps.IMU, 3))
    ip_entries = [e for e in spec.imu_prior if e[1].id in slot][:Fp]
    for k, (fi_frame, fj_frame, imu_data) in enumerate(ip_entries):
        ip_j[k] = slot[fj_frame.id]
        ip_qi[k] = fi_frame.q
        ip_pi[k] = fi_frame.p
        ip_vi[k] = fi_frame.v
        ip_bgi[k] = fi_frame.bg
        ip_bai[k] = fi_frame.ba
        ip_val[k] = True
        ip_dts[k], ip_ws[k], ip_accs[k] = pad_imu(imu_data, caps.IMU)
    ip_delta = pre_np.integrate_full_batch(
        ip_dts, ip_ws, ip_accs, ip_bgi, ip_bai,
        calib.cov_w_h, calib.cov_a_h, calib.cov_bg_h, calib.cov_ba_h,
    )

    # rotation priors
    r_tgt = np.zeros(R, np.int32)
    r_qref = np.tile([1.0, 0, 0, 0], (R, 1))
    r_zr = np.tile([0.0, 0, 1.0], (R, 1))
    r_zt = np.tile([0.0, 0, 1.0], (R, 1))
    r_val = np.zeros(R, bool)
    ri = 0
    for tgt, anchor, track in spec.rot:
        if ri >= R or tgt.id not in slot:
            continue
        kt = track.obs.get(tgt.id)
        ka = track.obs.get(anchor.id)
        if kt is None or ka is None:
            continue
        r_tgt[ri] = slot[tgt.id]
        r_qref[ri] = anchor.q
        r_zr[ri] = anchor.bearings[ka]
        r_zt[ri] = tgt.bearings[kt]
        r_val[ri] = True
        ri += 1

    pa = ProblemArrays(
        q=q, p=p, v=v, bg=bg, ba=ba_,
        opt_pose=opt_pose, opt_motion=opt_motion,
        invd=invd, opt_lm=opt_lm,
        o_tgt=o_tgt, o_ref=o_ref, o_lm=o_lm, o_zr=o_zr, o_zt=o_zt, o_val=o_val,
        fi_i=fi_i, fi_j=fi_j, fi_val=fi_val, fi_bg0=bg0, fi_ba0=ba0,
        fi_delta=fi_delta,
        pp_tgt=pp_tgt, pp_qref=pp_qref, pp_pref=pp_pref, pp_invd=pp_invd,
        pp_zr=pp_zr, pp_zt=pp_zt, pp_val=pp_val,
        ip_j=ip_j, ip_qi=ip_qi, ip_pi=ip_pi, ip_vi=ip_vi, ip_bgi=ip_bgi,
        ip_bai=ip_bai, ip_val=ip_val, ip_delta=ip_delta,
        r_tgt=r_tgt, r_qref=r_qref, r_zr=r_zr, r_zt=r_zt, r_val=r_val,
    )
    return pa, lm_slot


def _finalize_problem(pa: ProblemArrays, calib: CalibTree, prior, prior_valid):
    """Pure-jnp: ProblemArrays -> (states, inv_depth, BAProblem). Pure data
    plumbing — preintegration already happened on host (f64 native) during
    assembly; everything here is casts + NamedTuple packing.

    The solve dtype is pa's float dtype (cast host-side by the callers)."""
    dtype = jnp.asarray(pa.q).dtype
    f64 = jnp.float64

    def unpack_delta(d):
        delta = pre.PreintDelta(
            t=jnp.asarray(d["t"]), q=jnp.asarray(d["q"]), p=jnp.asarray(d["p"]),
            v=jnp.asarray(d["v"]), cov=jnp.asarray(d["cov"]),
            dq_dbg=jnp.asarray(d["dq_dbg"]), dp_dbg=jnp.asarray(d["dp_dbg"]),
            dp_dba=jnp.asarray(d["dp_dba"]), dv_dbg=jnp.asarray(d["dv_dbg"]),
            dv_dba=jnp.asarray(d["dv_dba"]),
        )
        return delta, jnp.asarray(d["sqrt_inv_cov"])

    deltas, sics = unpack_delta(pa.fi_delta)
    sics = jnp.where(jnp.asarray(pa.fi_val)[:, None, None], sics, jnp.eye(15)[None])
    ip_deltas, ip_sics = unpack_delta(pa.ip_delta)
    ip_sics = jnp.where(
        jnp.asarray(pa.ip_val)[:, None, None], ip_sics, jnp.eye(15)[None]
    )
    if dtype != f64:
        deltas = _cast_floats(deltas, dtype)
        sics = sics.astype(dtype)
        ip_deltas = _cast_floats(ip_deltas, dtype)
        ip_sics = ip_sics.astype(dtype)

    states = FrameStates(
        q=jnp.asarray(pa.q), p=jnp.asarray(pa.p), v=jnp.asarray(pa.v),
        bg=jnp.asarray(pa.bg), ba=jnp.asarray(pa.ba),
    )
    reproj = F.ReprojFactors(
        tgt=jnp.asarray(pa.o_tgt), ref=jnp.asarray(pa.o_ref),
        lm=jnp.asarray(pa.o_lm), z_ref=jnp.asarray(pa.o_zr),
        z_tgt=jnp.asarray(pa.o_zt), valid=jnp.asarray(pa.o_val),
    )
    imu = F.ImuFactors(
        i=jnp.asarray(pa.fi_i), j=jnp.asarray(pa.fi_j), delta=deltas,
        sqrt_inv_cov=sics, bg0=jnp.asarray(pa.fi_bg0).astype(dtype),
        ba0=jnp.asarray(pa.fi_ba0).astype(dtype), valid=jnp.asarray(pa.fi_val),
    )
    reproj_prior = F.ReprojPriorFactors(
        tgt=jnp.asarray(pa.pp_tgt), q_ref=jnp.asarray(pa.pp_qref),
        p_ref=jnp.asarray(pa.pp_pref), inv_depth=jnp.asarray(pa.pp_invd),
        z_ref=jnp.asarray(pa.pp_zr), z_tgt=jnp.asarray(pa.pp_zt),
        valid=jnp.asarray(pa.pp_val),
    )
    imu_prior = F.ImuPriorFactors(
        j=jnp.asarray(pa.ip_j), q_i=jnp.asarray(pa.ip_qi),
        p_i=jnp.asarray(pa.ip_pi), v_i=jnp.asarray(pa.ip_vi),
        bg_i=jnp.asarray(pa.ip_bgi), ba_i=jnp.asarray(pa.ip_bai),
        delta=ip_deltas, sqrt_inv_cov=ip_sics, valid=jnp.asarray(pa.ip_val),
    )
    rot = F.RotFactors(
        tgt=jnp.asarray(pa.r_tgt), q_ref=jnp.asarray(pa.r_qref),
        z_ref=jnp.asarray(pa.r_zr), z_tgt=jnp.asarray(pa.r_zt),
        valid=jnp.asarray(pa.r_val),
    )
    if prior is None:
        W = pa.q.shape[0]
        prior = F.initial_prior(W, states, gauge=0.0, dtype=dtype)
        prior_valid = jnp.asarray(False)
    ext = calib.ext
    sic2 = calib.sqrt_inv_cov2
    if dtype != f64:
        prior = _cast_floats(prior, dtype)
        ext = _cast_floats(ext, dtype)
        sic2 = sic2.astype(dtype)
    pb = ba.BAProblem(
        reproj=reproj, reproj_prior=reproj_prior, imu=imu, imu_prior=imu_prior,
        rot=rot, prior=prior, prior_valid=jnp.asarray(prior_valid),
        ext=ext, sqrt_inv_cov2=sic2,
        opt_pose=jnp.asarray(pa.opt_pose), opt_motion=jnp.asarray(pa.opt_motion),
        opt_lm=jnp.asarray(pa.opt_lm),
    )
    return states, jnp.asarray(pa.invd), pb


def _cast_pa(pa: ProblemArrays, dtype):
    """Cast ProblemArrays floats host-side (cheap NumPy) so the jitted
    finalize/solve programs key on the solve dtype."""
    if dtype is None or jnp.dtype(dtype) == jnp.float64:
        return pa
    npdt = np.dtype(dtype)
    return jax.tree_util.tree_map(
        lambda a: a.astype(npdt) if np.issubdtype(a.dtype, np.floating) else a, pa
    )


def build_problem(spec: BASpec, calib: CalibArrays, caps: Caps, dtype=None):
    """Returns (states, inv_depth, BAProblem, lm_slot_by_track_id).

    dtype: optional float dtype for the solve (e.g. jnp.float32 for the
    prior-free per-frame solves — TPU-native f32 linalg is much faster than
    emulated f64; the marginalization-prior solves stay f64 for conditioning,
    see SURVEY.md §7)."""
    pa, lm_slot = _assemble(spec, caps, calib)
    pa = _cast_pa(pa, dtype)
    prior = spec.prior
    states, invd, pb = _finalize_jit(
        pa, calib.tree, prior, prior is not None
    )
    return states, invd, pb, lm_slot


@functools.partial(jax.jit, static_argnames=())
def _finalize_nop(pa, calib, prior, prior_valid):
    return _finalize_problem(pa, calib, prior, prior_valid)


def _finalize_jit(pa, calib, prior, prior_valid):
    # two jit entries keyed on prior presence (None is not a pytree leaf type
    # we want traced); both return device-resident (states, invd, pb)
    if prior is None:
        return _finalize_noprior_jit(pa, calib)
    return _finalize_nop(pa, calib, prior, prior_valid)


@functools.partial(jax.jit, static_argnames=())
def _finalize_noprior_jit(pa, calib):
    return _finalize_problem(pa, calib, None, False)


# ---------------------------------------------------------------------------
# fused single-dispatch solves (the per-frame hot path)
# ---------------------------------------------------------------------------


@jax.jit
def _solve_noprior_jit(pa, calib, max_iterations):
    states, invd, pb = _finalize_problem(pa, calib, None, False)
    return ba.solve_ba(states, invd, pb, max_iterations=max_iterations)


@jax.jit
def _solve_prior_jit(pa, calib, prior, max_iterations):
    states, invd, pb = _finalize_problem(pa, calib, prior, True)
    return ba.solve_ba(states, invd, pb, max_iterations=max_iterations)


def solve_spec(spec: BASpec, calib: CalibArrays, caps: Caps, dtype=None,
               max_iterations: int = 10) -> ba.BAResult:
    """Assemble + integrate + solve in ONE device dispatch. Returns the
    device-resident BAResult (callers fetch + apply via apply_result)."""
    pa, lm_slot = _assemble(spec, caps, calib)
    pa = _cast_pa(pa, dtype)
    if spec.prior is None:
        res = _solve_noprior_jit(pa, calib.tree, max_iterations=max_iterations)
    else:
        res = _solve_prior_jit(
            pa, calib.tree, spec.prior, max_iterations=max_iterations
        )
    return res, lm_slot


def _override_prev_states(s, prev: FrameStates, prev_map):
    """Seed initial frame states from a device-resident previous solve:
    slot i takes prev[prev_map[i]] when prev_map[i] >= 0, else keeps the
    host-assembled value. Pure gather/where — shapes are static."""
    use = prev_map >= 0
    idx = jnp.clip(prev_map, 0)
    dt = s.q.dtype

    def pick(a_prev, a_host):
        sel = use.reshape((-1,) + (1,) * (a_host.ndim - 1))
        return jnp.where(sel, a_prev[idx].astype(dt), a_host)

    return FrameStates(
        q=pick(prev.q, s.q), p=pick(prev.p, s.p), v=pick(prev.v, s.v),
        bg=pick(prev.bg, s.bg), ba=pick(prev.ba, s.ba),
    )


def _chain_localize_head(pa_loc, prev, loc_ip_prev, calib):
    """Localize-problem head with DEVICE-RESIDENT chaining: override the
    preintegration-prior anchor (slot loc_ip_prev of `prev`) and device-
    predict the new frame's initial state from it (mirrors
    ops/preintegration_np.predict_mean = reference preintegrator.cpp:102-112),
    replacing the host's stale-base prediction. Shared by the per-frame
    subwindow chain and the round-5 async keyframe chain.

    Note the prior anchor's bg_i/ba_i stay at the host-assembled values: they
    are also the delta's bias linearization point (the delta was integrated
    at them). The chained override replaces only (q_i, p_i, v_i); the bias
    anchor is at most one subwindow refinement stale, which moves biases by
    ~the bias random-walk step — negligible against the walk covariance."""
    from rd_vio_tpu.ops.lie import quat_mul, quat_normalize, quat_rotate

    s_loc, invd_loc, pb_loc = _finalize_problem(pa_loc, calib, None, False)

    dt_ = s_loc.q.dtype
    ip = pb_loc.imu_prior
    use = loc_ip_prev >= 0
    pidx = jnp.clip(loc_ip_prev, 0)
    row0 = jnp.arange(ip.q_i.shape[0]) == 0

    def over(a_ip, a_prev):
        sel = (use & row0).reshape((-1,) + (1,) * (a_ip.ndim - 1))
        return jnp.where(sel, a_prev[pidx].astype(dt_)[None], a_ip)

    ip = ip._replace(
        q_i=over(ip.q_i, prev.q), p_i=over(ip.p_i, prev.p),
        v_i=over(ip.v_i, prev.v),
    )
    pb_loc = pb_loc._replace(imu_prior=ip)

    g = F.GRAVITY.astype(dt_)
    t_d = ip.delta.t[0]
    q_i, p_i, v_i = ip.q_i[0], ip.p_i[0], ip.v_i[0]
    v_pred = v_i + g * t_d + quat_rotate(q_i, ip.delta.v[0])
    p_pred = p_i + 0.5 * g * t_d * t_d + v_i * t_d + quat_rotate(
        q_i, ip.delta.p[0]
    )
    q_pred = quat_normalize(quat_mul(q_i, ip.delta.q[0]))

    def seed0(a, val):
        sel = (use & (jnp.arange(a.shape[0]) == 0)).reshape(
            (-1,) + (1,) * (a.ndim - 1)
        )
        return jnp.where(sel, val[None], a)

    s_loc = FrameStates(
        q=seed0(s_loc.q, q_pred), p=seed0(s_loc.p, p_pred),
        v=seed0(s_loc.v, v_pred),
        bg=seed0(s_loc.bg, ip.bg_i[0]), ba=seed0(s_loc.ba, ip.ba_i[0]),
    )
    return s_loc, invd_loc, pb_loc


@jax.jit
def _fused_localize_subwindow_chain_jit(
    pa_loc, pa_sub, j_slot, prev, loc_ip_prev, sub_prev, calib, max_iterations
):
    """Per-frame localize + subwindow solve with DEVICE-RESIDENT state
    chaining (round-4: the estimator twin of the round-3 frontend loop).

    `prev` is the previous subwindow solve's device-resident FrameStates;
    `loc_ip_prev` (scalar) chains the localize problem's preintegration-prior
    anchor state; `sub_prev` (W,) seeds the subwindow initial states. The
    host's mirrors may be one or two refinements stale — the frame-to-frame
    state dependency (reference sliding_window_tracker.cpp:80-99: localize
    against the REFINED last subframe) lives entirely on the device, so the
    host never blocks on a result fetch on this path."""
    s_loc, invd_loc, pb_loc = _chain_localize_head(
        pa_loc, prev, loc_ip_prev, calib
    )
    res_loc = ba.solve_ba(s_loc, invd_loc, pb_loc, max_iterations=max_iterations)

    s_sub, invd_sub, pb_sub = _finalize_problem(pa_sub, calib, None, False)
    s_sub = _override_prev_states(s_sub, prev, sub_prev)
    sl = res_loc.states
    s_sub = FrameStates(
        q=s_sub.q.at[j_slot].set(sl.q[0]),
        p=s_sub.p.at[j_slot].set(sl.p[0]),
        v=s_sub.v.at[j_slot].set(sl.v[0]),
        bg=s_sub.bg.at[j_slot].set(sl.bg[0]),
        ba=s_sub.ba.at[j_slot].set(sl.ba[0]),
    )
    res_sub = ba.solve_ba(s_sub, invd_sub, pb_sub, max_iterations=max_iterations)
    return res_sub


@jax.jit
def _fused_localize_subwindow_jit(pa_loc, pa_sub, j_slot, calib, max_iterations):
    """Per-frame localize solve chained into the subwindow refinement, all
    on-device (reference track() :101-125 then :349-444 for the subframe
    case). The localized new-frame state seeds the subwindow problem's last
    slot; only the subwindow result returns to the host."""
    s_loc, invd_loc, pb_loc = _finalize_problem(pa_loc, calib, None, False)
    res_loc = ba.solve_ba(s_loc, invd_loc, pb_loc, max_iterations=max_iterations)

    s_sub, invd_sub, pb_sub = _finalize_problem(pa_sub, calib, None, False)
    sl = res_loc.states
    s_sub = FrameStates(
        q=s_sub.q.at[j_slot].set(sl.q[0]),
        p=s_sub.p.at[j_slot].set(sl.p[0]),
        v=s_sub.v.at[j_slot].set(sl.v[0]),
        bg=s_sub.bg.at[j_slot].set(sl.bg[0]),
        ba=s_sub.ba.at[j_slot].set(sl.ba[0]),
    )
    res_sub = ba.solve_ba(s_sub, invd_sub, pb_sub, max_iterations=max_iterations)
    return res_sub


def solve_localize_subwindow(
    spec_loc: BASpec, spec_sub: BASpec, j_slot: int, calib: CalibArrays,
    caps: Caps, dtype=None, max_iterations: int = 10,
    prev_states: Optional[FrameStates] = None, loc_ip_prev: int = -1,
    sub_prev: Optional[np.ndarray] = None,
):
    """Fused per-frame solve for the subframe path: ONE dispatch, NO blocking
    fetch. With prev_states (the previous subwindow solve's device-resident
    states) the i-anchor of the localization prior and the subwindow initial
    states chain device-to-device (round-4 estimator residency); without it
    the host-assembled states are used as-is. Returns
    (BAResult of the subwindow solve, lm_slot of the subwindow problem)."""
    from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as _T

    with _T.time("bld.sub.assemble"):
        pa_loc, _ = _assemble(spec_loc, caps, calib)
        pa_sub, lm_slot = _assemble(spec_sub, caps, calib)
        pa_loc = _cast_pa(pa_loc, dtype)
        pa_sub = _cast_pa(pa_sub, dtype)
    if prev_states is not None:
        if sub_prev is None:
            sub_prev = np.full(caps.W, -1, np.int32)
        res = _fused_localize_subwindow_chain_jit(
            pa_loc, pa_sub, j_slot, prev_states,
            jnp.int32(loc_ip_prev), jnp.asarray(sub_prev, jnp.int32),
            calib.tree, max_iterations=max_iterations,
        )
        if device_time.CAPTURE:
            device_time.capture(
                "subwindow", pa_loc=pa_loc, pa_sub=pa_sub, j_slot=j_slot,
                prev=prev_states, loc_ip_prev=jnp.int32(loc_ip_prev),
                sub_prev=jnp.asarray(sub_prev, jnp.int32), calib=calib.tree,
                max_iterations=jnp.int32(max_iterations),
            )
    else:
        res = _fused_localize_subwindow_jit(
            pa_loc, pa_sub, j_slot, calib.tree, max_iterations=max_iterations
        )
    return res, lm_slot


@functools.partial(jax.jit, static_argnames=())
def _marginalize_jit(pa, calib, prior):
    from rd_vio_tpu.estimation import marginalization

    states, invd, pb = _finalize_problem(pa, calib, prior, True)
    return marginalization.marginalize_frame0(states, invd, pb)


def marginalize_spec(spec: BASpec, calib: CalibArrays, caps: Caps) -> F.PriorFactor:
    """Assemble + integrate + marginalize slot 0 in ONE dispatch; the new
    prior stays device-resident."""
    pa, _ = _assemble(spec, caps, calib)
    return _marginalize_jit(pa, calib.tree, spec.prior)


# ---------------------------------------------------------------------------
# fused keyframe tail: window solve + landmark validation + marginalization
# ---------------------------------------------------------------------------


def _k_of_row_map(st, frame: Frame) -> np.ndarray:
    """Store-row -> keypoint-index reverse map of one frame (-1 elsewhere)."""
    k_of_row = np.full(st.cap, -1, np.int64)
    rows = st.rows_of(frame.track_ids)
    v = rows >= 0
    k_of_row[rows[v]] = np.flatnonzero(v)
    return k_of_row


def _dict_to_row_map(st, d: Optional[Dict[int, int]], fill=-1) -> np.ndarray:
    """tid->value dict -> store-row-indexed vector (vectorized gather)."""
    out = np.full(st.cap, fill, np.int64)
    if d:
        tids = np.fromiter(d.keys(), np.int64, len(d))
        vals = np.fromiter(d.values(), np.int64, len(d))
        rows = st.rows_of(tids)
        ok = rows >= 0
        out[rows[ok]] = vals[ok]
    return out


def _assemble_validation(
    tracks: List[Track], frames_by_id: Dict[int, Frame],
    wslot: Dict[int, int], lm_slot_w: Dict[int, int], calib: CalibArrays,
    Lv: int, Ov: int, tri_idx_of_tid: Optional[Dict[int, int]] = None,
):
    """NumPy arrays for on-device landmark validation (reference refine_window
    post-solve validation, sliding_window_tracker.cpp:304-336): per track the
    anchor camera pose (a window slot when the anchor is a window keyframe —
    resolved against the SOLVED states on device — or baked host constants),
    and per keyframe observation the observing window slot + bearing.

    Vectorized over the SoA TrackStore (VERDICT r4 item 3: the per-track
    obs-dict loops kept bld.kf.assemble at ~19 ms): per-track scalars are
    store gathers; observations are gathered frame-major through per-frame
    row->keypoint reverse maps, so cost scales with #window-frames (~15),
    not #tracks x #obs. The observation ORDER therefore differs from the
    reference's track-major iteration — validation is segment-sum based and
    order-insensitive; at Ov overflow any track with a dropped observation
    fails closed exactly as before.

    tri_idx_of_tid maps track id -> row in the in-program triangulation batch
    (the fully-fused keyframe step): those tracks take their inverse depth
    from the triangulation result and are gated on its success."""
    if tracks:
        return _assemble_validation_fast(
            tracks, frames_by_id, wslot, lm_slot_w, calib, Lv, Ov,
            tri_idx_of_tid,
        )
    return _assemble_validation_ref(
        tracks, frames_by_id, wslot, lm_slot_w, calib, Lv, Ov,
        tri_idx_of_tid,
    )


def _assemble_validation_fast(
    tracks, frames_by_id, wslot, lm_slot_w, calib, Lv, Ov, tri_idx_of_tid
):
    n = min(len(tracks), Lv)
    if len(tracks) > Lv:
        logging.getLogger(__name__).warning(
            "validation capacity exceeded: %d tracks > Lv=%d; overflow "
            "tracks fail validation closed", len(tracks), Lv,
        )
    st = tracks[0].store
    rows = np.fromiter((t.row for t in tracks[:n]), np.int64, n)
    aids = st.first_fid[rows]
    fid_arr = np.fromiter(frames_by_id, np.int64, len(frames_by_id))
    has = np.zeros(Lv, bool)
    has[:n] = np.isin(aids, fid_arr)

    # anchor slot (window keyframes resolve on-device against solved states)
    wk = np.fromiter(wslot.keys(), np.int64, len(wslot))
    wv = np.fromiter(wslot.values(), np.int64, len(wslot))
    srt = np.argsort(wk)
    wk, wv = wk[srt], wv[srt]
    a_slot = np.full(Lv, -1, np.int32)
    if len(wk):
        pos = np.clip(np.searchsorted(wk, aids), 0, len(wk) - 1)
        in_w = (wk[pos] == aids) & has[:n]
        a_slot[:n] = np.where(in_w, wv[pos], -1)

    # anchor bearings + host camera poses for non-window anchors, gathered
    # once per distinct anchor frame
    a_qc = np.tile([1.0, 0, 0, 0], (Lv, 1))
    a_pc = np.zeros((Lv, 3))
    z0 = np.tile([0.0, 0, 1.0], (Lv, 1))
    q_bc, p_bc = calib.q_bc_h, calib.p_bc_h
    for aid in np.unique(aids[has[:n]]):
        f = frames_by_id[int(aid)]
        k_of_row = _k_of_row_map(st, f)
        sel = np.flatnonzero((aids == aid) & has[:n])
        ks = k_of_row[rows[sel]]
        ok = ks >= 0
        z0[sel[ok]] = f.bearings[ks[ok]]
        has[sel[~ok]] = False  # anchor link lost: fail closed
        if int(aid) not in wslot:
            qc, pc = f.get_pose(q_bc, p_bc)
            a_qc[sel] = qc
            a_pc[sel] = pc

    # per-track scalars only for tracks whose anchor survives (`has`):
    # mirrors the reference twin's early `continue` — anchor-less tracks
    # keep the -1/1.0 defaults and contribute no observations
    hv = has[:n]
    lmw_rows = _dict_to_row_map(st, lm_slot_w)
    lmw = np.full(Lv, -1, np.int32)
    lmw[:n] = np.where(hv, lmw_rows[rows], -1)
    tri_idx = np.full(Lv, -1, np.int32)
    if tri_idx_of_tid is not None:
        tri_rows = _dict_to_row_map(st, tri_idx_of_tid)
        tri_idx[:n] = np.where(hv, tri_rows[rows], -1)
    invd_h = np.ones(Lv)
    invd_h[:n] = np.where(hv, st.inv_depth[rows], 1.0)

    # observations, frame-major: per window frame, which validation tracks
    # does it observe (vti = index into `tracks`)
    vti_of_row = np.full(st.cap, -1, np.int64)
    vti_of_row[rows[hv]] = np.flatnonzero(hv)
    o_ti_parts, o_slot_parts, o_z_parts = [], [], []
    for fid, ws in wslot.items():
        f = frames_by_id.get(fid)
        if f is None:
            continue
        rows_f = st.rows_of(f.track_ids)
        r = np.clip(rows_f, 0, None)
        msk = (rows_f >= 0) & (vti_of_row[r] >= 0)
        ks = np.flatnonzero(msk)
        if len(ks) == 0:
            continue
        o_ti_parts.append(vti_of_row[rows_f[ks]])
        o_slot_parts.append(np.full(len(ks), ws, np.int64))
        o_z_parts.append(f.bearings[ks])

    o_ti = np.zeros(Ov, np.int32)
    o_slot = np.zeros(Ov, np.int32)
    o_z = np.tile([0.0, 0, 1.0], (Ov, 1))
    o_val = np.zeros(Ov, bool)
    trunc = np.zeros(Lv, bool)
    if o_ti_parts:
        ti_all = np.concatenate(o_ti_parts)
        slot_all = np.concatenate(o_slot_parts)
        z_all = np.concatenate(o_z_parts)
        no = len(ti_all)
        if no > Ov:
            logging.getLogger(__name__).warning(
                "validation observation budget exhausted (Ov=%d); "
                "truncated tracks fail validation closed", Ov,
            )
            trunc[ti_all[Ov:]] = True
            no = Ov
        o_ti[:no] = ti_all[:no]
        o_slot[:no] = slot_all[:no]
        o_z[:no] = z_all[:no]
        o_val[:no] = True

    Km = calib.K
    return {
        "a_slot": a_slot, "a_qc": a_qc, "a_pc": a_pc, "z0": z0,
        "lmw": lmw, "tri_idx": tri_idx, "invd_h": invd_h, "has": has,
        "o_ti": o_ti, "o_slot": o_slot, "o_z": o_z, "o_val": o_val,
        "trunc": trunc,
        "fxy": np.array([Km[0, 0], Km[1, 1]]),
    }


def _assemble_validation_ref(
    tracks: List[Track], frames_by_id: Dict[int, Frame],
    wslot: Dict[int, int], lm_slot_w: Dict[int, int], calib: CalibArrays,
    Lv: int, Ov: int, tri_idx_of_tid: Optional[Dict[int, int]] = None,
):
    """Track-major per-obs-dict twin of _assemble_validation_fast, kept as
    the equivalence oracle (tests/test_keyframe_fused.py)."""
    a_slot = np.full(Lv, -1, np.int32)
    a_qc = np.tile([1.0, 0, 0, 0], (Lv, 1))
    a_pc = np.zeros((Lv, 3))
    z0 = np.tile([0.0, 0, 1.0], (Lv, 1))
    lmw = np.full(Lv, -1, np.int32)
    tri_idx = np.full(Lv, -1, np.int32)
    invd_h = np.ones(Lv)
    has = np.zeros(Lv, bool)
    o_ti = np.zeros(Ov, np.int32)
    o_slot = np.zeros(Ov, np.int32)
    o_z = np.tile([0.0, 0, 1.0], (Ov, 1))
    o_val = np.zeros(Ov, bool)
    # tracks whose observations were truncated by the Ov budget fail closed:
    # a zero/partial-obs validation would otherwise pass unconditionally
    trunc = np.zeros(Lv, bool)
    if len(tracks) > Lv:
        logging.getLogger(__name__).warning(
            "validation capacity exceeded: %d tracks > Lv=%d; overflow "
            "tracks fail validation closed", len(tracks), Lv,
        )
    q_bc, p_bc = calib.q_bc_h, calib.p_bc_h
    cam_cache = {}
    oi = 0
    for ti, t in enumerate(tracks[:Lv]):
        aid = t.first_frame_id()
        af = frames_by_id.get(aid)
        if af is None:
            continue
        has[ti] = True
        z0[ti] = af.bearings[t.obs[aid]]
        s = wslot.get(aid, -1)
        a_slot[ti] = s
        if s < 0:
            c = cam_cache.get(aid)
            if c is None:
                c = cam_cache[aid] = af.get_pose(q_bc, p_bc)
            a_qc[ti], a_pc[ti] = c
        lmw[ti] = lm_slot_w.get(t.id, -1)
        if tri_idx_of_tid is not None:
            tri_idx[ti] = tri_idx_of_tid.get(t.id, -1)
        invd_h[ti] = t.inv_depth
        for fid, k in t.obs.items():
            if fid not in wslot:
                continue  # only keyframe observations enter validation
            if oi >= Ov:
                trunc[ti] = True
                logging.getLogger(__name__).warning(
                    "validation observation budget exhausted (Ov=%d); "
                    "truncated tracks fail validation closed", Ov,
                )
                break
            f = frames_by_id[fid]
            o_ti[oi] = ti
            o_slot[oi] = wslot[fid]
            o_z[oi] = f.bearings[k]
            o_val[oi] = True
            oi += 1
    Km = calib.K
    return {
        "a_slot": a_slot, "a_qc": a_qc, "a_pc": a_pc, "z0": z0,
        "lmw": lmw, "tri_idx": tri_idx, "invd_h": invd_h, "has": has,
        "o_ti": o_ti, "o_slot": o_slot, "o_z": o_z, "o_val": o_val,
        "trunc": trunc,
        "fxy": np.array([Km[0, 0], Km[1, 1]]),
    }


def _validate_tracks_device(va, s64: FrameStates, invd64, ext: F.Extrinsics,
                            tri_invd=None, tri_ok=None):
    """Vectorized landmark validation at the solved states: depth in
    (1e-3, 50] at every keyframe observation and mean pixel reprojection
    error < 3 px (reference :304-336). tri_invd/tri_ok (fully-fused keyframe
    step): tracks triangulated in-program take their depth from tri_invd and
    are additionally gated on tri_ok."""
    from rd_vio_tpu.ops.lie import quat_conj, quat_mul, quat_rotate

    a_slot = jnp.asarray(va["a_slot"])
    use_w = a_slot >= 0
    idx = jnp.clip(a_slot, 0)
    qb = s64.q[idx]
    pb_ = s64.p[idx]
    q_bc = jnp.broadcast_to(ext.q_bc, qb.shape)
    p_bc = jnp.broadcast_to(ext.p_bc, pb_.shape)
    qc = jnp.where(use_w[:, None], quat_mul(qb, q_bc), jnp.asarray(va["a_qc"]))
    pc = jnp.where(use_w[:, None], pb_ + quat_rotate(qb, p_bc), jnp.asarray(va["a_pc"]))
    lmw = jnp.asarray(va["lmw"])
    invd = jnp.where(lmw >= 0, invd64[jnp.clip(lmw, 0)], jnp.asarray(va["invd_h"]))
    if tri_invd is not None:
        ti = jnp.asarray(va["tri_idx"])
        from_tri = (ti >= 0) & (lmw < 0)
        invd = jnp.where(from_tri, tri_invd[jnp.clip(ti, 0)], invd)
    z0 = jnp.asarray(va["z0"])
    x = quat_rotate(qc, z0 / jnp.maximum(invd, 1e-12)[:, None]) + pc

    o_slot = jnp.asarray(va["o_slot"])
    o_ti = jnp.asarray(va["o_ti"])
    qob = s64.q[o_slot]
    pob = s64.p[o_slot]
    q_bc_o = jnp.broadcast_to(ext.q_bc, qob.shape)
    p_bc_o = jnp.broadcast_to(ext.p_bc, pob.shape)
    qoc = quat_mul(qob, q_bc_o)
    poc = pob + quat_rotate(qob, p_bc_o)
    y = quat_rotate(quat_conj(qoc), x[o_ti] - poc)
    depth_bad = ~((y[:, 2] > 1e-3) & (y[:, 2] <= 50.0))
    ys = y[:, :2] / jnp.maximum(y[:, 2:], 1e-12)
    o_z = jnp.asarray(va["o_z"])
    zs = o_z[:, :2] / o_z[:, 2:]
    rpe = jnp.linalg.norm((ys - zs) * jnp.asarray(va["fxy"])[None], axis=-1)
    ov = jnp.asarray(va["o_val"])
    Lv = a_slot.shape[0]
    f64 = invd.dtype
    sum_rpe = jax.ops.segment_sum(jnp.where(ov, rpe, 0.0), o_ti, num_segments=Lv)
    cnt = jax.ops.segment_sum(ov.astype(f64), o_ti, num_segments=Lv)
    nbad = jax.ops.segment_sum((ov & depth_bad).astype(f64), o_ti, num_segments=Lv)
    mean_rpe = sum_rpe / jnp.maximum(cnt, 1.0)
    out = (jnp.asarray(va["has"]) & ~jnp.asarray(va["trunc"])
           & (invd > 0) & (nbad == 0) & (mean_rpe < 3.0))
    if tri_ok is not None:
        ti = jnp.asarray(va["tri_idx"])
        out = out & ((ti < 0) | tri_ok[jnp.clip(ti, 0)])
    return out


@jax.jit
def _fused_window_tail_jit(pa_w, prior, va, calib, max_iterations):
    """Window VI-BA solve -> on-device landmark validation (reference
    keyframe tail refine_window :226-337 -> validation :304-336). The solve
    may run at reduced precision; validation runs in f64 on the cast-up
    result. The slot-0 marginalization runs as a SEPARATE program
    (`_marginalize_tail_jit`) dispatched right after this one: its result is
    consumed only by the NEXT keyframe solve (device-side), so the host's
    blocking fetch never waits on the marginalization's device time."""
    s, invd, pb = _finalize_problem(pa_w, calib, prior, True)
    res = ba.solve_ba(s, invd, pb, max_iterations=max_iterations)

    f64 = jnp.float64
    s64 = FrameStates(*(a.astype(f64) for a in res.states))
    invd64 = res.inv_depth.astype(f64)
    valid_out = _validate_tracks_device(va, s64, invd64, calib.ext)
    return res, valid_out


@functools.partial(jax.jit, static_argnames=())
def _marginalize_tail_jit(s_res, invd_res, valid_out, tri_invd, tri_ok,
                          pa_m, mlm_vti, mlm_from_w, mlm_tri, prior, calib):
    """Slot-0 marginalization on the solved window states, as its own device
    program (reference slide_window/marginalize :339-347). Chained
    device-to-device after the window-solve program; the resulting prior
    stays device-resident for the next keyframe solve — no host fetch ever
    waits on this program."""
    from rd_vio_tpu.estimation import marginalization

    f64 = jnp.float64
    s64 = FrameStates(*(a.astype(f64) for a in s_res))
    invd64 = invd_res.astype(f64)
    s_m, invd_m, pb_m = _finalize_problem(pa_m, calib, prior, True)
    from_w = mlm_from_w >= 0
    invd_m = jnp.where(from_w, invd64[jnp.clip(mlm_from_w, 0)], invd_m)
    from_t = (mlm_tri >= 0) & ~from_w
    invd_m = jnp.where(from_t, tri_invd[jnp.clip(mlm_tri, 0)].astype(f64),
                       invd_m)
    lm_ok = (mlm_vti >= 0) & valid_out[jnp.clip(mlm_vti, 0)] & (invd_m > 0)
    rp = pb_m.reproj
    pb_m = pb_m._replace(reproj=rp._replace(valid=rp.valid & lm_ok[rp.lm]))
    return marginalization.marginalize_frame0(s64, invd_m, pb_m)


def _fused_keyframe_body(
    pa_loc, b, qcw, pcw, m_tri, us, tri_aqc, tri_apc,
    pa_w, j_w, wlm_tri, prior, va,
    calib, max_iterations, prev=None, loc_ip_prev=None,
):
    """The sliding-keyframe step as one device program (reference track()
    keyframe branch :80-99): localization solve -> triangulation of pending
    tracks -> window VI-BA (new-frame state and fresh inverse depths chained
    in, factors of failed triangulations gated off) -> landmark validation.
    One dispatch, one fetch. The slot-0 marginalization runs as a separate
    chained program (`_marginalize_tail_jit`) the host never waits on.

    With prev/loc_ip_prev (round 5 async keyframe path), the localization
    prior anchor chains device-to-device from the previous subwindow solve —
    the keyframe step then needs no exact host mirror at dispatch time."""
    from rd_vio_tpu.ops.lie import quat_conj, quat_mul, quat_rotate

    f64 = jnp.float64

    # --- 1. localize the new frame -------------------------------------
    if prev is None:
        s_loc, invd_loc, pb_loc = _finalize_problem(pa_loc, calib, None, False)
    else:
        s_loc, invd_loc, pb_loc = _chain_localize_head(
            pa_loc, prev, loc_ip_prev, calib
        )
    res_loc = ba.solve_ba(s_loc, invd_loc, pb_loc, max_iterations=max_iterations)

    # --- 2. triangulate pending tracks (f64), solved-frame views chained --
    q0 = res_loc.states.q[0].astype(f64)
    p0 = res_loc.states.p[0].astype(f64)
    qc0 = quat_mul(q0, calib.ext.q_bc)
    pc0 = p0 + quat_rotate(q0, calib.ext.p_bc)
    qcw_j = quat_conj(qc0)
    pcw_j = -quat_rotate(qcw_j, pc0)
    sel = us[..., None] > 0
    qcw = jnp.where(sel, qcw_j[None, None, :], qcw)
    pcw = jnp.where(sel, pcw_j[None, None, :], pcw)
    pts, tri_ok = jax.vmap(tri.triangulate_homogeneous)(b, qcw, pcw, m_tri)
    # inverse depth along the anchor bearing (reference track.cpp:90-101)
    y_a = quat_rotate(quat_conj(tri_aqc), pts - tri_apc)
    d_a = jnp.linalg.norm(y_a, axis=-1)
    tri_invd = 1.0 / jnp.maximum(d_a, 1e-9)
    tri_ok = tri_ok & jnp.isfinite(tri_invd)

    # --- 3. window solve with chained state + fresh depths ---------------
    s_w, invd_w, pb_w = _finalize_problem(pa_w, calib, prior, True)
    dtype_w = s_w.q.dtype
    mask_j = (jnp.arange(s_w.q.shape[0]) == j_w)
    sl = res_loc.states

    def seed(a_w, a_l):
        return jnp.where(
            mask_j.reshape((-1,) + (1,) * (a_w.ndim - 1)),
            a_l[0].astype(dtype_w)[None], a_w,
        )

    s_w = FrameStates(
        q=seed(s_w.q, sl.q), p=seed(s_w.p, sl.p), v=seed(s_w.v, sl.v),
        bg=seed(s_w.bg, sl.bg), ba=seed(s_w.ba, sl.ba),
    )
    has_tri = wlm_tri >= 0
    invd_w = jnp.where(
        has_tri, tri_invd[jnp.clip(wlm_tri, 0)].astype(dtype_w), invd_w
    )
    lm_gate = (~has_tri) | tri_ok[jnp.clip(wlm_tri, 0)]
    rp_w = pb_w.reproj
    pb_w = pb_w._replace(
        opt_lm=pb_w.opt_lm & lm_gate,
        reproj=rp_w._replace(valid=rp_w.valid & lm_gate[rp_w.lm]),
    )
    res = ba.solve_ba(s_w, invd_w, pb_w, max_iterations=max_iterations)

    # --- 4. validation (tri-aware) ---------------------------------------
    s64 = FrameStates(*(a.astype(f64) for a in res.states))
    invd64 = res.inv_depth.astype(f64)
    valid_out = _validate_tracks_device(
        va, s64, invd64, calib.ext, tri_invd=tri_invd, tri_ok=tri_ok
    )
    return res, res_loc, valid_out, tri_ok, tri_invd


@jax.jit
def _fused_keyframe_jit(
    pa_loc, b, qcw, pcw, m_tri, us, tri_aqc, tri_apc,
    pa_w, j_w, wlm_tri, prior, va,
    calib, max_iterations,
):
    return _fused_keyframe_body(
        pa_loc, b, qcw, pcw, m_tri, us, tri_aqc, tri_apc,
        pa_w, j_w, wlm_tri, prior, va, calib, max_iterations,
    )


@jax.jit
def _fused_keyframe_chain_jit(
    pa_loc, b, qcw, pcw, m_tri, us, tri_aqc, tri_apc,
    pa_w, j_w, wlm_tri, prior, va, prev, loc_ip_prev,
    calib, max_iterations,
):
    """Async keyframe variant (VERDICT r4 item 2): identical step, with the
    localization prior anchor chained from the previous subwindow solve's
    device-resident states instead of requiring an exact host mirror."""
    return _fused_keyframe_body(
        pa_loc, b, qcw, pcw, m_tri, us, tri_aqc, tri_apc,
        pa_w, j_w, wlm_tri, prior, va, calib, max_iterations,
        prev=prev, loc_ip_prev=loc_ip_prev,
    )


def assemble_keyframe_fused(
    spec_loc: BASpec, pending: List[Track], spec_w: BASpec,
    tracks_v: List[Track], spec_m: BASpec,
    frames_by_id: Dict[int, Frame], calib: CalibArrays, caps: Caps,
    caps_loc: Optional[Caps] = None, dtype=None, loc_dtype=None,
):
    """Host-side (NumPy) assembly of the fully-fused keyframe step: every
    array `_fused_keyframe_jit` + `_marginalize_tail_jit` consume, as a flat
    dict of same-keyed leaves. Split out of solve_keyframe_fused so the
    batched multi-sequence runtime (rd_vio_tpu.batch) can stack N of these
    and drive ONE vmapped dispatch. Returns (arrays_dict, lm_w)."""
    from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as _T

    Lv = 2 * caps.L
    Ov = caps.O
    solved_fid = spec_loc.frames[0].id
    wslot = {f.id: i for i, f in enumerate(spec_w.frames)}
    with _T.time("bld.kf.assemble"):
        pa_loc, _ = _assemble(spec_loc, caps_loc or caps, calib)
        pa_loc = _cast_pa(pa_loc, loc_dtype or dtype)
        b, qcw, pcw, m_tri, us = assemble_triangulation(
            pending, frames_by_id, calib, caps, solved_frame_id=solved_fid
        )
        # per-pending anchor CAMERA pose (triangulation-time = pre-window
        # host poses; the anchor is never the localized frame itself since a
        # triangulable track has an older first observation)
        n_cap = b.shape[0]
        tri_aqc = np.tile([1.0, 0, 0, 0], (n_cap, 1))
        tri_apc = np.zeros((n_cap, 3))
        q_bc, p_bc = calib.q_bc_h, calib.p_bc_h
        for i, t in enumerate(pending[:n_cap]):
            af = frames_by_id.get(t.first_frame_id())
            if af is not None:
                tri_aqc[i], tri_apc[i] = af.get_pose(q_bc, p_bc)
        tri_idx_of_tid = {t.id: i for i, t in enumerate(pending[:n_cap])}

        pa_w, lm_w = _assemble(spec_w, caps, calib)
        pa_w = _cast_pa(pa_w, dtype)
        wlm_tri = np.full(caps.L, -1, np.int32)
        for tid, s in lm_w.items():
            wlm_tri[s] = tri_idx_of_tid.get(tid, -1)
        j_w = wslot.get(solved_fid, -1)

        va = _assemble_validation(
            tracks_v, frames_by_id, wslot, lm_w, calib, Lv, Ov,
            tri_idx_of_tid=tri_idx_of_tid,
        )
        pa_m, lm_m = _assemble(spec_m, caps, calib)
        vti_of_tid = {t.id: i for i, t in enumerate(tracks_v[:Lv])}
        mlm_vti = np.full(caps.L, -1, np.int32)
        mlm_from_w = np.full(caps.L, -1, np.int32)
        mlm_tri = np.full(caps.L, -1, np.int32)
        for tid, s in lm_m.items():
            mlm_vti[s] = vti_of_tid.get(tid, -1)
            mlm_from_w[s] = lm_w.get(tid, -1)
            mlm_tri[s] = tri_idx_of_tid.get(tid, -1)
    arrays = dict(
        pa_loc=pa_loc, b=b, qcw=qcw, pcw=pcw, m_tri=m_tri, us=us,
        tri_aqc=tri_aqc, tri_apc=tri_apc, pa_w=pa_w,
        j_w=np.int32(j_w), wlm_tri=wlm_tri, va=va, pa_m=pa_m,
        mlm_vti=mlm_vti, mlm_from_w=mlm_from_w, mlm_tri=mlm_tri,
    )
    return arrays, lm_w


def solve_keyframe_fused(
    spec_loc: BASpec, pending: List[Track], spec_w: BASpec,
    tracks_v: List[Track], spec_m: BASpec,
    frames_by_id: Dict[int, Frame], calib: CalibArrays, caps: Caps,
    caps_loc: Optional[Caps] = None, dtype=None, loc_dtype=None,
    max_iterations: int = 10,
):
    """Fully-fused sliding-keyframe step: ONE dispatch + ONE fetch for
    localize + triangulate + window solve + validation + marginalization.

    spec_w must already include `pending` tracks (their factors are gated
    on-device by triangulation success). Returns
    (res, res_loc, lm_w, valid_h, tri_ok_h, tri_invd_h, new_prior) with the
    three *_h arrays host-fetched alongside the solve results."""
    KF_FUSED_COUNT.n += 1

    a, lm_w = assemble_keyframe_fused(
        spec_loc, pending, spec_w, tracks_v, spec_m, frames_by_id, calib,
        caps, caps_loc=caps_loc, dtype=dtype, loc_dtype=loc_dtype,
    )
    pa_loc, b, qcw, pcw = a["pa_loc"], a["b"], a["qcw"], a["pcw"]
    m_tri, us, tri_aqc, tri_apc = a["m_tri"], a["us"], a["tri_aqc"], a["tri_apc"]
    pa_w, j_w, wlm_tri, va = a["pa_w"], int(a["j_w"]), a["wlm_tri"], a["va"]
    pa_m = a["pa_m"]
    mlm_vti, mlm_from_w, mlm_tri = a["mlm_vti"], a["mlm_from_w"], a["mlm_tri"]

    res, res_loc, valid_out, tri_ok, tri_invd = _fused_keyframe_jit(
        pa_loc, jnp.asarray(b), jnp.asarray(qcw), jnp.asarray(pcw),
        jnp.asarray(m_tri), jnp.asarray(us), jnp.asarray(tri_aqc),
        jnp.asarray(tri_apc), pa_w, j_w, jnp.asarray(wlm_tri), spec_w.prior,
        va, calib.tree, max_iterations=max_iterations,
    )
    if device_time.CAPTURE and spec_w.prior is not None:
        device_time.capture(
            "keyframe", pa_loc=pa_loc, b=jnp.asarray(b), qcw=jnp.asarray(qcw),
            pcw=jnp.asarray(pcw), m_tri=jnp.asarray(m_tri),
            us=jnp.asarray(us), tri_aqc=jnp.asarray(tri_aqc),
            tri_apc=jnp.asarray(tri_apc), pa_w=pa_w, j_w=j_w,
            wlm_tri=jnp.asarray(wlm_tri), prior=spec_w.prior, va=va,
            pa_m=pa_m, mlm_vti=jnp.asarray(mlm_vti),
            mlm_from_w=jnp.asarray(mlm_from_w), mlm_tri=jnp.asarray(mlm_tri),
            calib=calib.tree, max_iterations=jnp.int32(max_iterations),
        )
    # marginalization: separate chained program; its prior output stays
    # device-resident for the next keyframe solve — never fetched
    new_prior = _marginalize_tail_jit(
        res.states, res.inv_depth, valid_out, tri_invd, tri_ok,
        pa_m, jnp.asarray(mlm_vti), jnp.asarray(mlm_from_w),
        jnp.asarray(mlm_tri), spec_w.prior, calib.tree,
    )
    return res, res_loc, lm_w, valid_out, tri_ok, tri_invd, new_prior


def solve_keyframe_fused_async(
    spec_loc: BASpec, pending: List[Track], spec_w: BASpec,
    tracks_v: List[Track], spec_m: BASpec,
    frames_by_id: Dict[int, Frame], calib: CalibArrays, caps: Caps,
    caps_loc: Optional[Caps] = None, dtype=None, loc_dtype=None,
    max_iterations: int = 10,
    prev_states: Optional[FrameStates] = None, loc_ip_prev: int = -1,
):
    """Async fused keyframe step (VERDICT r4 item 2): ONE dispatch, NO
    blocking fetch. The localization prior anchor chains device-to-device
    from `prev_states` (the previous subwindow solve), so the host mirror
    may be one refinement stale at dispatch time — the same contract as the
    round-4 subframe path. Returns (res, lm_w, transfer, new_prior):
    res.states stays device-resident for the next frame's chain, `transfer`
    is the tuple to fetch_async (the exact tree solve_keyframe_fused's
    synchronous fetch used), and the new prior never leaves the device."""
    KF_FUSED_COUNT.n += 1

    a, lm_w = assemble_keyframe_fused(
        spec_loc, pending, spec_w, tracks_v, spec_m, frames_by_id, calib,
        caps, caps_loc=caps_loc, dtype=dtype, loc_dtype=loc_dtype,
    )
    if prev_states is not None:
        res, res_loc, valid_out, tri_ok, tri_invd = _fused_keyframe_chain_jit(
            a["pa_loc"], jnp.asarray(a["b"]), jnp.asarray(a["qcw"]),
            jnp.asarray(a["pcw"]), jnp.asarray(a["m_tri"]),
            jnp.asarray(a["us"]), jnp.asarray(a["tri_aqc"]),
            jnp.asarray(a["tri_apc"]), a["pa_w"], int(a["j_w"]),
            jnp.asarray(a["wlm_tri"]), spec_w.prior, a["va"],
            prev_states, jnp.int32(loc_ip_prev), calib.tree,
            max_iterations=max_iterations,
        )
    else:
        res, res_loc, valid_out, tri_ok, tri_invd = _fused_keyframe_jit(
            a["pa_loc"], jnp.asarray(a["b"]), jnp.asarray(a["qcw"]),
            jnp.asarray(a["pcw"]), jnp.asarray(a["m_tri"]),
            jnp.asarray(a["us"]), jnp.asarray(a["tri_aqc"]),
            jnp.asarray(a["tri_apc"]), a["pa_w"], int(a["j_w"]),
            jnp.asarray(a["wlm_tri"]), spec_w.prior, a["va"], calib.tree,
            max_iterations=max_iterations,
        )
    if device_time.CAPTURE and spec_w.prior is not None:
        device_time.capture(
            "keyframe", pa_loc=a["pa_loc"], b=jnp.asarray(a["b"]),
            qcw=jnp.asarray(a["qcw"]), pcw=jnp.asarray(a["pcw"]),
            m_tri=jnp.asarray(a["m_tri"]), us=jnp.asarray(a["us"]),
            tri_aqc=jnp.asarray(a["tri_aqc"]),
            tri_apc=jnp.asarray(a["tri_apc"]), pa_w=a["pa_w"],
            j_w=int(a["j_w"]), wlm_tri=jnp.asarray(a["wlm_tri"]),
            prior=spec_w.prior, va=a["va"], pa_m=a["pa_m"],
            mlm_vti=jnp.asarray(a["mlm_vti"]),
            mlm_from_w=jnp.asarray(a["mlm_from_w"]),
            mlm_tri=jnp.asarray(a["mlm_tri"]), calib=calib.tree,
            max_iterations=jnp.int32(max_iterations),
        )
    new_prior = _marginalize_tail_jit(
        res.states, res.inv_depth, valid_out, tri_invd, tri_ok,
        a["pa_m"], jnp.asarray(a["mlm_vti"]), jnp.asarray(a["mlm_from_w"]),
        jnp.asarray(a["mlm_tri"]), spec_w.prior, calib.tree,
    )
    s, sl = res.states, res_loc.states
    transfer = (s.q, s.p, s.v, s.bg, s.ba, res.inv_depth,
                sl.q, sl.p, sl.v, sl.bg, sl.ba, valid_out, tri_ok, tri_invd)
    return res, lm_w, transfer, new_prior


def solve_window_validate_marginalize(
    spec_w: BASpec, tracks_v: List[Track], spec_m: BASpec,
    frames_by_id: Dict[int, Frame], calib: CalibArrays, caps: Caps,
    dtype=None, max_iterations: int = 10,
):
    """Fused keyframe tail: ONE dispatch covering the window solve, landmark
    validation, and the slot-0 marginalization; ONE fetch for (solve result,
    per-track validity). The new prior stays device-resident.

    Returns (res, lm_slot_w, valid_out_dev, new_prior); `valid_out_dev[i]`
    corresponds to tracks_v[i] (truncated at 2*caps.L)."""
    from rd_vio_tpu.utils.metrics import GLOBAL_TIMER as _T

    Lv = 2 * caps.L
    Ov = caps.O
    wslot = {f.id: i for i, f in enumerate(spec_w.frames)}
    with _T.time("bld.wvm.assemble"):
        pa_w, lm_w = _assemble(spec_w, caps, calib)
        va = _assemble_validation(tracks_v, frames_by_id, wslot, lm_w, calib, Lv, Ov)
        pa_m, lm_m = _assemble(spec_m, caps, calib)
    vti_of_tid = {t.id: i for i, t in enumerate(tracks_v[:Lv])}
    mlm_vti = np.full(caps.L, -1, np.int32)
    mlm_from_w = np.full(caps.L, -1, np.int32)
    for tid, s in lm_m.items():
        mlm_vti[s] = vti_of_tid.get(tid, -1)
        mlm_from_w[s] = lm_w.get(tid, -1)
    res, valid_out = _fused_window_tail_jit(
        _cast_pa(pa_w, dtype), spec_w.prior, va, calib.tree,
        max_iterations=max_iterations,
    )
    # no-triangulation case: sentinel tri arrays, mlm_tri all -1
    new_prior = _marginalize_tail_jit(
        res.states, res.inv_depth, valid_out,
        jnp.ones(1), jnp.ones(1, bool),
        pa_m, jnp.asarray(mlm_vti), jnp.asarray(mlm_from_w),
        jnp.full(caps.L, -1, np.int32), spec_w.prior, calib.tree,
    )
    return res, lm_w, valid_out, new_prior


def result_transfer_tree(res: ba.BAResult):
    """The (device) pytree apply_result_np consumes — fetch it (sync or
    async) and hand the numpy tree over."""
    return (res.states.q, res.states.p, res.states.v, res.states.bg,
            res.states.ba, res.inv_depth)


def apply_result(res: ba.BAResult, spec: BASpec, lm_slot: Dict[int, int]):
    # one batched device->host transfer for the whole result
    apply_result_np(fetch(result_transfer_tree(res)), spec, lm_slot)


def apply_result_np(host_tree, spec: BASpec, lm_slot: Dict[int, int]):
    q, p, v, bg, ba_, invd_dev = host_tree
    for i, f in enumerate(spec.frames):
        if not spec.fix_pose[i]:
            f.q, f.p = q[i], p[i]
        if not spec.fix_motion[i]:
            f.v, f.bg, f.ba = v[i], bg[i], ba_[i]
    invd = invd_dev
    by_id = {t.id: t for t in spec.opt_tracks}
    for tid, s in lm_slot.items():
        t = by_id.get(tid)
        if t is not None:
            t.inv_depth = float(invd[s])


# ---------------------------------------------------------------------------
# batched triangulation
# ---------------------------------------------------------------------------


@jax.jit
def _triangulate_batch(bearings, q_cw, p_cw, mask):
    return jax.vmap(tri.triangulate_homogeneous)(bearings, q_cw, p_cw, mask)


def assemble_triangulation(
    tracks: List[Track], frames_by_id: Dict[int, Frame], calib: CalibArrays,
    caps: Caps, solved_frame_id: Optional[int] = None,
):
    """NumPy view arrays for batched N-view DLT, padded to (caps.L, TRI_VIEWS).

    Views of `solved_frame_id` get use_solved=1 and placeholder poses — the
    fused localize+triangulate program substitutes the freshly solved frame
    pose on-device."""
    V = caps.TRI_VIEWS
    n = len(tracks)
    # pad the batch to a FIXED small capacity: a varying batch size would
    # recompile the jitted triangulation on the per-keyframe hot path, and
    # padding all the way to L made dummy f64 DLT slots dominate the fused
    # keyframe program (Caps.TRI_PAD). Larger pending sets escalate to the
    # next stable size rather than failing.
    if n <= caps.TRI_PAD:
        n_cap = caps.TRI_PAD
    elif n <= caps.L:
        n_cap = caps.L
    else:
        n_cap = n
    b = np.tile([0.0, 0, 1.0], (n_cap, V, 1))
    qcw = np.tile([1.0, 0, 0, 0], (n_cap, V, 1))
    pcw = np.zeros((n_cap, V, 3))
    m = np.zeros((n_cap, V))
    us = np.zeros((n_cap, V))
    q_bc = calib.q_bc_h
    p_bc = calib.p_bc_h
    # world->camera pose per frame, computed ONCE per frame (the quat math
    # costs ~20 us per call in small-op NumPy; per view-entry it dominated
    # the keyframe assembly at hundreds of pending tracks x views)
    cam_cache = {}

    def _cam(f):
        c = cam_cache.get(f.id)
        if c is None:
            qc, pc = f.get_pose(q_bc, p_bc)
            qcw_f = qconj(qc)
            c = cam_cache[f.id] = (qcw_f, -qrot(qcw_f, pc))
        return c

    for ti, t in enumerate(tracks):
        vi = 0
        for fid, k in t.obs.items():
            f = frames_by_id.get(fid)
            if f is None or vi >= V:
                continue
            if solved_frame_id is not None and fid == solved_frame_id:
                us[ti, vi] = 1.0
            else:
                qcw[ti, vi], pcw[ti, vi] = _cam(f)
            b[ti, vi] = f.bearings[k]
            m[ti, vi] = 1.0
            vi += 1
    return b, qcw, pcw, m, us


def triangulate_tracks(
    tracks: List[Track], frames_by_id: Dict[int, Frame], calib: CalibArrays, caps: Caps
):
    """Batched N-view DLT over all given tracks (reference track.cpp:46-76).

    Returns (points (N,3), ok (N,)) in world frame."""
    n = len(tracks)
    if n == 0:
        return np.zeros((0, 3)), np.zeros(0, bool)
    b, qcw, pcw, m, _ = assemble_triangulation(tracks, frames_by_id, calib, caps)
    pts, ok = fetch(_triangulate_batch(
        jnp.asarray(b), jnp.asarray(qcw), jnp.asarray(pcw), jnp.asarray(m)
    ))
    return pts[:n], ok[:n]


@jax.jit
def _fused_localize_triangulate_jit(pa_loc, b, qcw, pcw, m, us, calib,
                                    max_iterations):
    """Localize solve chained into batched triangulation: the solved frame's
    camera pose replaces the flagged view rows on-device (reference
    track() :101-125 then track_landmark :204-224 for the keyframe path)."""
    from rd_vio_tpu.ops.lie import quat_conj, quat_mul, quat_rotate

    s_loc, invd_loc, pb_loc = _finalize_problem(pa_loc, calib, None, False)
    res = ba.solve_ba(s_loc, invd_loc, pb_loc, max_iterations=max_iterations)

    # triangulation stays f64 (DLT conditioning; reference uses double)
    q0 = res.states.q[0].astype(jnp.float64)
    p0 = res.states.p[0].astype(jnp.float64)
    qc = quat_mul(q0, calib.ext.q_bc)
    pc = p0 + quat_rotate(q0, calib.ext.p_bc)
    qcw_j = quat_conj(qc)
    pcw_j = -quat_rotate(qcw_j, pc)
    sel = us[..., None] > 0
    qcw = jnp.where(sel, qcw_j[None, None, :], qcw)
    pcw = jnp.where(sel, pcw_j[None, None, :], pcw)
    pts, ok = jax.vmap(tri.triangulate_homogeneous)(b, qcw, pcw, m)
    return res, pts, ok


def solve_localize_triangulate(
    spec_loc: BASpec, tracks: List[Track], frames_by_id: Dict[int, Frame],
    calib: CalibArrays, caps_fast: Caps, caps: Caps, dtype=None,
    max_iterations: int = 10,
):
    """Fused keyframe-path head: localization solve + triangulation of the new
    keyframe's pending tracks in ONE dispatch + ONE fetch.

    Applies the localized state to spec_loc.frames[0] and returns
    (points (N,3), ok (N,)) for `tracks`."""
    n = len(tracks)
    solved_fid = spec_loc.frames[0].id
    pa, _ = _assemble(spec_loc, caps_fast, calib)
    pa = _cast_pa(pa, dtype)
    b, qcw, pcw, m, us = assemble_triangulation(
        tracks, frames_by_id, calib, caps, solved_frame_id=solved_fid
    )
    res, pts, ok = _fused_localize_triangulate_jit(
        pa, jnp.asarray(b), jnp.asarray(qcw), jnp.asarray(pcw),
        jnp.asarray(m), jnp.asarray(us), calib.tree,
        max_iterations=max_iterations,
    )
    s = res.states
    q, p, v, bg, ba_, pts_h, ok_h = fetch(
        (s.q, s.p, s.v, s.bg, s.ba, pts, ok)
    )
    fj = spec_loc.frames[0]
    fj.q, fj.p, fj.v, fj.bg, fj.ba = q[0], p[0], v[0], bg[0], ba_[0]
    return pts_h[:n], ok_h[:n]


# ---------------------------------------------------------------------------
# landmark point <-> inverse depth (reference track.cpp:90-101)
# ---------------------------------------------------------------------------


def get_landmark_point(track: Track, frames_by_id, calib: CalibArrays):
    fid = track.first_frame_id()
    f = frames_by_id[fid]
    qc, pc = f.get_pose(calib.q_bc_h, calib.p_bc_h)
    z = f.bearings[track.obs[fid]]
    return qrot(qc, z / track.inv_depth) + pc


def get_landmark_points_batch(tracks: List[Track], frames_by_id, calib: CalibArrays):
    """World points of many tracks at once (anchor camera poses computed once
    per distinct anchor frame; the per-track quat math of get_landmark_point
    costs ~0.1-0.3 ms each in small-op NumPy). The anchor keypoint index is
    gathered through the anchor frame's row->keypoint reverse map (SoA
    store), not per-track obs dict lookups; the per-anchor loop only fills
    shared row maps — the point math is one einsum over all tracks."""
    out = np.zeros((len(tracks), 3))
    if not tracks:
        return out
    st = tracks[0].store
    rows = np.array([t.row for t in tracks], np.int64)
    aids = st.first_fid[rows]
    invd = st.inv_depth[rows]
    uaids, inv = np.unique(aids, return_inverse=True)
    Rs = np.empty((len(uaids), 3, 3))
    ps = np.empty((len(uaids), 3))
    bearing_of_row = np.zeros((st.cap, 3))
    for ui, aid in enumerate(uaids):
        f = frames_by_id[int(aid)]
        qc, pc = f.get_pose(calib.q_bc_h, calib.p_bc_h)
        Rs[ui] = q_to_R(qc)
        ps[ui] = pc
        fr = st.rows_of(f.track_ids)
        # only rows ANCHORED at this frame: a track observed by several of
        # the anchor frames must keep its own anchor's bearing (a plain
        # fv-masked write would let the last-iterated observer win)
        msk = (fr >= 0) & (st.first_fid[np.clip(fr, 0, None)] == f.id)
        bearing_of_row[fr[msk]] = f.bearings[msk]
    z = bearing_of_row[rows] / np.maximum(invd, 1e-12)[:, None]
    out[:] = np.einsum("nij,nj->ni", Rs[inv], z) + ps[inv]
    return out


def set_landmark_point(track: Track, x_world, frames_by_id, calib: CalibArrays):
    fid = track.first_frame_id()
    f = frames_by_id[fid]
    qc, pc = f.get_pose(calib.q_bc_h, calib.p_bc_h)
    d = np.linalg.norm(qrot(qconj(qc), asnp(x_world) - pc))
    track.inv_depth = 1.0 / max(d, 1e-9)
