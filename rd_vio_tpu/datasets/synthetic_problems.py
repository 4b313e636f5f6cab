"""Build BA window problems from synthetic sequences (used by tests, the
driver entry points, and bench.py)."""

import numpy as np
import jax.numpy as jnp

from rd_vio_tpu.datasets import synthetic
from rd_vio_tpu.estimation import ba, factors as F
from rd_vio_tpu.estimation.state import FrameStates
from rd_vio_tpu.ops import preintegration as pre


def identity_ext(dtype=np.float64):
    return F.Extrinsics(
        q_bc=jnp.asarray([1.0, 0, 0, 0], dtype),
        p_bc=jnp.zeros(3, dtype),
        q_bi=jnp.asarray([1.0, 0, 0, 0], dtype),
        p_bi=jnp.zeros(3, dtype),
    )


def build_window_problem(
    seq: synthetic.SyntheticSequence,
    f0: int,
    W: int,
    L_max: int = 256,
    O_max: int = 2048,
    sigma_px: float = 0.7,
    dtype=np.float64,
):
    """Build (states_gt, inv_depth_gt, BAProblem) for frames [f0, f0+W)."""
    Km = seq.K_mat
    frames = list(range(f0, f0 + W))

    # ground-truth states
    states = FrameStates(
        q=jnp.asarray(seq.q_wb[frames], dtype),
        p=jnp.asarray(seq.p_wb[frames], dtype),
        v=jnp.asarray(seq.v_wb[frames], dtype),
        bg=jnp.zeros((W, 3), dtype),
        ba=jnp.zeros((W, 3), dtype),
    )

    # landmark table: ids seen in >= 2 frames of the window
    seen = {}
    for wi, f in enumerate(frames):
        for k in range(seq.kp_id.shape[1]):
            lid = seq.kp_id[f, k]
            if lid < 0:
                continue
            seen.setdefault(lid, []).append((wi, k))
    track_ids = [lid for lid, obs in seen.items() if len(obs) >= 2][:L_max]

    def bearing(f, k):
        pix = seq.kp_pixel[f, k]
        b = np.array([(pix[0] - Km[0, 2]) / Km[0, 0], (pix[1] - Km[1, 2]) / Km[1, 1], 1.0])
        return b / np.linalg.norm(b)

    inv_depth = np.ones(L_max)
    obs_tgt, obs_ref, obs_lm, z_ref, z_tgt = [], [], [], [], []
    for li, lid in enumerate(track_ids):
        obs = seen[lid]
        wi_ref, k_ref = obs[0]
        f_ref = frames[wi_ref]
        b_ref = bearing(f_ref, k_ref)
        # gt inverse depth along the anchor bearing
        Rr = np.asarray(
            synthetic._quat_to_R(seq.q_wb[f_ref])
        )
        x_cam = Rr.T @ (seq.landmarks[lid] - seq.p_wb[f_ref])
        inv_depth[li] = 1.0 / np.linalg.norm(x_cam)
        for wi, k in obs[1:]:
            obs_tgt.append(wi)
            obs_ref.append(wi_ref)
            obs_lm.append(li)
            z_ref.append(b_ref)
            z_tgt.append(bearing(frames[wi], k))

    O = len(obs_tgt)
    assert O <= O_max, (O, O_max)
    tgt_a = np.zeros(O_max, np.int32)
    ref_a = np.zeros(O_max, np.int32)
    lm_a = np.zeros(O_max, np.int32)
    zr_a = np.tile([0.0, 0.0, 1.0], (O_max, 1))  # unit-z padding avoids 0-div
    zt_a = np.tile([0.0, 0.0, 1.0], (O_max, 1))
    tgt_a[:O], ref_a[:O], lm_a[:O] = obs_tgt, obs_ref, obs_lm
    if O:
        zr_a[:O] = np.asarray(z_ref)
        zt_a[:O] = np.asarray(z_tgt)
    reproj = F.ReprojFactors(
        tgt=jnp.asarray(tgt_a), ref=jnp.asarray(ref_a), lm=jnp.asarray(lm_a),
        z_ref=jnp.asarray(zr_a, dtype), z_tgt=jnp.asarray(zt_a, dtype),
        valid=jnp.asarray(np.arange(O_max) < O),
    )

    # IMU factors between consecutive frames
    covs = [jnp.eye(3) * c for c in [2.9e-8, 4e-6, 3.8e-10, 9e-6]]
    deltas, sics = [], []
    for wi in range(W - 1):
        t0, t1 = seq.t_frame[frames[wi]], seq.t_frame[frames[wi + 1]]
        m = (seq.t_imu >= t0 - 1e-9) & (seq.t_imu < t1 - 1e-9)
        ts = seq.t_imu[m]
        dts = np.diff(np.concatenate([ts, [t1]]))
        d = pre.integrate(
            jnp.asarray(dts), jnp.asarray(seq.gyro[m]), jnp.asarray(seq.accel[m]),
            jnp.zeros(3), jnp.zeros(3), *covs
        )
        deltas.append(d)
        sics.append(pre.sqrt_inv_cov(d.cov + 1e-14 * jnp.eye(15)))
    import jax

    deltas_tree = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *deltas)
    imu = F.ImuFactors(
        i=jnp.arange(W - 1, dtype=jnp.int32),
        j=jnp.arange(1, W, dtype=jnp.int32),
        delta=deltas_tree,
        sqrt_inv_cov=jnp.stack(sics),
        bg0=jnp.zeros((W - 1, 3), dtype),
        ba0=jnp.zeros((W - 1, 3), dtype),
        valid=jnp.ones(W - 1, bool),
    )

    rot = F.RotFactors(
        tgt=jnp.zeros(1, jnp.int32),
        q_ref=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (1, 1)),
        z_ref=jnp.tile(jnp.asarray([0.0, 0, 1], dtype), (1, 1)),
        z_tgt=jnp.tile(jnp.asarray([0.0, 0, 1], dtype), (1, 1)),
        valid=jnp.zeros(1, bool),
    )

    prior = F.initial_prior(W, states)
    sic2 = jnp.asarray(
        np.diag([Km[0, 0] / sigma_px, Km[1, 1] / sigma_px]), dtype
    )
    pb = ba.BAProblem(
        reproj=reproj, reproj_prior=F.empty_reproj_prior(), imu=imu,
        imu_prior=F.empty_imu_prior(), rot=rot, prior=prior,
        prior_valid=jnp.asarray(True),
        ext=identity_ext(), sqrt_inv_cov2=sic2,
        opt_pose=jnp.ones(W, bool), opt_motion=jnp.ones(W, bool),
        opt_lm=jnp.asarray(np.arange(L_max) < len(track_ids)),
    )
    return states, jnp.asarray(inv_depth, dtype), pb, len(track_ids), O
