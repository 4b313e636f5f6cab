"""Distributed sliding-window BA: landmark blocks sharded across a device
mesh, Schur reduction via psum, replicated dense camera solve.

This is the multi-chip component SURVEY.md §2 lists as having **no reference
counterpart** (the reference is single-threaded CPU): the design follows the
north-star in BASELINE.json — per-shard landmark-block reduction -> one `psum`
of the (W*15)^2 camera Hessian/gradient (~300 KB, trivially cheap over ICI) ->
replicated dense Cholesky -> local landmark back-substitution.

Sharding layout (host builder guarantees it):
- reprojection factor arrays: sharded over the observation axis, with all
  observations of a landmark placed in the same shard;
- landmark arrays (inv_depth, opt_lm): sharded over L, indices shard-local;
- frame states, IMU factors, rotation priors, marginalization prior: replicated
  (the window is tiny — SURVEY.md §5 "pose state stays replicated").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rd_vio_tpu.estimation import ba
from rd_vio_tpu.estimation.state import ES_SIZE, FrameStates, retract


LM_AXIS = "lm"


def make_vio_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (LM_AXIS,))


def relayout_for_sharding(invd, pb: ba.BAProblem, n_shards: int):
    """Host-side re-layout so shard k owns landmark slots [k*L/n, (k+1)*L/n)
    and exactly the observation rows referencing them (padded per shard).

    Returns (invd, pb, new_slot) with permuted landmark slots and observation
    rows; new_slot[old_slot] gives the relocated landmark slot so callers can
    map results back.
    """
    import numpy as np

    L = int(invd.shape[0])
    O = int(pb.reproj.tgt.shape[0])
    assert L % n_shards == 0 and O % n_shards == 0
    L_loc, O_loc = L // n_shards, O // n_shards

    lm = np.asarray(pb.reproj.lm)
    valid = np.asarray(pb.reproj.valid)
    opt_lm = np.asarray(pb.opt_lm)
    invd_h = np.asarray(invd)

    # observation count per landmark (vectorized — this runs per solve when a
    # dist mesh is active, so no per-observation Python loops)
    counts = np.bincount(lm[valid], minlength=L)
    active = np.flatnonzero(counts > 0)
    order = active[np.argsort(-counts[active], kind="stable")]

    # greedy balanced assignment, biggest landmarks first (loop over <=L
    # active landmarks only; each step picks the least-loaded feasible shard)
    shard_of_lm = np.full(L, -1, np.int64)
    shard_obs = np.zeros(n_shards, np.int64)
    shard_nlm = np.zeros(n_shards, np.int64)
    for l in order:
        c = counts[l]
        feasible = (shard_nlm < L_loc) & (shard_obs + c <= O_loc)
        k = int(np.argmin(np.where(feasible, shard_obs, np.iinfo(np.int64).max)))
        shard_of_lm[l] = k
        shard_obs[k] += c
        shard_nlm[k] += 1

    # landmark permutation: new slot = shard*L_loc + position-within-shard;
    # inactive landmark slots fill the remaining positions in order
    new_slot = np.full(L, -1, np.int64)
    by_shard = np.argsort(shard_of_lm[order], kind="stable")
    placed = order[by_shard]  # active lms grouped by shard
    sh = shard_of_lm[placed]
    pos_in_shard = np.arange(len(placed)) - np.searchsorted(sh, sh)
    new_slot[placed] = sh * L_loc + pos_in_shard
    taken = np.zeros(L, bool)
    taken[new_slot[placed]] = True
    inactive = np.flatnonzero(shard_of_lm < 0)
    new_slot[inactive] = np.flatnonzero(~taken)[: len(inactive)]

    invd_new = np.ones(L)
    opt_new = np.zeros(L, bool)
    invd_new[new_slot] = invd_h
    opt_new[new_slot] = opt_lm

    # observation rows: each shard's rows contiguous from shard*O_loc
    vrows = np.flatnonzero(valid)
    rsh = shard_of_lm[lm[vrows]]
    r_order = np.argsort(rsh, kind="stable")
    vrows = vrows[r_order]
    rsh = rsh[r_order]
    rpos = np.arange(len(vrows)) - np.searchsorted(rsh, rsh)
    dest = rsh * O_loc + rpos
    perm_rows = np.zeros(O, dtype=np.int64)
    row_valid = np.zeros(O, bool)
    perm_rows[dest] = vrows
    row_valid[dest] = True

    def take(a):
        return np.asarray(a)[perm_rows]

    reproj = pb.reproj._replace(
        tgt=jnp.asarray(take(pb.reproj.tgt)),
        ref=jnp.asarray(take(pb.reproj.ref)),
        lm=jnp.asarray(new_slot[take(pb.reproj.lm)].astype(np.int32)),
        z_ref=jnp.asarray(take(pb.reproj.z_ref)),
        z_tgt=jnp.asarray(take(pb.reproj.z_tgt)),
        valid=jnp.asarray(row_valid & take(pb.reproj.valid)),
    )
    return jnp.asarray(invd_new), pb._replace(
        reproj=reproj, opt_lm=jnp.asarray(opt_new)
    ), new_slot


def shard_problem(mesh: Mesh, invd, pb: ba.BAProblem):
    """Device-put the problem with the layout above. Assumes the host builder
    already grouped observations by landmark shard (O and L divisible by the
    mesh size)."""
    shard_O = NamedSharding(mesh, P(LM_AXIS))
    repl = NamedSharding(mesh, P())

    reproj = type(pb.reproj)(
        tgt=jax.device_put(pb.reproj.tgt, shard_O),
        ref=jax.device_put(pb.reproj.ref, shard_O),
        lm=jax.device_put(pb.reproj.lm, shard_O),
        z_ref=jax.device_put(pb.reproj.z_ref, shard_O),
        z_tgt=jax.device_put(pb.reproj.z_tgt, shard_O),
        valid=jax.device_put(pb.reproj.valid, shard_O),
    )
    pb = pb._replace(
        reproj=reproj,
        opt_lm=jax.device_put(pb.opt_lm, shard_O),
        reproj_prior=jax.tree_util.tree_map(
            lambda a: jax.device_put(a, repl), pb.reproj_prior
        ),
        imu=jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), pb.imu),
        imu_prior=jax.tree_util.tree_map(
            lambda a: jax.device_put(a, repl), pb.imu_prior
        ),
        rot=jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), pb.rot),
        prior=jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), pb.prior),
    )
    return jax.device_put(invd, shard_O), pb


def _novis_problem(pb_local):
    """Replicated-rows-only view of the problem: the reprojection arrays are
    collapsed to a 2-row masked dummy. Passing the full local arrays with
    valid=False would still LINEARIZE every vision row a second time per
    iteration — measured as ~half the per-device FLOPs (efficiency 52% at
    every size instead of >85%)."""
    rf = pb_local.reproj
    dummy = type(rf)(
        tgt=rf.tgt[:2], ref=rf.ref[:2], lm=rf.lm[:2] * 0,
        z_ref=rf.z_ref[:2], z_tgt=rf.z_tgt[:2],
        valid=jnp.zeros((2,), bool),
    )
    return pb_local._replace(reproj=dummy)


def _local_vision_system(states, invd_local, pb_local, L_local):
    """Shard-local vision rows -> (Hv, gv, Hll, Hcl, bl, cost_v). Runs inside
    shard_map; landmark indices in pb_local.reproj.lm are shard-local."""
    W = states.q.shape[0]
    D = W * ES_SIZE
    dtype = states.q.dtype
    r_v, Jc_v, Jl_v = ba.linearize_reprojection(states, invd_local, pb_local)
    s_v = jnp.sum(r_v * r_v, axis=-1)
    valid = pb_local.reproj.valid
    cost_v = jnp.sum(jnp.where(valid, jnp.log1p(s_v), 0.0))
    w_v = jnp.where(valid, 1.0 / (1.0 + s_v), 0.0)
    sw = jnp.sqrt(w_v)[:, None]
    Jl_v = Jl_v * pb_local.opt_lm[pb_local.reproj.lm].astype(dtype)[:, None]
    rv = (r_v * sw).reshape(-1)
    Jv = (Jc_v * sw[..., None]).reshape(-1, D)
    Jlv = (Jl_v * sw).reshape(-1)
    rows = jnp.repeat(pb_local.reproj.lm, 2)
    Hv = Jv.T @ Jv
    gv = Jv.T @ rv
    Hll = jax.ops.segment_sum(Jlv * Jlv, rows, num_segments=L_local)
    bl = jax.ops.segment_sum(Jlv * rv, rows, num_segments=L_local)
    Hcl = jax.ops.segment_sum(Jlv[:, None] * Jv, rows, num_segments=L_local)
    return Hv, gv, Hll, Hcl, bl, cost_v


def solve_ba_sharded(states: FrameStates, invd, pb: ba.BAProblem, mesh: Mesh,
                     max_iterations: int = 10):
    """LM solve with the vision/landmark work sharded over the mesh.

    Returns (states, invd_sharded, cost). Numerically equivalent to
    ba.solve_ba up to reduction order."""
    W = states.q.shape[0]
    D = W * ES_SIZE
    n_shards = mesh.shape[LM_AXIS]
    L_local = invd.shape[0] // n_shards

    reproj_spec = type(pb.reproj)(
        tgt=P(LM_AXIS), ref=P(LM_AXIS), lm=P(LM_AXIS),
        z_ref=P(LM_AXIS), z_tgt=P(LM_AXIS), valid=P(LM_AXIS),
    )
    pb_spec = ba.BAProblem(
        reproj=reproj_spec,
        reproj_prior=jax.tree_util.tree_map(lambda _: P(), pb.reproj_prior),
        imu=jax.tree_util.tree_map(lambda _: P(), pb.imu),
        imu_prior=jax.tree_util.tree_map(lambda _: P(), pb.imu_prior),
        rot=jax.tree_util.tree_map(lambda _: P(), pb.rot),
        prior=jax.tree_util.tree_map(lambda _: P(), pb.prior),
        prior_valid=P(), ext=jax.tree_util.tree_map(lambda _: P(), pb.ext),
        sqrt_inv_cov2=P(),
        opt_pose=P(), opt_motion=P(), opt_lm=P(LM_AXIS),
    )
    states_spec = jax.tree_util.tree_map(lambda _: P(), states)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(states_spec, P(LM_AXIS), pb_spec),
        out_specs=(states_spec, P(LM_AXIS), P()),
        # the returned states/cost are numerically replicated (every shard
        # derives them from psum'd quantities) but the vma type system cannot
        # prove it through the accept/reject scan
        check_vma=False,
    )
    def _solve(states, invd_local, pb_local):
        dtype = states.q.dtype
        # landmark indices arrive global; each shard owns a contiguous chunk,
        # so the local slot is simply (global mod L_local)
        pb_local = pb_local._replace(
            reproj=pb_local.reproj._replace(lm=pb_local.reproj.lm % L_local)
        )
        cmask = ba._col_mask(pb_local, W, dtype)

        def eval_cost(s, idl):
            rf = pb_local.reproj
            from rd_vio_tpu.estimation import factors as Fct

            q_t, p_t = s.q[rf.tgt], s.p[rf.tgt]
            q_r, p_r = s.q[rf.ref], s.p[rf.ref]
            idp = jnp.maximum(idl[rf.lm], 1e-12)
            r_v = jax.vmap(
                lambda a, b, c, d, e, f, g: Fct.reprojection_residual(
                    a, b, c, d, e, f, g, pb_local.ext, pb_local.sqrt_inv_cov2
                )
            )(q_t, p_t, q_r, p_r, idp, rf.z_ref, rf.z_tgt)
            s_v = jnp.sum(r_v * r_v, axis=-1)
            c_v = jax.lax.psum(
                jnp.sum(jnp.where(rf.valid, jnp.log1p(s_v), 0.0)), LM_AXIS
            )
            # replicated parts: reuse single-device cost on the collapsed
            # no-vision problem (2 dummy reproj rows, not O/n masked rows)
            c_rest = ba.compute_cost(s, idl, _novis_problem(pb_local)) * 2.0  # 0.5 undone below
            return 0.5 * c_v + 0.5 * c_rest

        def cond(carry):
            s, idl, lam, cost, n_acc, it, done = carry
            return (it < max_iterations) & ~done

        def body(carry):
            s, idl, lam, cost, n_acc, it, done = carry
            # shard-local vision normal equations
            Hv, gv, Hll, Hcl, bl, _ = _local_vision_system(s, idl, pb_local, L_local)
            # replicated rows (imu + rot + prior): collapsed no-vision problem
            # — a masked full-size problem would re-linearize all O/n vision
            # rows here, doubling per-device work
            H_r, g_r, _, _, _, _ = ba.build_normal_system(
                s, idl, _novis_problem(pb_local)
            )
            # masked columns on the vision part too
            Hv = Hv * (cmask[:, None] * cmask[None, :])
            gv = gv * cmask
            Hcl = Hcl * cmask[None, :]
            H = jax.lax.psum(Hv, LM_AXIS) + H_r
            g = jax.lax.psum(gv, LM_AXIS) + g_r

            # damped Schur: local landmark reduction, psum'd camera correction
            diagH = jnp.diag(H)
            Hd = H + lam * jnp.diag(diagH) + 1e-12 * jnp.eye(D, dtype=dtype)
            Hll_d = Hll * (1.0 + lam) + 1e-12
            lm_on = pb_local.opt_lm & (Hll > 1e-12)
            inv_Hll = jnp.where(lm_on, 1.0 / Hll_d, 0.0)
            corrH = jax.lax.psum(Hcl.T @ (Hcl * inv_Hll[:, None]), LM_AXIS)
            corrg = jax.lax.psum(Hcl.T @ (bl * inv_Hll), LM_AXIS)
            Hred = Hd - corrH
            gred = g - corrg
            Hred = Hred * (cmask[:, None] * cmask[None, :]) + jnp.diag(1.0 - cmask)
            gred = gred * cmask
            Lc = jnp.linalg.cholesky(Hred)
            y = jax.scipy.linalg.solve_triangular(Lc, -gred, lower=True)
            dc = jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)
            dc = jnp.where(jnp.isfinite(dc), dc, 0.0) * cmask
            dl = -(bl + Hcl @ dc) * inv_Hll  # local landmarks

            s_new = retract(s, dc.reshape(W, ES_SIZE))
            idl_new = idl + dl * pb_local.opt_lm.astype(dtype)
            cost_new = eval_cost(s_new, idl_new)
            accept = (cost_new < cost) & jnp.isfinite(cost_new)
            # same early-termination tests as the single-device solve_ba
            # (Ceres defaults: function_tolerance 1e-6 on an accepted step's
            # relative decrease, parameter_tolerance 1e-8 on the step size);
            # dc/cost derive from psum'd quantities so every shard agrees
            rel_decrease = (cost - cost_new) / jnp.maximum(
                cost, jnp.finfo(dtype).tiny
            )
            step_small = jnp.max(jnp.abs(dc)) < 1e-8
            done = (accept & (rel_decrease < 1e-6)) | step_small
            s = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, b, a), s, s_new)
            idl = jnp.where(accept, idl_new, idl)
            cost = jnp.where(accept, cost_new, cost)
            lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9),
                            jnp.minimum(lam * 4.0, 1e8))
            return (s, idl, lam, cost, n_acc + accept.astype(jnp.int32),
                    it + 1, done)

        cost0 = eval_cost(states, invd_local)
        # mark replicated carry components as varying over the mesh axis so
        # the while_loop carry type is stable (shard_map vma rule)
        vary = lambda x: jax.lax.pcast(x, (LM_AXIS,), to="varying")
        init = (
            jax.tree_util.tree_map(vary, states),
            invd_local,
            vary(jnp.asarray(1e-4, states.q.dtype)),
            cost0,
            vary(jnp.asarray(0, jnp.int32)),
            vary(jnp.asarray(0, jnp.int32)),
            vary(jnp.asarray(False)),
        )
        s, idl, lam, cost, n_acc, it, done = jax.lax.while_loop(
            cond, body, init
        )
        return s, idl, cost

    return _solve(states, invd, pb)
