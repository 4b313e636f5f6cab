"""Scaling-efficiency benchmark for the distributed Schur BA (VERDICT r02
item 5; SURVEY.md §5 landmark parallelism).

Measures, at growing landmark/observation counts on the virtual 8-device CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8):

  1. wall-clock of `ba.solve_ba` (single device) vs `dist_ba.solve_ba_sharded`
     at n_shards in {2, 4, 8};
  2. per-device FLOPs from XLA cost analysis for both programs — on this
     2-core box all 8 virtual devices timeshare the same silicon, so
     wall-clock cannot show real multi-chip speedup; the defensible
     scaling-efficiency number in the compute-bound limit is
         eff(n) = flops_single / (n * flops_per_device(n))
     which captures exactly what real chips would divide (vision rows +
     landmark Schur) vs what stays replicated (camera solve + collectives).

Synthetic geometry is generated directly (random anchors/bearings/depths over
a W=13 pose arc) rather than via SyntheticSequence, which caps keypoints per
frame far below the 64k-landmark sizes exercised here.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/bench_scaling.py [--quick]
Prints a markdown table (pasted into BASELINE.md).
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rd_vio_tpu.datasets.synthetic_problems import identity_ext  # noqa: E402
from rd_vio_tpu.estimation import ba, factors as F  # noqa: E402
from rd_vio_tpu.estimation.state import ES_SIZE, FrameStates, retract  # noqa: E402
from rd_vio_tpu.parallel import dist_ba  # noqa: E402

W = 13
MAX_IT = 6


def _quat_yaw(a):
    return np.stack([np.cos(a / 2), 0 * a, 0 * a, np.sin(a / 2)], axis=-1)


def build_problem(L, O, seed=648, dtype=np.float64):
    """Random consistent vision-only window problem: W poses on an arc, L
    anchored inverse-depth landmarks, O reprojection observations."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 0.3, W)
    p = np.stack([np.sin(ang) * 2.0, np.cos(ang) * 2.0 - 2.0, 0 * ang], -1)
    q = _quat_yaw(ang * 0.5)
    states = FrameStates(
        q=jnp.asarray(q, dtype), p=jnp.asarray(p, dtype),
        v=jnp.zeros((W, 3), dtype), bg=jnp.zeros((W, 3), dtype),
        ba=jnp.zeros((W, 3), dtype),
    )

    def R_of(qq):
        w, x, y, z = qq[..., 0], qq[..., 1], qq[..., 2], qq[..., 3]
        return np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ], -2)

    anchors = rng.integers(0, W - 1, L)
    b_ref = rng.normal(size=(L, 3)) * np.array([0.3, 0.3, 0.0]) + np.array([0, 0, 1.0])
    b_ref /= np.linalg.norm(b_ref, axis=-1, keepdims=True)
    depth = rng.uniform(2.0, 10.0, L)
    invd = 1.0 / depth
    Rw = R_of(q)  # (W,3,3) body->world
    pts = p[anchors] + np.einsum("nij,nj->ni", Rw[anchors], b_ref * depth[:, None])

    # observations: round-robin landmarks, random non-anchor target frames
    per = O // L
    assert per >= 1, "need O >= L"
    lm = np.repeat(np.arange(L), per)[:O]
    tgt = rng.integers(0, W, O)
    tgt = np.where(tgt == anchors[lm], (tgt + 1) % W, tgt)
    x_cam = np.einsum("nji,nj->ni", Rw[tgt], pts[lm] - p[tgt])
    x_cam[:, 2] = np.maximum(x_cam[:, 2], 0.5)
    z_tgt = x_cam / np.linalg.norm(x_cam, axis=-1, keepdims=True)
    z_tgt += rng.normal(size=z_tgt.shape) * 5e-4
    z_tgt /= np.linalg.norm(z_tgt, axis=-1, keepdims=True)

    reproj = F.ReprojFactors(
        tgt=jnp.asarray(tgt, jnp.int32), ref=jnp.asarray(anchors[lm], jnp.int32),
        lm=jnp.asarray(lm, jnp.int32),
        z_ref=jnp.asarray(b_ref[lm], dtype), z_tgt=jnp.asarray(z_tgt, dtype),
        valid=jnp.ones(O, bool),
    )
    rot = F.RotFactors(
        tgt=jnp.zeros(1, jnp.int32),
        q_ref=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (1, 1)),
        z_ref=jnp.tile(jnp.asarray([0.0, 0, 1], dtype), (1, 1)),
        z_tgt=jnp.tile(jnp.asarray([0.0, 0, 1], dtype), (1, 1)),
        valid=jnp.zeros(1, bool),
    )
    Kf = 460.0
    sic2 = jnp.asarray(np.diag([Kf / 0.7, Kf / 0.7]), dtype)
    pb = ba.BAProblem(
        reproj=reproj, reproj_prior=F.empty_reproj_prior(),
        imu=_empty_imu(dtype),
        imu_prior=F.empty_imu_prior(), rot=rot,
        prior=F.initial_prior(W, states), prior_valid=jnp.asarray(True),
        ext=identity_ext(), sqrt_inv_cov2=sic2,
        opt_pose=jnp.ones(W, bool).at[0].set(False),
        opt_motion=jnp.ones(W, bool).at[0].set(False),
        opt_lm=jnp.ones(L, bool),
    )
    return states, jnp.asarray(invd, dtype), pb


def _empty_imu(dtype):
    from rd_vio_tpu.ops import preintegration as pre

    n = 1
    zero = pre.PreintDelta(
        t=jnp.zeros(n, dtype), q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (n, 1)),
        p=jnp.zeros((n, 3), dtype), v=jnp.zeros((n, 3), dtype),
        cov=jnp.tile(jnp.eye(15, dtype=dtype), (n, 1, 1)),
        dq_dbg=jnp.zeros((n, 3, 3), dtype), dp_dbg=jnp.zeros((n, 3, 3), dtype),
        dp_dba=jnp.zeros((n, 3, 3), dtype), dv_dbg=jnp.zeros((n, 3, 3), dtype),
        dv_dba=jnp.zeros((n, 3, 3), dtype),
    )
    return F.ImuFactors(
        i=jnp.zeros(n, jnp.int32), j=jnp.ones(n, jnp.int32), delta=zero,
        sqrt_inv_cov=jnp.tile(jnp.eye(15, dtype=dtype), (n, 1, 1)),
        bg0=jnp.zeros((n, 3), dtype), ba0=jnp.zeros((n, 3), dtype),
        valid=jnp.zeros(n, bool),
    )


def perturb(states, invd, seed=5):
    rng = np.random.default_rng(seed)
    d = np.zeros((W, ES_SIZE))
    d[1:, 0:3] = rng.standard_normal((W - 1, 3)) * 0.005
    d[1:, 3:6] = rng.standard_normal((W - 1, 3)) * 0.02
    return retract(states, jnp.asarray(d)), invd * 1.03


def time_call(fn, reps=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def device_flops(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main():
    quick = "--quick" in sys.argv
    sizes = [(4096, 32768)] if quick else [
        (4096, 32768), (16384, 65536), (65536, 131072)]
    shard_counts = [2, 8] if quick else [2, 4, 8]
    rows = []
    for L, O in sizes:
        states_gt, invd_gt, pb = build_problem(L, O)
        states0, invd0 = perturb(states_gt, invd_gt)

        single_fn = jax.jit(
            lambda s, i, p: ba.solve_ba(s, i, p, max_iterations=MAX_IT).states.p
        )
        t1 = time_call(lambda: single_fn(states0, invd0, pb).block_until_ready())
        f1 = device_flops(single_fn.lower(states0, invd0, pb).compile())

        for n in shard_counts:
            mesh = dist_ba.make_vio_mesh(n)
            invd_s, pb_s, _ = dist_ba.relayout_for_sharding(invd0, pb, n)
            invd_dev, pb_dev = dist_ba.shard_problem(mesh, invd_s, pb_s)

            def sharded_fn(s, i, p):
                so, io_, c = dist_ba.solve_ba_sharded(
                    s, i, p, mesh, max_iterations=MAX_IT)
                return so.p, c

            jit_sharded = jax.jit(sharded_fn)
            tn = time_call(
                lambda: jax.block_until_ready(
                    jit_sharded(states0, invd_dev, pb_dev)))
            try:
                fn_dev = device_flops(
                    jit_sharded.lower(states0, invd_dev, pb_dev).compile())
            except Exception as e:  # noqa: BLE001
                print(f"[scaling] cost analysis unavailable: {e}",
                      file=sys.stderr)
                fn_dev = float("nan")
            rows.append((L, O, n, t1, tn, f1, fn_dev))
            print(f"[scaling] L={L} O={O} n={n}: single {t1*1e3:.1f} ms "
                  f"({f1/1e9:.2f} GF), sharded {tn*1e3:.1f} ms "
                  f"({fn_dev/1e9:.2f} GF/dev)", file=sys.stderr, flush=True)

    # eff(n) = f1 / (n * f_dev(n)): parallel efficiency in the compute-bound
    # limit — the fraction of ideal 1/n per-chip work the sharded program
    # achieves (collective + replicated-solve overhead eats the rest)
    print("| L | O | shards | single ms | sharded ms (2-core CPU) | "
          "GFLOP single | GFLOP/device sharded | compute-bound eff |")
    print("|---|---|---|---|---|---|---|---|")
    for L, O, n, t1, tn, f1, fdev in rows:
        eff = f1 / (n * fdev) if fdev == fdev and fdev > 0 else float("nan")
        print(f"| {L} | {O} | {n} | {t1*1e3:.1f} | {tn*1e3:.1f} | "
              f"{f1/1e9:.2f} | {fdev/1e9:.2f} | {eff*100:.0f}% |")


if __name__ == "__main__":
    main()
