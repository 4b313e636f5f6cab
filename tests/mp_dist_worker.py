"""Worker for the TRUE multi-process distributed-BA test (SURVEY.md §4.5).

Launched as: python tests/mp_dist_worker.py <process_id> <num_processes>
<coordinator_port> <out_file>. Each process contributes 4 virtual CPU
devices; the 8-device global mesh runs solve_ba_sharded across the process
boundary (host data movement, per-process addressable shards — the failure
modes a single-process mesh hides), and each process checks its addressable
results against the single-device solver run locally.
"""

import json
import os
import sys

pid, nproc, port, out_file = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from rd_vio_tpu.datasets import synthetic  # noqa: E402
from rd_vio_tpu.estimation import ba  # noqa: E402
from rd_vio_tpu.estimation.state import ES_SIZE, retract  # noqa: E402
from rd_vio_tpu.parallel import dist_ba  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests import helpers  # noqa: E402

W = 6
N_DEV = 8


def main():
    assert len(jax.devices()) == N_DEV, jax.devices()
    # identical problem on every process (seeded generator)
    seq = synthetic.generate(duration=6.0, n_landmarks=500, max_keypoints=100)
    states_gt, invd_gt, pb, _, _ = helpers.build_window_problem(
        seq, f0=10, W=W, L_max=192, O_max=1024
    )
    pb = pb._replace(
        opt_pose=pb.opt_pose.at[0].set(False),
        opt_motion=pb.opt_motion.at[0].set(False),
    )
    rng = np.random.default_rng(5)
    d = np.zeros((W, ES_SIZE))
    d[1:, 0:3] = rng.standard_normal((W - 1, 3)) * 0.01
    d[1:, 3:6] = rng.standard_normal((W - 1, 3)) * 0.03
    states0 = retract(states_gt, jnp.asarray(d))
    invd0 = jnp.maximum(invd_gt * 1.05, 1e-3)

    invd_s, pb_s, _ = dist_ba.relayout_for_sharding(invd0, pb, N_DEV)

    # single-device reference, computed locally in each process
    ref = ba.solve_ba(states0, invd_s, pb_s, max_iterations=8)

    mesh = dist_ba.make_vio_mesh(N_DEV)
    shard_O = NamedSharding(mesh, P(dist_ba.LM_AXIS))
    repl = NamedSharding(mesh, P())

    def put(x, sharding):
        """Global array from replicated host data — the multi-process path
        (each process materializes only its addressable shards)."""
        h = np.asarray(x)
        return jax.make_array_from_callback(h.shape, sharding, lambda i: h[i])

    reproj = type(pb_s.reproj)(
        **{f: put(getattr(pb_s.reproj, f), shard_O) for f in pb_s.reproj._fields}
    )
    pb_dev = pb_s._replace(
        reproj=reproj,
        opt_lm=put(pb_s.opt_lm, shard_O),
        **{
            f: jax.tree_util.tree_map(lambda a: put(a, repl), getattr(pb_s, f))
            for f in ("reproj_prior", "imu", "imu_prior", "rot", "prior")
        },
    )
    invd_dev = put(invd_s, shard_O)
    states_dev = jax.tree_util.tree_map(lambda a: put(a, repl), states0)

    s_dist, invd_dist, cost_dist = dist_ba.solve_ba_sharded(
        states_dev, invd_dev, pb_dev, mesh, max_iterations=8
    )

    # replicated outputs are addressable everywhere
    p_err = float(np.abs(np.asarray(s_dist.p) - np.asarray(ref.states.p)).max())
    q_err = float(np.abs(np.asarray(s_dist.q) - np.asarray(ref.states.q)).max())
    # sharded landmarks: compare only this process's addressable shards
    opt = np.asarray(pb_s.opt_lm)
    ref_invd = np.asarray(ref.inv_depth)
    lm_err = 0.0
    for sh in invd_dist.addressable_shards:
        sl = sh.index[0]
        m = opt[sl]
        if m.any():
            lm_err = max(
                lm_err,
                float(np.abs(np.asarray(sh.data)[m] - ref_invd[sl][m]).max()),
            )
    ok = p_err < 1e-8 and q_err < 1e-8 and lm_err < 1e-8
    with open(out_file, "w") as f:
        json.dump({"ok": ok, "p_err": p_err, "q_err": q_err,
                   "lm_err": lm_err, "pid": pid,
                   "n_local_devices": jax.local_device_count()}, f)
    jax.distributed.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
