"""On-chip microbenchmark of the device-resident frontend loop components.

Times (steady-state, block_until_ready):
  - ft_loop_step (detect=False / True) at EuRoC geometry, 384-slot cap
  - LK fwd+rev alone (XLA windowed vs Pallas)
  - device Poisson grid-scan alone (384 candidates)
  - GFTT detection alone

Usage: python scripts/bench_frontend_loop.py      # real TPU via tunnel
       JAX_PLATFORMS=cpu python scripts/bench_frontend_loop.py
"""

import os
import sys
import time

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rd_vio_tpu.ops import frontend_loop as fl  # noqa: E402
from rd_vio_tpu.ops.image import klt, klt_pallas, pyramid  # noqa: E402
from rd_vio_tpu.ops.image.gftt import detect_gftt  # noqa: E402
from rd_vio_tpu.ops.poisson_disk import poisson_disk_filter  # noqa: E402

H, W = 480, 752
CAP = 384


def timeit_chained(step, fetch_of, reps=30):
    """True device time per step on the tunneled TPU.

    block_until_ready does NOT round-trip on the axon tunnel (returns in
    ~0.1 ms regardless of queue depth), so per-call timing lies. Instead:
    chain `reps` steps device-to-device (each consumes the previous output)
    and do ONE device_get at the end — wall = reps * t_device + 1 RTT.
    The RTT (~25 ms) is measured separately with a 1-step chain."""
    import jax

    # warm compile + transfer path
    jax.device_get(fetch_of(step(None)))
    t1 = time.perf_counter()
    jax.device_get(fetch_of(step(None)))
    rtt = time.perf_counter() - t1

    t0 = time.perf_counter()
    carry = None
    for _ in range(reps):
        carry = step(carry)
    jax.device_get(fetch_of(carry))
    total = time.perf_counter() - t0
    return (total - rtt) / (reps - 1) * 1e3, rtt * 1e3


def main():
    rng = np.random.default_rng(648)
    from scipy.ndimage import gaussian_filter, shift as ndshift

    base = rng.standard_normal((H // 4 + 8, W // 4 + 8))
    img1 = gaussian_filter(np.kron(base, np.ones((4, 4))), 3.0)[:H, :W]
    img1 = ((img1 - img1.min()) / (np.ptp(img1) + 1e-9) * 255).astype(np.float32)
    img2 = ndshift(img1, (-2.4, 3.3), order=3, mode="nearest").astype(np.float32)

    pyr1 = tuple(p.block_until_ready()
                 for p in pyramid.build_pyramid(jnp.asarray(img1), 3))
    pyr2 = tuple(p.block_until_ready()
                 for p in pyramid.build_pyramid(jnp.asarray(img2), 3))

    pts = np.stack([rng.uniform(40, W - 40, CAP),
                    rng.uniform(40, H - 40, CAP)], -1).astype(np.float32)
    jpts = jnp.asarray(pts)
    valid = jnp.ones(CAP, bool)
    n_act = 200  # realistic occupancy
    valid_act = jnp.asarray(np.arange(CAP) < n_act)

    K = jnp.asarray(
        np.array([[458.0, 0, W / 2], [0, 458.0, H / 2], [0, 0, 1]]), jnp.float32)
    key = jax.random.PRNGKey(0)
    drop = jnp.zeros(CAP, bool)
    R = jnp.eye(3, dtype=jnp.float32)

    state = fl.FTLoopState(pix=jpts, valid=valid_act,
                           life=jnp.where(valid_act, 5, 0).astype(jnp.int32))

    def step_fl(detect, pallas=False):
        def s(carry):
            st = state if carry is None else carry
            st2, _ = fl.ft_loop_step(
                st, pyr1, pyr2, R, key, drop, K, np.float32(0.02),
                detect=detect, max_points=200, min_dist=10.0,
                num_hypotheses=128,
                use_pallas=pallas, interpret=None if pallas else False)
            return st2
        return s, lambda st: st.pix

    def step_lk(pallas):
        fn = (klt_pallas.lk_track_fwd_rev_pallas if pallas
              else klt.lk_track_fwd_rev)
        kw = ({"interpret": None if jax.default_backend() == "tpu" else True}
              if pallas else {})

        def s(carry):
            p = jpts if carry is None else carry
            t, st = fn(pyr1, pyr2, p, p, valid, **kw)
            # keep coords in-frame so the chain stays representative
            return jnp.clip(t, 30.0, 400.0)
        return s, lambda t: t

    def step_poisson():
        def s(carry):
            p = jpts if carry is None else carry
            acc = poisson_disk_filter(
                p, valid, min_distance=10.0, width=float(W), height=float(H))
            return p + acc[:, None].astype(jnp.float32) * 1e-3
        return s, lambda p: p

    def step_gftt():
        def s(carry):
            p = jpts if carry is None else carry
            pix, v, _ = detect_gftt(pyr2[0], p[:200], valid[:200],
                                    max_points=200, min_dist=10.0)
            return jnp.concatenate([pix + 1e-3, p[200:]], axis=0)
        return s, lambda p: p
    print(f"[bench_fl] backend={jax.default_backend()} cap={CAP} "
          f"img={W}x{H}", file=sys.stderr)
    rows = [
        ("ft_loop_step detect=False", step_fl(False)),
        ("ft_loop_step detect=True", step_fl(True)),
        ("ft_loop_step pallas detect=False", step_fl(False, True)),
        ("ft_loop_step pallas detect=True", step_fl(True, True)),
        ("LK fwd+rev XLA (384 kp)", step_lk(False)),
        ("LK fwd+rev Pallas (384 kp)", step_lk(True)),
        ("poisson device scan (384)", step_poisson()),
        ("GFTT detect (200 kp, 1024 cand)", step_gftt()),
    ]
    print("| component | device ms/step | fetch RTT ms |")
    print("|---|---|---|")
    for name, (s, fo) in rows:
        try:
            ms, rtt = timeit_chained(s, fo)
            print(f"| {name} | {ms:.2f} | {rtt:.1f} |", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"| {name} | failed: {str(e)[:120]} | |", flush=True)


if __name__ == "__main__":
    main()
