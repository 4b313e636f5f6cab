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


def timeit(f, reps=20):
    f()
    f()
    t0 = time.perf_counter()
    for _ in range(reps):
        f()
    return (time.perf_counter() - t0) / reps * 1e3


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

    def step(detect, pallas=False):
        s, f = fl.ft_loop_step(
            state, pyr1, pyr2, R, key, drop, K, np.float32(0.02),
            detect=detect, max_points=200, min_dist=10.0, num_hypotheses=128,
            use_pallas=pallas, interpret=None if pallas else False)
        return jax.block_until_ready(f)

    def lk_xla():
        t, s = klt.lk_track_fwd_rev(pyr1, pyr2, jpts, jpts, valid)
        return jax.block_until_ready((t, s))

    def lk_pal():
        t, s = klt_pallas.lk_track_fwd_rev_pallas(
            pyr1, pyr2, jpts, jpts, valid,
            interpret=None if jax.default_backend() == "tpu" else True)
        return jax.block_until_ready((t, s))

    def poisson():
        return poisson_disk_filter(
            jpts, valid, min_distance=10.0, width=float(W), height=float(H)
        ).block_until_ready()

    def gftt():
        p, v, s = detect_gftt(pyr2[0], jpts, valid, max_points=200,
                              min_dist=10.0)
        return jax.block_until_ready((p, v))

    print(f"[bench_fl] backend={jax.default_backend()} cap={CAP} "
          f"img={W}x{H}", file=sys.stderr)
    rows = [
        ("ft_loop_step detect=False", lambda: step(False)),
        ("ft_loop_step detect=True", lambda: step(True)),
        ("ft_loop_step pallas detect=False", lambda: step(False, True)),
        ("LK fwd+rev XLA (384 kp)", lk_xla),
        ("LK fwd+rev Pallas (384 kp)", lk_pal),
        ("poisson device scan (384)", poisson),
        ("GFTT detect (200/1024 cand)", gftt),
    ]
    print("| component | ms |")
    print("|---|---|")
    for name, f in rows:
        try:
            ms = timeit(f)
            print(f"| {name} | {ms:.2f} |")
        except Exception as e:  # noqa: BLE001
            print(f"| {name} | failed: {str(e)[:120]} |")


if __name__ == "__main__":
    main()
