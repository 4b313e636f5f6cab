"""On-chip validation + microbenchmark: Pallas LK kernel vs the XLA tracker.

Runs BOTH trackers compiled on the current JAX backend (run without
JAX_PLATFORMS to get the TPU), checks flow/status agreement at EuRoC frame
size, and times steady-state device latency (dispatch excluded via
block_until_ready batching). This is the VERDICT round-1 item: the Pallas
kernel must be validated and timed on real hardware, not interpret mode.

Usage:
  python scripts/bench_klt.py            # TPU (via axon tunnel)
  JAX_PLATFORMS=cpu python scripts/bench_klt.py --interpret  # CPU sanity

Prints a markdown table (pasted into BASELINE.md).
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

from rd_vio_tpu.ops.image import klt, klt_pallas, pyramid  # noqa: E402

H, W = 480, 752  # EuRoC cam0 size
N_KP = 256
SHIFT = (3.3, -2.4)


def _textured(rng, shift=(0.0, 0.0)):
    """Smooth random texture with sub-pixel shift (same recipe as the e2e
    renderer: band-limited noise so LK has gradients everywhere)."""
    base = rng.standard_normal((H // 4 + 8, W // 4 + 8))
    # upsample x4 with bilinear for smoothness
    img = np.kron(base, np.ones((4, 4)))
    from scipy.ndimage import gaussian_filter, shift as ndshift

    img = gaussian_filter(img, 3.0)
    img = ndshift(img, (shift[1], shift[0]), order=3, mode="nearest")
    img = img[: H + 0, : W + 0]
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255.0
    return img.astype(np.float32)


def main():
    interpret = "--interpret" in sys.argv
    rng = np.random.default_rng(648)
    img1 = _textured(rng)
    rng2 = np.random.default_rng(648)
    img2 = _textured(rng2, shift=SHIFT)

    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 3)
    pyr2 = pyramid.build_pyramid(jnp.asarray(img2), 3)
    pyr1 = [p.block_until_ready() for p in pyr1]
    pyr2 = [p.block_until_ready() for p in pyr2]

    pts = np.stack(
        [
            rng.uniform(40, W - 40, N_KP),
            rng.uniform(40, H - 40, N_KP),
        ],
        axis=-1,
    ).astype(np.float32)
    jpts = jnp.asarray(pts)
    valid = jnp.ones(N_KP, bool)

    def run_xla():
        tr, st = klt.lk_track_pyramid(pyr1, pyr2, jpts, jpts, valid)
        st = klt.lk_reverse_check(pyr1, pyr2, jpts, tr, st)
        return tr.block_until_ready(), st.block_until_ready()

    def run_gather():
        tr, st = klt.lk_track_pyramid_gather(pyr1, pyr2, jpts, jpts, valid)
        back, st_b = klt.lk_track_pyramid_gather(pyr2, pyr1, tr, jpts, st)
        err = jnp.linalg.norm(back - jpts, axis=-1)
        st = st & st_b & (err <= 0.5)
        return tr.block_until_ready(), st.block_until_ready()

    def run_pallas():
        tr, st = klt_pallas.lk_track_pyramid_pallas(
            pyr1, pyr2, jpts, jpts, valid, interpret=interpret or None
        )
        st = klt_pallas.lk_reverse_check_pallas(
            pyr1, pyr2, jpts, tr, st, interpret=interpret or None
        )
        return tr.block_until_ready(), st.block_until_ready()

    print(f"[bench_klt] backend={jax.default_backend()} "
          f"N={N_KP} img={W}x{H} interpret={interpret}", file=sys.stderr)

    # --- correctness on this backend ---------------------------------
    tr_x, st_x = run_xla()
    tr_p, st_p = run_pallas()
    st_x, st_p = np.asarray(st_x), np.asarray(st_p)
    both = st_x & st_p
    gt = pts + np.asarray(SHIFT)
    err_x = np.linalg.norm(np.asarray(tr_x)[both] - gt[both], axis=-1)
    err_p = np.linalg.norm(np.asarray(tr_p)[both] - gt[both], axis=-1)
    dd = np.linalg.norm(np.asarray(tr_p)[both] - np.asarray(tr_x)[both], axis=-1)
    agree = (st_x == st_p).mean()
    print(
        f"[bench_klt] survived: xla={st_x.mean():.2f} pallas={st_p.mean():.2f} "
        f"status-agree={agree:.3f}", file=sys.stderr,
    )
    print(
        f"[bench_klt] median GT err: xla={np.median(err_x):.3f} px "
        f"pallas={np.median(err_p):.3f} px; median xla-vs-pallas flow diff "
        f"{np.median(dd):.4f} px", file=sys.stderr,
    )
    ok = (
        st_p.mean() > 0.5
        and agree > 0.9
        and np.median(dd) < 0.2
        and np.median(err_p) < 0.5
    )

    # --- timing -------------------------------------------------------
    # On the tunneled TPU block_until_ready does NOT wait (returns ~0.1 ms
    # regardless of queue depth) — per-call timing lies. Chain `reps` tracker
    # calls device-to-device (tracked output feeds the next call's points)
    # and device_get ONCE: wall = reps * t_device + 1 fetch round trip
    # (~25 ms), measured separately with a 1-step chain and subtracted.
    def timeit_chained(step, reps=20):
        jax.device_get(step(jpts))  # warm compile + transfer path
        t0 = time.perf_counter()
        jax.device_get(step(jpts))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        p = jpts
        for _ in range(reps):
            p = step(p)
        jax.device_get(p)
        return (time.perf_counter() - t0 - rtt) / (reps - 1) * 1e3

    def chain_xla(p):
        tr, st = klt.lk_track_pyramid(pyr1, pyr2, p, p, valid)
        st = klt.lk_reverse_check(pyr1, pyr2, p, tr, st)
        return jnp.clip(tr + jnp.where(st, 0.0, 1e-3)[:, None], 40.0, 400.0)

    def chain_gather(p):
        tr, st = klt.lk_track_pyramid_gather(pyr1, pyr2, p, p, valid)
        return jnp.clip(tr + jnp.where(st, 0.0, 1e-3)[:, None], 40.0, 400.0)

    def chain_pallas(p):
        tr, st = klt_pallas.lk_track_pyramid_pallas(
            pyr1, pyr2, p, p, valid, interpret=interpret or None)
        st = klt_pallas.lk_reverse_check_pallas(
            pyr1, pyr2, p, tr, st, interpret=interpret or None)
        return jnp.clip(tr + jnp.where(st, 0.0, 1e-3)[:, None], 40.0, 400.0)

    ms_x = timeit_chained(chain_xla)
    ms_p = timeit_chained(chain_pallas)
    ms_g = (timeit_chained(chain_gather)
            if "--no-gather" not in sys.argv else float("nan"))

    print("| tracker | fwd+rev ms (EuRoC frame, 256 kp) | median GT err px |")
    print("|---|---|---|")
    print(f"| XLA windowed (ops/image/klt) | {ms_x:.2f} | {np.median(err_x):.3f} |")
    print(f"| XLA gather (legacy) | {ms_g:.2f} | - |")
    print(f"| Pallas (ops/image/klt_pallas) | {ms_p:.2f} | {np.median(err_p):.3f} |")
    print(f"validated={'OK' if ok else 'FAIL'} backend={jax.default_backend()}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
