"""Attribute the Mosaic bulge-chase per-step cost on the real chip.

The chase is the last wall of the two-stage reduction (ROADMAP,
docs/DESIGN_NOTES_R4.md par 1). This harness times the production kernel
against ablated variants (ops/chase_pallas.bulge_chase_pallas(ablate=...),
all of which return WRONG results by design) to split the measured
~21 us/step (n=4096) / ~80 us/step (n=8192) between:

  full     the production kernel
  batch3   the vmax-batched kernel (one band round trip per 3 timesteps,
           bit-identical outputs -- ops/chase_pallas._chase_kernel_b3)
  nomath   band read + shear + unshear + write only (no reflector math)
  noshear  read + reflector math + write, shears skipped
  aligned  full work, slice start rounded to a sublane multiple
  nowrite  full work minus the band write-back

Usage: python benchmarks/chase_micro.py [n] [modes-csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("EIGSOLVE_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EIGSOLVE_BENCH_PLATFORM"])
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_pallas  # noqa: E402
from eigensolver_gpu_tpu.ops.sb2st import dense_to_band  # noqa: E402
from eigensolver_gpu_tpu.utils.timer import wallclock  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    modes = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["full", "nomath", "noshear", "aligned", "nowrite"]
    )
    b = int(os.environ.get("EIGSOLVE_BAND", "32"))
    steps = 3 * (n - 3) + 1
    log(f"n={n} band={b} steps={steps} devices={jax.devices()}")

    rng = np.random.default_rng(0)
    t = rng.standard_normal((n, n))
    a = jnp.asarray(np.tril(t) + np.tril(t, -1).T, jnp.float32)
    band = dense_to_band(a, b)

    for mode in modes:
        ab = None if mode in ("full", "batch3") else mode
        b3 = mode == "batch3"

        @jax.jit
        def f(bd, ab=ab, b3=b3):
            d, e, vt, taut = bulge_chase_pallas(bd, b, ablate=ab, batch3=b3)
            return jnp.sum(d) + jnp.sum(e) + jnp.sum(vt[0]) + jnp.sum(taut[0])

        t0 = wallclock()
        np.asarray(f(band))
        log(f"{mode}: first (compile+run) {wallclock()-t0:.1f}s")
        times = []
        for _ in range(3):
            t0 = wallclock()
            np.asarray(f(band))
            times.append(wallclock() - t0)
        ms = min(times) * 1e3
        log(f"{mode}: {ms:.1f} ms = {ms*1e3/steps:.2f} us/step")


if __name__ == "__main__":
    main()
