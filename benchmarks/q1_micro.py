"""Attribute apply_q1's cost on the real chip (two-stage back-transform,
ops/sbrd.apply_q1).

At n=8192, m=2048 the WY-4 replay measures ~331 ms against a ~30 ms
gemm+traffic roofline. This sweeps the aggregation ``group`` and also
times the bare group-apply loop with pre-aggregated random factors (no
composition, no vs gather) to split composition cost from the replay
gemm chain. Random factors time identically to real ones.

Usage: python benchmarks/q1_micro.py [n] [m] [groups-csv]
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
from jax import lax  # noqa: E402

from eigensolver_gpu_tpu.ops.sbrd import apply_q1  # noqa: E402
from eigensolver_gpu_tpu.utils.precision import highest_precision  # noqa: E402
from eigensolver_gpu_tpu.utils.timer import wallclock  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args):
    t0 = wallclock()
    np.asarray(fn(*args))
    log(f"{name}: first (compile+run) {wallclock()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = wallclock()
        np.asarray(fn(*args))
        times.append(wallclock() - t0)
    log(f"{name}: {min(times)*1e3:.1f} ms")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    m = int(sys.argv[2]) if len(sys.argv) > 2 else n // 4
    groups = (
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3
        else [1, 4, 8]
    )
    b = 32
    npanels = n // b - 1
    rng = np.random.default_rng(0)
    vs = jnp.asarray(rng.standard_normal((npanels, n, b)) * 0.1, jnp.float32)
    ts = jnp.asarray(rng.standard_normal((npanels, b, b)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    log(f"n={n} m={m} npanels={npanels} devices={jax.devices()}")

    for g in groups:
        f = jax.jit(lambda vs, ts, y, g=g: jnp.sum(apply_q1(vs, ts, y, group=g)))
        timeit(f"apply_q1 group={g}", f, vs, ts, y)

    # bare replay loop: pre-aggregated random (ng, n, gb) blocks
    for g in [4, 8]:
        ng = npanels // g
        va = jnp.asarray(
            rng.standard_normal((ng, n, g * b)) * 0.1, jnp.float32
        )
        sa = jnp.asarray(
            rng.standard_normal((ng, g * b, g * b)) * 0.1, jnp.float32
        )

        @jax.jit
        @highest_precision
        def bare(va, sa, y):
            def gbody(i, y):
                q = ng - 1 - i
                vq = va[q]
                sq = sa[q]
                return y - vq @ (sq @ (vq.T @ y))

            return jnp.sum(lax.fori_loop(0, ng, gbody, y))

        timeit(f"bare loop g={g} (ng={ng})", bare, va, sa, y)


if __name__ == "__main__":
    main()
