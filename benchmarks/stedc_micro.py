"""stedc small-n fixed-cost microbenchmark (ROADMAP round-4 item 4).

Times the pieces that make stedc ~flat in n (sequential-depth bound):
the batched Jacobi leaf solve (sweeps*rounds fori_loop) vs XLA's batched
eigh, and full stedc under different leaf sizes/solvers, at the config-1
shape (n=1024 fp32).

Usage: python benchmarks/stedc_micro.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("EIGSOLVE_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EIGSOLVE_BENCH_PLATFORM"])
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from eigensolver_gpu_tpu.ops.jacobi import jacobi_eigh  # noqa: E402
from eigensolver_gpu_tpu.ops.stedc import stedc  # noqa: E402


def timeit(name, f, *args, rep=3):
    g = jax.jit(f)

    def scalar(*a):
        out = f(*a)
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(out))

    gs = jax.jit(scalar)
    t0 = time.perf_counter()
    np.asarray(gs(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        np.asarray(gs(*args))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:28s}: {min(ts)*1e3:8.1f} ms  (compile {tc:.1f}s)", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"n={n} device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    e = jnp.asarray(rng.standard_normal(n - 1).astype(np.float32))

    # leaf solver head-to-head at the config-1 leaf shape
    for leaf in (32, 64, 128):
        nblk = n // leaf
        tb = rng.standard_normal((nblk, leaf, leaf)).astype(np.float32)
        tb = jnp.asarray((tb + np.swapaxes(tb, 1, 2)) / 2)
        timeit(f"jacobi ({nblk},{leaf},{leaf}) s10", lambda tb=tb: jacobi_eigh(tb))
        timeit(f"jacobi ({nblk},{leaf},{leaf}) s6", lambda tb=tb: jacobi_eigh(tb, sweeps=6))
        timeit(f"xla eigh ({nblk},{leaf},{leaf})", lambda tb=tb: jnp.linalg.eigh(tb))

    # noop reference: measures the harness/tunnel floor
    timeit("noop (d+e sum)", lambda d, e: (d, e), d, e)

    # full stedc under the knobs
    for leaf in (32, 64, 128):
        timeit(f"stedc leaf={leaf} jacobi", lambda d, e, leaf=leaf: stedc(d, e, leaf=leaf), d, e)
        timeit(f"stedc leaf={leaf} xla", lambda d, e, leaf=leaf: stedc(d, e, leaf=leaf, leaf_solver="xla"), d, e)


if __name__ == "__main__":
    main()
