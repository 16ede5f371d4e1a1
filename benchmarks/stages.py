"""Per-stage wall-time breakdown on the current device.

Times each pipeline phase separately (compile-cached, scalar-materialized)
so optimization effort goes where the time is -- the TPU analogue of
profiling the reference under nvprof with its NVTX ranges.

Usage: python benchmarks/stages.py [n]
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
from jax import lax  # noqa: E402

from eigensolver_gpu_tpu.ops.cholesky import cholesky_upper  # noqa: E402
from eigensolver_gpu_tpu.ops.stedc import stedc  # noqa: E402
from eigensolver_gpu_tpu.ops.sytrd import sytrd_blocked  # noqa: E402
from eigensolver_gpu_tpu.ops.sygst import sygst_full  # noqa: E402
from eigensolver_gpu_tpu.ops.unmtr import unmtr  # noqa: E402
from eigensolver_gpu_tpu.utils.testing import random_spd_pair  # noqa: E402


def timeit(name, f, *args, rep=3):
    g = jax.jit(f)

    def scalar(*a):
        out = f(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(jnp.abs(x)) for x in leaves)

    gs = jax.jit(scalar)
    t0 = time.perf_counter()
    np.asarray(gs(*args))  # compile+run, scalar transfer only
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        np.asarray(gs(*args))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:10s}: {min(ts)*1e3:9.1f} ms  (compile {tc:.1f}s)", flush=True)
    return g(*args)  # device-resident outputs for chaining (no transfer)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"n={n} device={jax.devices()[0]}", flush=True)
    a_h, b_h = random_spd_pair(n, seed=0)
    a = jnp.asarray(a_h)
    b = jnp.asarray(b_h)
    iu = n // 4

    u, _ = timeit("cholesky", lambda b: cholesky_upper(b), b)
    c = timeit("sygst", lambda a, u: sygst_full(a, u), a, u)
    packed = timeit("sytrd", lambda c: sytrd_blocked(c, nb=32, bucket=512), c)
    ap, d, e, tau = packed
    wq = timeit("stedc", lambda d, e: stedc(d, e, leaf=64), d, e)
    w_all, q = wq
    z = timeit(
        "unmtr",
        lambda ap, tau, q: unmtr(ap, tau, q[:, :iu], nb=128),
        ap, tau, q,
    )
    timeit(
        "trsm",
        lambda u, z: lax.linalg.triangular_solve(u, z, left_side=True, lower=False),
        u, z,
    )


if __name__ == "__main__":
    main()
