"""Ozaki bf16-digit fp64 gemm vs the emulated-fp64 dot, on-device.

Usage: python benchmarks/ozaki_bench.py [n]
Knob:  EIGSOLVE_BENCH_PLATFORM=cpu for an off-TPU smoke run.
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

from eigensolver_gpu_tpu.ops.ozaki import ozaki_matmul, ozaki_pmatmul  # noqa: E402


def timeit(name, f, *args, rep=3):
    gs = jax.jit(lambda *z: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(f(*z))))
    t0 = time.perf_counter()
    np.asarray(gs(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        np.asarray(gs(*args))
        ts.append(time.perf_counter() - t0)
    print(f"  {name:22s}: {min(ts)*1e3:8.1f} ms  (compile {tc:.1f}s)", flush=True)
    return min(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float64)
    fl = 2 * n**3 / 1e12
    print(f"n={n}  ({fl*1e3:.0f} GFLOP per product)")
    for bits in (48, 56):
        t = timeit(f"ozaki bits={bits}", lambda x, y, bits=bits: ozaki_matmul(x, y, bits=bits), a, b)
        print(f"        -> effective {fl/t:.1f} TFLOP/s(f64)")
    with jax.default_matmul_precision("highest"):
        t = timeit("emulated f64 dot", jnp.dot, a, b)
    print(f"        -> effective {fl/t:.1f} TFLOP/s(f64)")
    err = jax.jit(
        lambda x, y: jnp.max(
            jnp.abs(
                ozaki_matmul(x, y, bits=48)
                - jnp.dot(x, y, precision=lax.Precision.HIGHEST)
            )
        )
        / jnp.max(jnp.abs(jnp.dot(x, y, precision=lax.Precision.HIGHEST)))
    )
    print("  relerr oz48 vs emulated-f64:", np.asarray(err(a, b)))
    # planar complex product (3 Karatsuba ozaki gemms)
    ai = jax.random.normal(jax.random.PRNGKey(2), (n, n), jnp.float64)
    bi = jax.random.normal(jax.random.PRNGKey(3), (n, n), jnp.float64)
    timeit("ozaki planar (3x)", lambda xr, xi, yr, yi: ozaki_pmatmul((xr, xi), (yr, yi)), a, ai, b, bi)


if __name__ == "__main__":
    main()
