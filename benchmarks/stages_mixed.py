"""Per-stage breakdown of the MIXED real pipeline (BASELINE config 1/2
shape): fp32 factorization stages + fp64 selected-range refinement.

The driver-level numbers (bench.py) only show the total; this times each
phase of models/sygvdx.sygvdx's mixed branch separately with the exact
parameters the driver uses, so small-n fixed-cost work (ROADMAP round-4
item: config 1 at 148.6 ms) optimizes against measured stage costs.

Usage: python benchmarks/stages_mixed.py [n] [iu]
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
from eigensolver_gpu_tpu.ops.refine import refine_gevp  # noqa: E402
from eigensolver_gpu_tpu.ops.stedc import stedc  # noqa: E402
from eigensolver_gpu_tpu.ops.sygst import sygst_full  # noqa: E402
from eigensolver_gpu_tpu.ops.sytrd import sytrd  # noqa: E402
from eigensolver_gpu_tpu.ops.unmtr import unmtr  # noqa: E402
from eigensolver_gpu_tpu.utils.precision import highest_precision  # noqa: E402
from eigensolver_gpu_tpu.utils.testing import random_spd_pair  # noqa: E402


# See benchmarks/_stage_timer.py for the LOOPK in-jit device-time scheme.
from _stage_timer import LOOPK, loopk_device_ms  # noqa: E402


def timeit(name, f, *args, rep=3):
    f = highest_precision(f)
    g = jax.jit(f)

    def scalar(*a):
        out = f(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in leaves)

    gs = jax.jit(scalar)
    t0 = time.perf_counter()
    np.asarray(gs(*args))  # compile+run, scalar transfer only
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        np.asarray(gs(*args))
        ts.append(time.perf_counter() - t0)
    line = f"  {name:12s}: {min(ts)*1e3:9.1f} ms  (compile {tc:.1f}s)"
    if LOOPK > 1:
        dev_ms = loopk_device_ms(scalar, args, LOOPK, rep=rep)
        line += f"  device ~{dev_ms:7.2f} ms (loop k={LOOPK})"
    print(line, flush=True)
    return g(*args)  # device-resident outputs for chaining


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iu = int(sys.argv[2]) if len(sys.argv) > 2 else max(n // 16, 1)
    margin = 32  # cfg.refine_margin default
    sel = (0, min(n, iu + margin))
    print(f"n={n} iu={iu} sel={sel} device={jax.devices()[0]}", flush=True)
    a_h, b_h = random_spd_pair(n, seed=0)
    a64 = jnp.asarray(a_h)
    b64 = jnp.asarray(b_h)
    a = a64.astype(jnp.float32)
    b = b64.astype(jnp.float32)

    # fp32 pipeline, driver parameters (models/sygvdx.py mixed branch:
    # inner full-spectrum solve -> sygst_full, sytrd nb=32 bucket=256,
    # stedc leaf=64, full-width unmtr nb=128, full trsm)
    u, _ = timeit("cholesky f32", lambda b: cholesky_upper(b), b)
    c = timeit("sygst f32", lambda a, u: sygst_full(a, u), a, u)
    packed = timeit("sytrd f32", lambda c: sytrd(c, nb=32, bucket=256), c)
    ap, d, e, tau = packed
    wq = timeit("stedc f32", lambda d, e: stedc(d, e, leaf=64), d, e)
    w_all, q = wq
    z = timeit(
        "unmtr f32", lambda ap, tau, q: unmtr(ap, tau, q, nb=128), ap, tau, q
    )
    z = timeit(
        "trsm f32",
        lambda u, z: lax.linalg.triangular_solve(u, z, left_side=True, lower=False),
        u, z,
    )
    # fp64 selected-range refinement, driver parameters (refine_iters=3
    # -> 2 coarse fp32 + 1 fp64 ozaki sweep; extra_max=2 gate)
    timeit(
        "refine f64",
        lambda a64, b64, z, w: refine_gevp(
            a64, b64, z.astype(jnp.float64), sweeps=3, sel=sel,
            w0=w.astype(jnp.float64), extra_max=2,
        ),
        a64, b64, z, w_all,
    )


if __name__ == "__main__":
    main()
