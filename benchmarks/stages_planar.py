"""Per-stage breakdown of the planar complex mixed-precision pipeline
(the bench.py headline path). Usage: python benchmarks/stages_planar.py [n]
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

from eigensolver_gpu_tpu.ops.planar import (  # noqa: E402
    pcholesky_lower,
    pH,
)
from eigensolver_gpu_tpu.ops.refine_planar import refine_gevp_planar  # noqa: E402
from eigensolver_gpu_tpu.ops.stedc import stedc  # noqa: E402
from eigensolver_gpu_tpu.ops.sytrd_planar import hetrd_planar  # noqa: E402
from eigensolver_gpu_tpu.ops.unmtr_planar import unmtr_planar  # noqa: E402
from eigensolver_gpu_tpu.utils.testing import random_hpd_pair  # noqa: E402


from eigensolver_gpu_tpu.utils.roofline import format_row  # noqa: E402


# See benchmarks/_stage_timer.py for the LOOPK in-jit device-time scheme.
from _stage_timer import LOOPK, loopk_device_ms  # noqa: E402


def timeit(name, f, *args, rep=3, flops=0.0, prec="f32", bytes_hbm=0.0):
    def scalar(*a):
        out = f(*a)
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in jax.tree.leaves(out))

    gs = jax.jit(scalar)
    t0 = time.perf_counter()
    np.asarray(gs(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        np.asarray(gs(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    line = (
        format_row(name, ms, flops=flops, prec=prec, bytes_hbm=bytes_hbm)
        + f"  (compile {tc:.1f}s)"
    )
    if LOOPK > 1:
        dev_ms = loopk_device_ms(scalar, args, LOOPK, rep=rep)
        line += f"  device ~{dev_ms:7.2f} ms (k={LOOPK})"
    print(line, flush=True)
    return jax.jit(f)(*args)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(f"n={n} device={jax.devices()[0]} (f32 pipeline + f64 refine)", flush=True)
    a_h, b_h = random_hpd_pair(n, seed=0)
    f32 = lambda x: jnp.asarray(np.ascontiguousarray(x), jnp.float32)
    ar, ai, br, bi = f32(a_h.real), f32(a_h.imag), f32(b_h.real), f32(b_h.imag)

    # flop/byte models: complex = 4 real MACs; flops = 2*MACs; planar
    # fp32 gemms run at the f32-'highest' ceiling, the f64 refinement
    # sweep at the ozaki effective-f64 ceiling; hetrd's bound is its 4
    # column-loop reads over the trailing triangle (2 planes x 4B)
    n3 = float(n) ** 3
    l, info = timeit("pcholesky f32", lambda b0, b1: pcholesky_lower((b0, b1), nb=128), br, bi,
                     flops=4 * n3 / 3)
    # the fp32 driver path solves with the block-inverted form
    # (models/zhegvdx_planar.py `_solve_l`), so time THAT; the 'trinv'
    # alternative (one full inverse + gemms) is timed per stage below.
    from eigensolver_gpu_tpu.ops.planar import (
        pmatmul,
        ptrinv_lower,
        ptrsm_left_lower_inv,
    )

    x = timeit("ptrsm1 f32", lambda l0, l1, a0, a1: ptrsm_left_lower_inv((l0, l1), (a0, a1), nb=128), *l, ar, ai,
               flops=4 * n3)
    y = timeit("ptrsm2 f32", lambda l0, l1, x0, x1: ptrsm_left_lower_inv((l0, l1), pH((x0, x1)), nb=128), *l, *x,
               flops=4 * n3)
    if n % 128 == 0 and (n // 128) & (n // 128 - 1) == 0:
        linv = timeit("ptrinv bld", lambda l0, l1: ptrinv_lower((l0, l1)), *l,
                      flops=4 * n3 / 3)
        timeit("trinv gemm", lambda i0, i1, a0, a1: pmatmul((i0, i1), (a0, a1)),
               *linv, ar, ai, flops=6 * n3)
    cr, ci = pH(y)
    cr = (cr + cr.T) / 2
    ci = (ci - ci.T) / 2
    # hetrd bytes: the column loop's effective traffic is ~2 full passes
    # over the trailing triangle per column across both planes
    # (calibrated against the measured 549 ms / 635 GB/s round-2 figure)
    packed = timeit("hetrd f32", lambda c0, c1: hetrd_planar(c0, c1, nb=32), cr, ci,
                    flops=16 * n3 / 3, bytes_hbm=16 * n3 / 3)
    (pr, pi), d, e, (tr, ti) = packed
    wq = timeit("stedc f32", lambda d, e: stedc(d, e, leaf=64), d, e,
                flops=8 * n3 / 3)
    w_all, q = wq
    iu = n  # full spectrum, as the mixed path needs
    z0 = q[:, :iu]
    yv = timeit(
        "unmtr f32",
        lambda pr, pi, tr, ti, z: unmtr_planar(pr, pi, tr, ti, z, jnp.zeros_like(z), nb=128),
        pr, pi, tr, ti, z0,
        flops=16 * n3,
    )
    def _solve_u_inv(l0, l1, y0, y1):
        u0, u1 = pH((l0, l1))
        fl = lambda mm: jnp.flip(mm, axis=(0, 1))
        flv = lambda mm: jnp.flip(mm, axis=0)
        x0, x1 = ptrsm_left_lower_inv(
            (fl(u0), fl(u1)), (flv(y0), flv(y1)), nb=128
        )
        return flv(x0), flv(x1)

    zz = timeit("ptrsm3 f32", _solve_u_inv, *l, *yv, flops=4 * n3)
    a64 = (jnp.asarray(np.ascontiguousarray(a_h.real)), jnp.asarray(np.ascontiguousarray(a_h.imag)))
    b64 = (jnp.asarray(np.ascontiguousarray(b_h.real)), jnp.asarray(np.ascontiguousarray(b_h.imag)))
    x64 = (zz[0].astype(jnp.float64), zz[1].astype(jnp.float64))
    timeit(
        "refine f64 x2",
        lambda a0, a1, b0, b1, x0, x1: refine_gevp_planar((a0, a1), (b0, b1), (x0, x1), sweeps=2),
        *a64, *b64, *x64,
        flops=30 * n3, prec="ozaki",
    )


if __name__ == "__main__":
    main()
