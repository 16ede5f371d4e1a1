"""Measure the PLANAR complex two-stage reduction vs the one-stage
planar hetrd on the real chip: psbrd (dense->band), planar bulge chase
(XLA and Mosaic), planar Q2 replay (XLA and Mosaic), planar Q1, and the
one-stage hetrd_planar + unmtr_planar baseline.  Device-side scalar
checksums only.

Usage: python benchmarks/two_stage_planar.py [n] [m]
  n  matrix size (default 4096)
  m  replay column count (default n -- the mixed pipeline
     back-transforms the FULL basis for the fp64 refinement)
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

from eigensolver_gpu_tpu.ops.sb2st import dense_to_band  # noqa: E402
from eigensolver_gpu_tpu.ops.sb2st_planar import (  # noqa: E402
    apply_q2_planar,
    bulge_chase_planar,
)
from eigensolver_gpu_tpu.ops.sbrd_planar import apply_q1_planar, psbrd  # noqa: E402
from eigensolver_gpu_tpu.ops.sytrd_planar import hetrd_planar  # noqa: E402
from eigensolver_gpu_tpu.ops.unmtr_planar import unmtr_planar  # noqa: E402
from eigensolver_gpu_tpu.utils.timer import wallclock  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, reps=3):
    t0 = wallclock()
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    log(f"{name}: first (compile+run) {wallclock()-t0:.1f}s")
    times = []
    for _ in range(reps):
        t0 = wallclock()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(wallclock() - t0)
    ms = min(times) * 1e3
    log(f"{name}: {ms:.1f} ms  (all: {[f'{t*1e3:.0f}' for t in times]})")
    return ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    m = int(sys.argv[2]) if len(sys.argv) > 2 else n
    b = int(os.environ.get("EIGSOLVE_BAND", "32"))
    g = int(os.environ.get("EIGSOLVE_REPLAY_G", "0")) or 3 * b
    log(f"n={n} m={m} band={b} g={g} devices={jax.devices()}")

    rng = np.random.default_rng(0)
    tr = rng.standard_normal((n, n)).astype(np.float32)
    ti = rng.standard_normal((n, n)).astype(np.float32)
    ar = jnp.asarray((tr + tr.T) / 2)
    ai = jnp.asarray((ti - ti.T) / 2)
    yr = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    yi = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))

    @jax.jit
    def f_hetrd(ar, ai):
        (pr, pi), d, e, (taur, taui) = hetrd_planar(ar, ai, nb=32, bucket=128)
        return jnp.sum(d) + jnp.sum(e), (pr, pi), (taur, taui)

    @jax.jit
    def f_unmtr(pr, pi, taur, taui, yr, yi):
        zr, zi = unmtr_planar(pr, pi, taur, taui, yr, yi, nb=128)
        return jnp.sum(zr[0]) + jnp.sum(zi[0]), zr, zi

    @jax.jit
    def f_psbrd(ar, ai):
        (abr, abi), vs, ts = psbrd(ar, ai, band=b, bucket=512)
        return jnp.sum(abr[:, 0]), (abr, abi), vs, ts

    @jax.jit
    def f_chase(br_, bi_):
        d, e, vt, taut = bulge_chase_planar(br_, bi_, b)
        return jnp.sum(d) + jnp.sum(e[0]), vt, taut

    @jax.jit
    def f_chase_pl(br_, bi_):
        from eigensolver_gpu_tpu.ops.chase_pallas import (
            bulge_chase_planar_pallas,
        )

        # EIGSOLVE_CHASE_BATCH3=1 times the vmax-batched kernel
        b3 = bool(os.environ.get("EIGSOLVE_CHASE_BATCH3")) and b % 8 == 0
        d, e, vt, taut = bulge_chase_planar_pallas(br_, bi_, b, batch3=b3)
        return jnp.sum(d) + jnp.sum(e[0]), vt, taut

    @jax.jit
    def f_q2(vt, taut, yr, yi):
        zr, zi = apply_q2_planar(vt, taut, (yr, yi), n, b, g=g)
        return jnp.sum(zr[0]) + jnp.sum(zi[0]), zr, zi

    @jax.jit
    def f_q2p(vt, taut, yr, yi):
        from eigensolver_gpu_tpu.ops.replay_pallas import (
            apply_q2_planar_pallas,
        )

        zr, zi = apply_q2_planar_pallas(vt, taut, (yr, yi), n, b, g=g)
        return jnp.sum(zr[0]) + jnp.sum(zi[0]), zr, zi

    @jax.jit
    def f_q1(vs, ts, yr, yi):
        zr, zi = apply_q1_planar(vs, ts, (yr, yi))
        return jnp.sum(zr[0]) + jnp.sum(zi[0]), zr, zi

    t_one = timeit("hetrd one-stage", lambda a_, b_: f_hetrd(a_, b_)[0], ar, ai)
    _, (pr, pi), (taur, taui) = f_hetrd(ar, ai)
    t_unm = timeit(
        f"unmtr_planar (m={m})", lambda *x: f_unmtr(*x)[0],
        pr, pi, taur, taui, yr, yi,
    )
    t_sbrd = timeit("psbrd dense->band", lambda a_, b_: f_psbrd(a_, b_)[0], ar, ai)
    _, (abr, abi), vs, ts = f_psbrd(ar, ai)
    band_r = dense_to_band(abr, b)
    band_i = dense_to_band(abi, b)
    t_chase = timeit("planar chase XLA", lambda *x: f_chase(*x)[0], band_r, band_i)
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        t_chase_pl = timeit(
            "planar chase PALLAS", lambda *x: f_chase_pl(*x)[0], band_r, band_i
        )
        t_chase = min(t_chase, t_chase_pl)
        _, vt, taut = f_chase_pl(band_r, band_i)
    else:
        _, vt, taut = f_chase(band_r, band_i)
    t_q2 = timeit(
        f"apply_q2_planar XLA (m={m})", lambda *x: f_q2(*x)[0],
        vt, taut, yr, yi,
    )
    if on_tpu:
        t_q2p = timeit(
            f"apply_q2_planar PALLAS (m={m})", lambda *x: f_q2p(*x)[0],
            vt, taut, yr, yi,
        )
        d0 = f_q2(vt, taut, yr, yi)
        d1 = f_q2p(vt, taut, yr, yi)
        err = max(
            float(jnp.max(jnp.abs(d1[1] - d0[1]))),
            float(jnp.max(jnp.abs(d1[2] - d0[2]))),
        )
        log(f"pallas-vs-xla planar replay max diff: {err:.3e}")
        t_q2 = min(t_q2, t_q2p)
    t_q1 = timeit(f"apply_q1_planar (m={m})", lambda *x: f_q1(*x)[0], vs, ts, yr, yi)
    log(
        f"TOTAL planar two-stage: {t_sbrd + t_chase + t_q2 + t_q1:.1f} ms "
        f"(psbrd {t_sbrd:.0f} + chase {t_chase:.0f} + q2 {t_q2:.0f} + q1 {t_q1:.0f}) "
        f"vs one-stage {t_one + t_unm:.1f} ms "
        f"(hetrd {t_one:.0f} + unmtr {t_unm:.0f})"
    )


if __name__ == "__main__":
    main()
