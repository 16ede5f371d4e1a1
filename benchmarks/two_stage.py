"""Measure the two-stage reduction stages vs the one-stage loop on the
real chip: sytrd (one-stage), sbrd (dense->band), bulge_chase
(band->tridiag), and the Q2/Q1 replays. Device-side scalar checksums
only (the host link is ~35 MB/s).

Usage: python benchmarks/two_stage.py [n] [dtype] [m]
  n      matrix size (default 4096)
  dtype  float32 (default) or float64
  m      replay column count (default n//4)
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

from eigensolver_gpu_tpu.ops.sb2st import apply_q2, bulge_chase, dense_to_band  # noqa: E402
from eigensolver_gpu_tpu.ops.sbrd import apply_q1, sbrd  # noqa: E402
from eigensolver_gpu_tpu.ops.sytrd import sytrd  # noqa: E402
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
    dt = jnp.float32 if (len(sys.argv) < 3 or sys.argv[2] == "float32") else jnp.float64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else n // 4
    b = int(os.environ.get("EIGSOLVE_BAND", "32"))
    log(f"n={n} dtype={dt.__name__} m={m} band={b} devices={jax.devices()}")

    rng = np.random.default_rng(0)
    t = rng.standard_normal((n, n))
    a = jnp.asarray((t + t.T) / 2, dt)
    y = jnp.asarray(rng.standard_normal((n, m)), dt)

    @jax.jit
    def f_sytrd(a):
        _, d, e, _ = sytrd(a, nb=32, bucket=256)
        return jnp.sum(d) + jnp.sum(e)

    @jax.jit
    def f_sbrd(a):
        ab, vs, ts = sbrd(a, band=b, bucket=512)
        return jnp.sum(ab[:, 0]) + jnp.sum(vs[0, :, 0]), ab, vs, ts

    @jax.jit
    def f_chase(band):
        d, e, vt, taut = bulge_chase(band, b)
        return jnp.sum(d) + jnp.sum(e), vt, taut

    g = int(os.environ.get("EIGSOLVE_REPLAY_G", "0")) or None

    @jax.jit
    def f_q2(vt, taut, y):
        z = apply_q2(vt, taut, y, n, b, g=g)
        return jnp.sum(z[0]), z

    @jax.jit
    def f_q1(vs, ts, y):
        z = apply_q1(vs, ts, y)
        return jnp.sum(z[0]), z

    t_one = timeit("sytrd one-stage", f_sytrd, a)
    t_sbrd = timeit("sbrd dense->band", lambda a: f_sbrd(a)[0], a)
    _, ab, vs, ts = f_sbrd(a)
    band = dense_to_band(ab, b)
    t_chase = timeit("bulge_chase", lambda bd: f_chase(bd)[0], band)
    if dt == jnp.float32:
        from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_pallas

        @jax.jit
        def f_chase_pl(band):
            d, e, vt, taut = bulge_chase_pallas(band, b)
            return jnp.sum(d) + jnp.sum(e), vt, taut

        t_chase_pl = timeit(
            "bulge_chase PALLAS", lambda bd: f_chase_pl(bd)[0], band
        )
        t_chase = min(t_chase, t_chase_pl)
    _, vt, taut = f_chase(band)
    t_q2 = timeit(f"apply_q2 (m={m})", lambda *x: f_q2(*x)[0], vt, taut, y)
    if dt == jnp.float32:
        from eigensolver_gpu_tpu.ops.replay_pallas import apply_q2_pallas

        gp = int(os.environ.get("EIGSOLVE_REPLAY_G_PALLAS", "0")) or 3 * b
        mt = int(os.environ.get("EIGSOLVE_REPLAY_MT", "512"))

        @jax.jit
        def f_q2p(vt, taut, y):
            z = apply_q2_pallas(vt, taut, y, n, b, g=gp, m_tile=mt)
            return jnp.sum(z[0]), z

        t_q2p = timeit(
            f"apply_q2 PALLAS (g={gp}, mt={mt})",
            lambda *x: f_q2p(*x)[0], vt, taut, y,
        )
        err = jnp.max(jnp.abs(f_q2p(vt, taut, y)[1] - f_q2(vt, taut, y)[1]))
        log(f"pallas-vs-xla replay max diff: {float(err):.3e}")
        t_q2 = min(t_q2, t_q2p)
    t_q1 = timeit(f"apply_q1 (m={m})", lambda *x: f_q1(*x)[0], vs, ts, y)
    log(
        f"TOTAL two-stage: {t_sbrd + t_chase + t_q2 + t_q1:.1f} ms "
        f"(sbrd {t_sbrd:.0f} + chase {t_chase:.0f} + q2 {t_q2:.0f} + q1 {t_q1:.0f}) "
        f"vs one-stage sytrd {t_one:.1f} ms (excl. unmtr back-transform)"
    )


if __name__ == "__main__":
    main()
