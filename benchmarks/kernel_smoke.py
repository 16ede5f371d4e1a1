"""On-TPU compiled-kernel smoke harness: compile and check every Mosaic
kernel at small n on the real chip in seconds (VERDICT r3 item 7).

CPU CI exercises the Pallas kernels in interpret mode only (Mosaic cannot
lower on CPU), so a Mosaic toolchain regression used to surface as a
30-minute bench failure.  This script runs each kernel COMPILED and diffs
it against its own interpret-mode execution on identical inputs --
interpret mode is the oracle already pinned against scipy/LAPACK by the
unit tests, so any compiled/interpreted divergence is a lowering bug.

Run before bench.py after touching any kernel (CLAUDE.md pre-warm list):

    python benchmarks/kernel_smoke.py            # all kernels
    python benchmarks/kernel_smoke.py chase,replay

First run pays remote compiles (small shapes, typically < 1 min each);
subsequent runs hit the persistent cache and finish in seconds.
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

from eigensolver_gpu_tpu.utils.timer import wallclock  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check(name, compiled_fn, interp_fn, atol):
    # Isolate failures per kernel: a Mosaic lowering rejection in one
    # kernel must not abort the remaining checks (round-5 lesson: the
    # first on-chip run died at kernel 3 of 10 and validated nothing
    # after it).
    t0 = wallclock()
    try:
        got = jax.tree.map(np.asarray, compiled_fn())
    except Exception as e:  # noqa: BLE001 -- lowering/runtime error
        log(f"EXC {name:24s} {type(e).__name__}: {str(e).splitlines()[0][:120]}")
        return False
    t1 = wallclock()
    want = jax.tree.map(np.asarray, interp_fn())
    flat_g, _ = jax.tree.flatten(got)
    flat_w, _ = jax.tree.flatten(want)
    worst = 0.0
    for g, w in zip(flat_g, flat_w):
        worst = max(worst, float(np.max(np.abs(g - w))))
    status = "OK " if worst <= atol else "FAIL"
    log(f"{status} {name:24s} max|compiled-interpret| = {worst:.2e} "
        f"(atol {atol:.0e}, compiled run {t1-t0:.1f}s)")
    return worst <= atol


def main():
    which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    rng = np.random.default_rng(0)
    ok = True
    log(f"devices: {jax.devices()}")

    def on(name):
        return which is None or name in which

    if on("symv"):
        from eigensolver_gpu_tpu.ops.symv_pallas import symv

        n = 512
        t = rng.standard_normal((n, n)).astype(np.float32)
        a = jnp.asarray((t + t.T) / 2)
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        ok &= check(
            "symv",
            jax.jit(lambda: symv(a, v, tile=256)),
            lambda: symv(a, v, tile=256, interpret=True),
            atol=1e-3,
        )

    if on("hemv"):
        from eigensolver_gpu_tpu.ops.hemv_pallas import hemv_planar

        n = 512
        tr = rng.standard_normal((n, n)).astype(np.float32)
        ti = rng.standard_normal((n, n)).astype(np.float32)
        ar = jnp.asarray((tr + tr.T) / 2)
        ai = jnp.asarray((ti - ti.T) / 2)
        vr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        vi = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        ok &= check(
            "hemv_planar",
            jax.jit(lambda: hemv_planar(ar, ai, vr, vi, tile=256)),
            lambda: hemv_planar(ar, ai, vr, vi, tile=256, interpret=True),
            atol=1e-3,
        )

    if on("latrd"):
        from eigensolver_gpu_tpu.ops.latrd_pallas import latrd_panel_planar

        mb = 256
        tr = rng.standard_normal((mb, mb)).astype(np.float32)
        ti = rng.standard_normal((mb, mb)).astype(np.float32)
        ar = jnp.asarray((tr + tr.T) / 2)
        ai = jnp.asarray((ti - ti.T) / 2)
        ok &= check(
            "latrd_panel_planar",
            lambda: latrd_panel_planar(ar, ai, mb, nb=32, tile=128),
            lambda: latrd_panel_planar(ar, ai, mb, nb=32, tile=128,
                                       interpret=True),
            atol=1e-2,
        )

    if on("chase"):
        from eigensolver_gpu_tpu.ops.chase_pallas import bulge_chase_pallas
        from eigensolver_gpu_tpu.ops.sb2st import dense_to_band

        n, b = 512, 32
        t = rng.standard_normal((n, n)).astype(np.float32)
        a = (t + t.T) / 2
        mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
        band = dense_to_band(jnp.asarray(a * mask, jnp.float32), b)
        # fp32 sequential drift between the compiled and interpreted
        # sum orders accumulates over ~1500 steps: drift tolerance
        ok &= check(
            "bulge_chase_pallas",
            lambda: bulge_chase_pallas(band, b),
            lambda: bulge_chase_pallas(band, b, interpret=True),
            atol=5e-3,
        )

    if on("replay"):
        from eigensolver_gpu_tpu.ops.replay_pallas import apply_q2_pallas
        from eigensolver_gpu_tpu.ops.sb2st import bulge_chase, dense_to_band

        n, b = 512, 32
        t = rng.standard_normal((n, n)).astype(np.float32)
        a = (t + t.T) / 2
        mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
        band = dense_to_band(jnp.asarray(a * mask, jnp.float32), b)
        d, e, vt, taut = bulge_chase(band, b)
        y = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
        ok &= check(
            "apply_q2_pallas",
            jax.jit(lambda: apply_q2_pallas(vt, taut, y, n, b, g=96,
                                            m_tile=128)),
            lambda: apply_q2_pallas(vt, taut, y, n, b, g=96, m_tile=128,
                                    interpret=True),
            atol=1e-3,
        )

    if on("chase_planar"):
        from eigensolver_gpu_tpu.ops.chase_pallas import (
            bulge_chase_planar_pallas,
        )
        from eigensolver_gpu_tpu.ops.sb2st import dense_to_band

        n, b = 512, 32
        tr = rng.standard_normal((n, n)).astype(np.float32)
        ti = rng.standard_normal((n, n)).astype(np.float32)
        mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
        ar = ((tr + tr.T) / 2) * mask
        ai = ((ti - ti.T) / 2) * mask
        br_ = dense_to_band(jnp.asarray(ar, jnp.float32), b)
        bi_ = dense_to_band(jnp.asarray(ai, jnp.float32), b)
        ok &= check(
            "bulge_chase_planar_pl",
            lambda: bulge_chase_planar_pallas(br_, bi_, b),
            lambda: bulge_chase_planar_pallas(br_, bi_, b, interpret=True),
            atol=5e-3,
        )

    if on("replay_planar"):
        from eigensolver_gpu_tpu.ops.replay_pallas import (
            apply_q2_planar_pallas,
        )
        from eigensolver_gpu_tpu.ops.sb2st import dense_to_band
        from eigensolver_gpu_tpu.ops.sb2st_planar import bulge_chase_planar

        n, b = 512, 32
        tr = rng.standard_normal((n, n)).astype(np.float32)
        ti = rng.standard_normal((n, n)).astype(np.float32)
        mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
        ar = ((tr + tr.T) / 2) * mask
        ai = ((ti - ti.T) / 2) * mask
        br_ = dense_to_band(jnp.asarray(ar, jnp.float32), b)
        bi_ = dense_to_band(jnp.asarray(ai, jnp.float32), b)
        d, e, vt, taut = bulge_chase_planar(br_, bi_, b)
        yr = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
        yi = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
        ok &= check(
            "apply_q2_planar_pl",
            jax.jit(lambda: apply_q2_planar_pallas(
                vt, taut, (yr, yi), n, b, g=96, m_tile=128)),
            lambda: apply_q2_planar_pallas(
                vt, taut, (yr, yi), n, b, g=96, m_tile=128, interpret=True),
            atol=1e-3,
        )

    if on("ql"):
        from eigensolver_gpu_tpu.ops.ql_panel_pallas import ql_panel_pallas

        m, b = 512, 32
        p = jnp.asarray(rng.standard_normal((m, b)).astype(np.float32))
        ok &= check(
            "ql_panel",
            lambda: ql_panel_pallas(p, 448),
            lambda: ql_panel_pallas(p, 448, interpret=True),
            atol=1e-3,
        )

    if on("ql_planar"):
        from eigensolver_gpu_tpu.ops.ql_panel_pallas import (
            ql_panel_planar_pallas,
        )

        m, b = 512, 32
        p_r = jnp.asarray(rng.standard_normal((m, b)).astype(np.float32))
        p_i = jnp.asarray(rng.standard_normal((m, b)).astype(np.float32))
        ok &= check(
            "ql_panel_planar",
            lambda: ql_panel_planar_pallas(p_r, p_i, 448),
            lambda: ql_panel_planar_pallas(p_r, p_i, 448, interpret=True),
            atol=1e-3,
        )

    if on("pchol"):
        from eigensolver_gpu_tpu.ops.pchol_pallas import (
            pchol_block_planar_pallas,
        )

        nb = 128
        tr = rng.standard_normal((nb, nb)).astype(np.float32)
        ti = rng.standard_normal((nb, nb)).astype(np.float32)
        ar = jnp.asarray(tr @ tr.T + ti @ ti.T + nb * np.eye(nb, dtype=np.float32))
        ai = jnp.asarray(ti @ tr.T - tr @ ti.T)
        ok &= check(
            "pchol_block_planar",
            lambda: pchol_block_planar_pallas(ar, ai),
            lambda: pchol_block_planar_pallas(ar, ai, interpret=True),
            atol=1e-3,
        )

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
