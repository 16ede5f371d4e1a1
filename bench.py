"""Benchmark driver -- prints ONE JSON line for the scoring harness.

Metric (BASELINE.md): zhegvdx wall-time at n=4096 (complex fp64,
il=1..iu=1024, the reference's headline configuration). ``vs_baseline``
is measured the way the reference's own 4-way harness defines a baseline
(test_driver/test_zhegvdx.F90:157-184: CPU LAPACK zhegvd on the same
node): scipy.linalg.eigh(a, b) wall-time divided by ours, so > 1 means
faster than the CPU oracle.

Timing methodology mirrors the reference (warm-up call, then timed
calls, test_zhegvdx.F90:172-184) with one TPU-specific correction: the
tunnel's device-to-host link is slow, so the solve is reduced to a
device-side scalar checksum and only that scalar is materialized.

The backend is PROBED before any in-process device call: the serving
TPU tunnel goes UNAVAILABLE for stretches (observed hours), and a naked
``jax.devices()`` on a dead tunnel crashes the whole capture (round 4's
BENCH_r04.json was ``rc=1, parsed=null`` for exactly this). The probe
runs ``jax.devices()`` in a SUBPROCESS with a per-try timeout (a hung
backend init cannot wedge this process) and retries on a bounded budget
before giving up with a distinct exit code.

Environment knobs:
  EIGSOLVE_BENCH_PROBE_SECS     total probe budget in seconds before
                                giving up (default 1800; 0 disables)
  EIGSOLVE_BENCH_PROBE_TRY_SECS per-attempt subprocess timeout (90)
  EIGSOLVE_BENCH_PROBE_SLEEP    sleep between attempts (60)
  EIGSOLVE_BENCH_N      matrix size (default 4096)
  EIGSOLVE_BENCH_IU     upper eigenpair index (default n//4)
  EIGSOLVE_BENCH_DTYPE  'complex128' (default) or 'float64'
  EIGSOLVE_BENCH_SKIP_CPU  skip the scipy baseline (vs_baseline = 0)
  EIGSOLVE_BENCH_SWEEPS  refinement sweeps for mode=mp (default 2 =
                         1 coarse fp32 + 1 fp64; flipped from 3 by the
                         round-5 A/B -- 986.7 vs 1005.5 ms at an
                         identical 1.7e-17 residual, the defect-gated
                         escalation guards the contract on hard spectra)
  EIGSOLVE_BENCH_PSOLVE  planar_solve_mode for the planar fp32 pipeline
                         ('blockinv' default | 'trinv' | 'subst')
  EIGSOLVE_BENCH_TRIDIAG tridiag_mode: 'auto' (default, measured
                         crossovers decide) | 'one' | 'two' -- full-
                         driver A/B of the two-stage reduction
  EIGSOLVE_BENCH_SYGST   sygst_mode for the real driver ('full' default
                         auto-swaps; 'trinv' = full-inverse phases 2+4)
"""

import json
import os
import sys

import numpy as np

import jax

if os.environ.get("EIGSOLVE_BENCH_PLATFORM"):
    # for smoke tests off the TPU tunnel (the session sitecustomize
    # pre-imports jax, so env vars alone are too late)
    jax.config.update("jax_platforms", os.environ["EIGSOLVE_BENCH_PLATFORM"])
jax.config.update("jax_enable_x64", True)
# Remote compiles through the tunnel are slow; persist them.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from eigensolver_gpu_tpu import SolverConfig  # noqa: E402
from eigensolver_gpu_tpu.models.sygvdx import sygvdx  # noqa: E402
from eigensolver_gpu_tpu.utils.testing import (  # noqa: E402
    random_hpd_pair,
    random_spd_pair,
)
from eigensolver_gpu_tpu.utils.timer import wallclock  # noqa: E402


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def wait_for_backend():
    """Bounded probe-and-retry for the device backend (VERDICT r4 #2).

    Runs ``jax.devices()`` in a fresh subprocess (the session
    sitecustomize pre-imports jax pinned to the tunnel, so the probe
    must not share this process: a dead tunnel hangs the first backend
    query for minutes). Retries until EIGSOLVE_BENCH_PROBE_SECS is
    exhausted; returns True once a probe answers, False if the budget
    runs out. Mirrors benchmarks/run_round4_tpu.sh's probe().
    """
    import subprocess
    import time

    budget = float(os.environ.get("EIGSOLVE_BENCH_PROBE_SECS", "1800"))
    if budget <= 0:
        return True
    try_secs = float(os.environ.get("EIGSOLVE_BENCH_PROBE_TRY_SECS", "90"))
    sleep_secs = float(os.environ.get("EIGSOLVE_BENCH_PROBE_SLEEP", "60"))
    platform = os.environ.get("EIGSOLVE_BENCH_PLATFORM")
    code = "import jax\n"
    if platform:
        code += f"jax.config.update('jax_platforms', {platform!r})\n"
    code += "jax.devices()\n"
    deadline = time.monotonic() + budget
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=min(try_secs, max(deadline - time.monotonic(), 1.0)),
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    log(f"bench: backend answered on probe attempt {attempt}")
                return True
            detail = (r.stderr or b"").decode(errors="replace").strip().splitlines()
            detail = detail[-1] if detail else "(no stderr)"
        except subprocess.TimeoutExpired:
            detail = f"probe hung > {try_secs:.0f}s (tunnel down)"
        remaining = deadline - time.monotonic()
        if remaining <= sleep_secs:
            log(
                f"bench: backend never answered in {budget:.0f}s "
                f"({attempt} attempts; last: {detail})"
            )
            return False
        log(
            f"bench: backend unavailable (attempt {attempt}: {detail}); "
            f"retrying in {sleep_secs:.0f}s, {remaining:.0f}s left"
        )
        time.sleep(sleep_secs)


def flops_model(n, m, complex_input, mixed, il=1, margin=32, sweeps=3):
    """Real-flop count of the generalized solve, counting the work the
    implementation ACTUALLY executes (BASELINE.json names GFLOP/s as the
    north-star metric; the reference computes none -- this is the
    standard LAPACK operation-count model per stage).

    Stages (real-flop multiplier x4 for complex arithmetic):
      potrf n^3/3, sygst n^3, sytrd 4n^3/3, stedc assembly ~4n^3/3
      (one n x n gemm per merge level, geometric sum ~2 n^3 MACs),
      unmtr 4 n^2 m, trsm n^2 m.
    The mixed path runs those in fp32 on the FULL spectrum (the inner
    solve uses il=1, iu=n, so its back-transform/trsm see m = n), then
    refines ONLY the selected block + cluster margin: per sweep 5 gemms
    of n^2 * ms real-MACs each, ms = min(n, iu+margin) - max(0, il-1-
    margin) (models/sygvdx.py selected-range economy).  Planar complex
    refinement gemms execute 3 real gemms per product (Karatsuba), not
    the nominal complex 4.  Auto-escalated extra sweeps (rare; the
    headline does not escalate) are not counted.

    Returns (total_flops, breakdown dict) -- fp32-pipeline and fp64-sweep
    flops separated so the log can report both honestly.
    """
    c = 4.0 if complex_input else 1.0
    reduce_macs = n**3 * (1.0 / 3 + 1.0 + 4.0 / 3 + 4.0 / 3)
    if not mixed:
        back = 4.0 * n * n * m + n * n * m  # selected-column unmtr + trsm
        total = c * 2.0 * (reduce_macs + back)  # MAC -> flop
        return total, {"pipeline": total, "refine32": 0.0, "refine64": 0.0}
    pipeline = c * 2.0 * (reduce_macs + 4.0 * n**3 + n**3)
    ms = min(n, m + margin) - max(0, il - 1 - margin)
    ck = 3.0 if complex_input else 1.0
    sweep = 2.0 * 5.0 * n * n * ms * ck
    refine32 = max(sweeps - 1, 0) * sweep  # coarse fp32 sweeps
    refine64 = (1 if sweeps > 0 else 0) * sweep  # the fp64 (ozaki) sweep
    return pipeline + refine32 + refine64, {
        "pipeline": pipeline, "refine32": refine32, "refine64": refine64,
    }


def main():
    if not wait_for_backend():
        log("bench: giving up -- backend unavailable; no measurement taken")
        sys.exit(3)
    n = int(os.environ.get("EIGSOLVE_BENCH_N", "4096"))
    dtype = os.environ.get("EIGSOLVE_BENCH_DTYPE", "complex128")
    mode = os.environ.get("EIGSOLVE_BENCH_MODE", "mp")
    iu = int(os.environ.get("EIGSOLVE_BENCH_IU", str(max(n // 4, 1))))
    # default: the fp32-factorization + fp64-refinement path -- measured
    # faster than everything else on the target chip with residuals ~1e-18
    # normalized (see benchmarks/compare.py runs); 'dc' = full fp64 D&C.
    # 2 refinement sweeps = 1 coarse (fp32) + 1 full (fp64), matching
    # the library default refine_iters=2: the round-5 A/B measured the
    # second coarse sweep as +19 ms for zero residual gain (1.7e-17
    # either way), and the defect-gated escalation (refine_extra_max)
    # adds fp64 sweeps automatically on spectra that need them.
    use_pallas = bool(os.environ.get("EIGSOLVE_BENCH_PALLAS"))
    sweeps = int(os.environ.get("EIGSOLVE_BENCH_SWEEPS", "2"))
    psolve = os.environ.get("EIGSOLVE_BENCH_PSOLVE", "blockinv")
    sygst = os.environ.get("EIGSOLVE_BENCH_SYGST", "full")
    # tridiagonalization A/B: 'one'/'two'/'auto' (default 'auto' -- the
    # measured crossovers decide; 'two' forces the two-stage reduction
    # for full-driver A/Bs of the planar crossover without code edits)
    tridiag = os.environ.get("EIGSOLVE_BENCH_TRIDIAG", "auto")
    cfg = (
        SolverConfig(
            compute_dtype="float32", refine_iters=sweeps,
            use_pallas=use_pallas, planar_solve_mode=psolve,
            sygst_mode=sygst, tridiag_mode=tridiag,
        )
        if mode == "mp"
        else SolverConfig(
            use_pallas=use_pallas, planar_solve_mode=psolve,
            sygst_mode=sygst, tridiag_mode=tridiag,
        )
    )
    log(f"bench: n={n} dtype={dtype} mode={mode} il=1 iu={iu} devices={jax.devices()}")

    spectrum = os.environ.get("EIGSOLVE_BENCH_SPECTRUM", "random")
    if dtype == "complex128":
        if spectrum == "qe":
            from eigensolver_gpu_tpu.utils.testing import qe_style_pair

            a_h, b_h = qe_style_pair(n, seed=0)
            name = f"zhegvdx_n{n}_qe_walltime"
        else:
            a_h, b_h = random_hpd_pair(n, seed=0)
            name = f"zhegvdx_n{n}_walltime"
        # the serving TPU stack has no complex dtypes ("Element type C128
        # is not supported"); solve the Hermitian problem with the planar
        # (re,im) pipeline (models/zhegvdx_planar.py) -- native complex
        # flop count, fully on device.
        from eigensolver_gpu_tpu.models.zhegvdx_planar import zhegvdx_planar

        args = tuple(
            jnp.asarray(np.ascontiguousarray(x))
            for x in (a_h.real, a_h.imag, b_h.real, b_h.imag)
        )

        def solve_checksum(ar, ai, br, bi):
            w, zr, zi, info = zhegvdx_planar(ar, ai, br, bi, il=1, iu=iu, cfg=cfg)
            # residual of the complex problem in planar arithmetic
            rr = ar @ zr - ai @ zi - (br @ zr - bi @ zi) * w[None, :]
            ri = ar @ zi + ai @ zr - (br @ zi + bi @ zr) * w[None, :]
            r2 = jnp.sum(rr * rr + ri * ri, axis=0)
            anorm = jnp.max(jnp.sum(jnp.sqrt(ar * ar + ai * ai), axis=1))
            res = jnp.max(jnp.sqrt(r2)) / (n * anorm)
            return jnp.sum(w), res, info

    else:
        a_h, b_h = random_spd_pair(n, seed=0)
        name = f"dsygvdx_n{n}_walltime"
        args = (jnp.asarray(a_h), jnp.asarray(b_h))

        def solve_checksum(a, b):
            w, z, info = sygvdx(a, b, il=1, iu=iu, cfg=cfg)
            # device-side residual so accuracy ships without bulk transfers
            r = a @ z - (b @ z) * w[None, :].astype(z.dtype)
            anorm = jnp.max(jnp.sum(jnp.abs(a), axis=1))
            res = jnp.max(jnp.sqrt(jnp.sum(jnp.abs(r) ** 2, axis=0))) / (n * anorm)
            return jnp.sum(w), res, info

    f = jax.jit(solve_checksum)

    t0 = wallclock()
    wsum, res, info = jax.tree.map(np.asarray, f(*args))
    log(f"first call (compile+run): {wallclock()-t0:.1f}s residual={float(res):.3e} info={int(info)}")

    times = []
    for _ in range(3):
        t0 = wallclock()
        out = f(*args)
        np.asarray(out[0])
        times.append(wallclock() - t0)
    ours_ms = min(times) * 1e3
    log(f"steady wall-time: {ours_ms:.1f} ms; all runs: {[f'{t*1e3:.1f}' for t in times]}")
    fl, parts = flops_model(
        n, iu, dtype == "complex128", mode == "mp",
        margin=cfg.refine_margin, sweeps=cfg.refine_iters,
    )
    log(
        f"model flops: {fl/1e9:.0f} GFLOP (pipeline {parts['pipeline']/1e9:.0f}"
        f" + refine32 {parts['refine32']/1e9:.0f} + refine64"
        f" {parts['refine64']/1e9:.0f}) -> {fl/ours_ms/1e6:.0f} GFLOP/s "
        f"effective (north-star metric, BASELINE.json; counts executed "
        f"selected-range refinement, not full-spectrum sweeps)"
    )
    # North-star external comparison (BASELINE.md "A100 baseline"): the
    # pinned modeled cuSOLVER-on-A100 wall-time for this config.
    if n == 4096 and iu == 1024 and dtype == "complex128" and mode == "mp":
        a100_ms = 900.0  # BASELINE.md §"Pinned A100 baseline" (modeled)
        log(
            f"vs pinned A100 cuSOLVER zhegvdx model ({a100_ms:.0f} ms): "
            f"{ours_ms/a100_ms:.2f}x (north star: <= 1.2x)"
        )

    vs_baseline = 0.0
    if not os.environ.get("EIGSOLVE_BENCH_SKIP_CPU"):
        import scipy.linalg

        t0 = wallclock()
        scipy.linalg.eigh(a_h, b_h)
        cpu_ms = (wallclock() - t0) * 1e3
        vs_baseline = cpu_ms / ours_ms
        log(f"scipy cpu baseline: {cpu_ms:.1f} ms -> vs_baseline={vs_baseline:.2f}x")

    print(
        json.dumps(
            {
                "metric": name,
                "value": round(ours_ms, 2),
                "unit": "ms",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
