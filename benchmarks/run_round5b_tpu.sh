#!/usr/bin/env bash
# Round-5 TPU measurement queue, part 2 -- after the chase hybrid-shear
# fix (bd6f094) and the probe-context/pchol guard fix (6f9d82d).
# Re-runs every step the part-1 queue measured against now-stale code,
# plus the steps part 1 never reached (it died during tsp8192).
# Each step logs to /tmp/r5b_<name>.log.
set -u
cd "$(dirname "$0")/.."
probe() {
  local i
  for i in $(seq 1 100); do
    if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "    (tunnel down before next step; waiting 120s, try $i)"
    sleep 120
  done
  echo "    tunnel never returned; aborting queue"
  exit 1
}
run() {
  local name="$1"; shift
  probe
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-3000}" "$@" > "/tmp/r5b_$name.log" 2>&1
  echo "--- $name exit $? (tail):"
  tail -6 "/tmp/r5b_$name.log"
}

# 1. Mosaic toolchain check: all kernels, with the hybrid shear + fixed
#    guard probes + latrd alignment fix + in-kernel dot precision.
run smoke python benchmarks/kernel_smoke.py

# 2. Headline pre-warm FIRST (kernel_guard changed -> pchol now engages
#    on the bench path -> cache invalid; the driver's round-end capture
#    must find this compile cached).
run bench python bench.py

# 3. Chase cost with the hybrid shear (part-1 runs failed to compile).
run chase4096 python benchmarks/chase_micro.py 4096 full,nomath,noshear,nosubroll,nowrite
run chase8192 python benchmarks/chase_micro.py 8192 full
run chase4096b3 python benchmarks/chase_micro.py 4096 batch3
run chase8192b3 python benchmarks/chase_micro.py 8192 batch3

# 4. Two-stage totals with the hybrid-shear chase (part-1 numbers used
#    the runtime ladder fallback).
run ts4096 python benchmarks/two_stage.py 4096
run ts8192 python benchmarks/two_stage.py 8192

# 5. Planar two-stage: the 8192 crossover part 1 died on, then 4096
#    re-check and the batch3 A/B.
run tsp8192 python benchmarks/two_stage_planar.py 8192
run tsp4096 python benchmarks/two_stage_planar.py 4096
run tsp4096b3 env EIGSOLVE_CHASE_BATCH3=1 python benchmarks/two_stage_planar.py 4096

# 6. Headline re-record (stable repeat once everything above warmed).
run bench2 python bench.py

# 7. configs 1-2 (real mixed)
run cfg1 env EIGSOLVE_BENCH_N=1024 EIGSOLVE_BENCH_IU=64 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run cfg2 env EIGSOLVE_BENCH_N=4096 EIGSOLVE_BENCH_IU=512 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 8. QE replay fixture + QE-spectrum headline
run qe512 python benchmarks/compare.py 512 --dtype z --cases zpl --input benchmarks/qe_n512.npz
run qe4096 env EIGSOLVE_BENCH_SPECTRUM=qe EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 9. A/Bs: planar trinv, real-driver trinv at config 2, pchol kernel,
#    refinement sweeps
run trinv env EIGSOLVE_BENCH_PSOLVE=trinv EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run cfg2trinv env EIGSOLVE_BENCH_N=4096 EIGSOLVE_BENCH_IU=512 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SYGST=trinv EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run nopchol env EIGSOLVE_NO_PCHOL_KERNEL=1 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run sweep2 env EIGSOLVE_BENCH_SWEEPS=2 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 10. config-1 device-time attribution (VERDICT weak #5)
run stages1024 env EIGSOLVE_STAGES_LOOPK=8 python benchmarks/stages_mixed.py 1024 64

# 11. headline per-stage re-profile
run stagesplanar env EIGSOLVE_STAGES_LOOPK=4 python benchmarks/stages_planar.py 4096

echo "=== queue part 2 done ==="
