#!/usr/bin/env bash
# Round-5 TPU measurement queue, part 3 -- the part-2 steps that never
# ran (the queue died at tsp8192; /tmp logs lost to a machine restart).
# Decision-critical planar two-stage crossover first, then the headline
# re-record, configs, QE, A/Bs, and the LOOPK stage attributions.
# Each step logs to /tmp/r5c_<name>.log.
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
  timeout "${STEP_TIMEOUT:-3000}" "$@" > "/tmp/r5c_$name.log" 2>&1
  echo "--- $name exit $? (tail):"
  tail -6 "/tmp/r5c_$name.log"
}

# 1. Planar two-stage: the 8192 crossover both prior queues died on,
#    then the 4096 re-check with the fixed kernels and the batch3 A/B.
STEP_TIMEOUT=5400 run tsp8192 python benchmarks/two_stage_planar.py 8192
run tsp4096 python benchmarks/two_stage_planar.py 4096
run tsp4096b3 env EIGSOLVE_CHASE_BATCH3=1 python benchmarks/two_stage_planar.py 4096

# 2. Headline re-record (pchol kernel now actually engaged; the part-2
#    queue pre-warmed this compile -- no library change since).
run bench python bench.py

# 3. configs 1-2 (real mixed)
run cfg1 env EIGSOLVE_BENCH_N=1024 EIGSOLVE_BENCH_IU=64 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run cfg2 env EIGSOLVE_BENCH_N=4096 EIGSOLVE_BENCH_IU=512 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 4. QE replay fixture + QE-spectrum headline
run qe512 python benchmarks/compare.py 512 --dtype z --cases zpl --input benchmarks/qe_n512.npz
run qe4096 env EIGSOLVE_BENCH_SPECTRUM=qe EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 5. A/Bs: planar trinv, real-driver trinv at config 2, pchol kernel,
#    refinement sweeps
run trinv env EIGSOLVE_BENCH_PSOLVE=trinv EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run cfg2trinv env EIGSOLVE_BENCH_N=4096 EIGSOLVE_BENCH_IU=512 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SYGST=trinv EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run nopchol env EIGSOLVE_NO_PCHOL_KERNEL=1 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run sweep2 env EIGSOLVE_BENCH_SWEEPS=2 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 6. config-1 device-time attribution (VERDICT weak #5)
run stages1024 env EIGSOLVE_STAGES_LOOPK=8 python benchmarks/stages_mixed.py 1024 64

# 7. headline per-stage re-profile
run stagesplanar env EIGSOLVE_STAGES_LOOPK=4 python benchmarks/stages_planar.py 4096

echo "=== queue part 3 done ==="
