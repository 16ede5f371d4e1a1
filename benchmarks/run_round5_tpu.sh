#!/usr/bin/env bash
# Round-5 TPU measurement queue -- run once when the tunnel is up.
# Each step logs to /tmp/r5_<name>.log; steps are ordered so the most
# informative results land first if the tunnel drops again.
set -u
cd "$(dirname "$0")/.."
probe() {
  # The tunnel goes down for stretches (observed hours); a hanging
  # probe (>90 s) means down.  Wait for it between steps instead of
  # burning each step's full timeout on a dead link.
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
  timeout "${STEP_TIMEOUT:-3000}" "$@" > "/tmp/r5_$name.log" 2>&1
  echo "--- $name exit $? (tail):"
  tail -6 "/tmp/r5_$name.log"
}

# 1. Mosaic toolchain check (validates the strided roll + new kernels)
run smoke python benchmarks/kernel_smoke.py

# 1b. headline pre-warm FIRST (the driver's round-end bench.py capture
#     needs the compile cache warm for the CURRENT code; if the tunnel
#     only answers late in the round, this is the step that must have
#     happened). Also records the round-5 headline number.
run bench python bench.py

# 2. chase cost: strided-roll gain vs the round-3 115.7/352.3 ms
run chase4096 python benchmarks/chase_micro.py 4096 full,nomath,noshear,nosubroll,nowrite
run chase8192 python benchmarks/chase_micro.py 8192 full

# 2b. vmax-batched chase (round 5, bit-identical outputs): one band
#     round trip per 3 timesteps -- flip EIGSOLVE_CHASE_BATCH3 on a win
run chase4096b3 python benchmarks/chase_micro.py 4096 batch3
run chase8192b3 python benchmarks/chase_micro.py 8192 batch3

# 3. two-stage totals (real): crossover re-derivation (QL panel kernel
#    on by default; the noql A/B attributes its share of sbrd)
run ts4096 python benchmarks/two_stage.py 4096
run ts8192 python benchmarks/two_stage.py 8192
run ts4096noql env EIGSOLVE_NO_QL_KERNEL=1 python benchmarks/two_stage.py 4096

# 4. planar two-stage vs the 549 ms one-stage hetrd wall
run tsp4096 python benchmarks/two_stage_planar.py 4096
run tsp8192 python benchmarks/two_stage_planar.py 8192

# 4b. planar two-stage with the vmax-batched chase (round 5)
run tsp4096b3 env EIGSOLVE_CHASE_BATCH3=1 python benchmarks/two_stage_planar.py 4096

# 5. headline re-record after the A/B steps warmed everything (the
#    step-1b run already pre-warmed; this one is the stable repeat)
run bench2 python bench.py

# 6. configs 1-2 (real mixed)
run cfg1 env EIGSOLVE_BENCH_N=1024 EIGSOLVE_BENCH_IU=64 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py
run cfg2 env EIGSOLVE_BENCH_N=4096 EIGSOLVE_BENCH_IU=512 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 7. QE replay fixture through the 4-way harness + QE-spectrum headline
run qe512 python benchmarks/compare.py 512 --dtype z --cases zpl --input benchmarks/qe_n512.npz
run qe4096 env EIGSOLVE_BENCH_SPECTRUM=qe EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 7b. planar-solve A/B: full inv(L) reused across phases 2/4 as gemms
#     (re-measure of the round-2 negative result -- the pipeline changed)
run trinv env EIGSOLVE_BENCH_PSOLVE=trinv EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 7c. real-driver trinv A/B at config 2 (vs the 370.4 ms sygst_inv run)
run cfg2trinv env EIGSOLVE_BENCH_N=4096 EIGSOLVE_BENCH_IU=512 EIGSOLVE_BENCH_DTYPE=float64 EIGSOLVE_BENCH_SYGST=trinv EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 7d. pchol-kernel A/B: fused Mosaic diag-block Cholesky vs the two
#     nb-step XLA loops (expected ~50 ms off the headline's 61 ms stage)
run nopchol env EIGSOLVE_NO_PCHOL_KERNEL=1 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 8. headline refinement A/B: 2 sweeps (1 fp32 + 1 fp64) vs default 3 --
#    checks whether a coarse sweep can be dropped without moving the
#    residual off ~1e-17 (escalation gate still active)
run sweep2 env EIGSOLVE_BENCH_SWEEPS=2 EIGSOLVE_BENCH_SKIP_CPU=1 python bench.py

# 9. config-1 device-time attribution: amortize the ~28 ms call floor
#    with k=8 in-jit stage loops (VERDICT weak #7)
run stages1024 env EIGSOLVE_STAGES_LOOPK=8 python benchmarks/stages_mixed.py 1024 64

# 10. headline per-stage re-profile: driver-true solve forms (block-inv),
#     trinv build/gemm rows, floor-amortized device times
run stagesplanar env EIGSOLVE_STAGES_LOOPK=4 python benchmarks/stages_planar.py 4096

echo "=== queue done ==="
