#!/usr/bin/env bash
# Canonical test-suite entry: the suite in 4 fresh pytest processes.
#
# Why not one process: (a) a long single-process run segfaults inside
# XLA CPU compile/serialize of the large stedc-family programs once the
# process has accumulated ~2/3 of the suite (see tests/conftest.py), and
# (b) on multi-core CI the shards can run in parallel (EIGSOLVE_SHARD_PAR=1)
# -- each shard uses its own compile-cache subdir, because concurrent
# processes sharing one cache dir race in the cache read/write.
#
# Usage:
#   tests/run_sharded.sh              # sequential (1-CPU safe)
#   EIGSOLVE_SHARD_PAR=1 tests/run_sharded.sh   # parallel shards
set -u
cd "$(dirname "$0")/.."

# Shard layout balanced by measured durations (round 4), with one
# compile-amortization constraint (round 5): ALL of the bucketed
# mixed-planar pipeline tests (test_planar_pipeline + the two-stage
# mixed variant) run in ONE process -- the n-independent mixed-pipeline
# program costs ~150 s of XLA CPU compile cold, and a second mixed
# variant in the same process compiles in ~74 s (shared sub-programs).
# Splitting them across shards pays the full cost twice.
SHARD1="tests/test_sygvdx.py tests/test_api_edges.py"
SHARD2="tests/test_stedc.py tests/test_stedc_fuzz.py tests/test_qe_fixture.py tests/test_bench_probe.py tests/test_kernel_guard.py"
SHARD3="tests/test_planar_pipeline.py tests/test_planar_two_stage.py tests/test_planar.py tests/test_refine.py"
SHARD4="tests/test_parallel.py tests/test_batched.py tests/test_sytrd.py tests/test_sygst.py tests/test_trsm.py tests/test_complex_embed.py tests/test_jacobi.py tests/test_ozaki.py tests/test_utils.py tests/test_chase_pallas.py tests/test_latrd_pallas.py tests/test_replay_pallas.py tests/test_sbrd.py tests/test_symv_pallas.py tests/test_ql_panel_pallas.py tests/test_pchol_pallas.py"

# Sequential shards share ONE compile-cache dir (no concurrency -> no
# zstd race): separately-jitted stages that recur across shards
# (cholesky, sygst, trsm, stedc leaves, refine blocks) cross-hit
# instead of recompiling per shard.  Parallel mode keeps per-shard
# dirs -- concurrent processes sharing a dir race and corrupt it.
run_shard() {
  local idx="$1"; shift
  local sub="seq"
  [ "${EIGSOLVE_SHARD_PAR:-}" = "1" ] && sub="shard$idx"
  EIGSOLVE_TEST_CACHE_SUBDIR="$sub" \
    python -m pytest $* -q -p no:cacheprovider --durations=10
}

fail=0
if [ "${EIGSOLVE_SHARD_PAR:-}" = "1" ]; then
  pids=()
  run_shard 1 $SHARD1 & pids+=($!)
  run_shard 2 $SHARD2 & pids+=($!)
  run_shard 3 $SHARD3 & pids+=($!)
  run_shard 4 $SHARD4 & pids+=($!)
  for p in "${pids[@]}"; do wait "$p" || fail=1; done
else
  run_shard 1 $SHARD1 || fail=1
  run_shard 2 $SHARD2 || fail=1
  run_shard 3 $SHARD3 || fail=1
  run_shard 4 $SHARD4 || fail=1
fi
exit $fail
