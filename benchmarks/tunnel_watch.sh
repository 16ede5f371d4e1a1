#!/usr/bin/env bash
# Poll the TPU tunnel; when it answers, run the round-4 measurement
# queue (benchmarks/run_round4_tpu.sh).  A probe hanging >90 s means
# the tunnel is down (CLAUDE.md fact 6) -- keep waiting.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax; print(jax.devices())" >/tmp/tunnel_probe.log 2>&1; then
    echo "tunnel UP at attempt $i: $(cat /tmp/tunnel_probe.log | tail -1)"
    bash benchmarks/run_round4_tpu.sh 2>&1 | tee /tmp/r4_queue.log
    exit 0
  fi
  echo "attempt $i: tunnel down ($(date -u +%H:%M:%S)); sleeping 120s"
  sleep 120
done
echo "gave up after 200 attempts"
exit 1
