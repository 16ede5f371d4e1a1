#!/usr/bin/env bash
# Poll the TPU tunnel; the moment it answers, run the round-4 queue.
# Exits 0 after the queue completes, 1 if the tunnel never came up.
set -u
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + ${WATCH_BUDGET_S:-39600} ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 75 python -c "import jax; print(jax.devices())" >/tmp/tunnel_probe.log 2>&1; then
    echo "tunnel UP at $(date -u +%H:%M:%S): $(cat /tmp/tunnel_probe.log)"
    bash benchmarks/run_round4_tpu.sh 2>&1 | tee /tmp/r4_queue.log
    exit 0
  fi
  echo "tunnel down at $(date -u +%H:%M:%S); sleeping 240s"
  sleep 240
done
echo "tunnel never came up within budget"
exit 1
