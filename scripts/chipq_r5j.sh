#!/bin/bash
# Round-5 chip-job queue, take 10 — final end-of-round builder validation
# of the exact driver bench command on an idle chip (the r5a validation
# ran during the queue-contention window; this is the clean one the
# RESULTS verification paragraph quotes).
#   nohup setsid bash scripts/chipq_r5j.sh > /tmp/chipq_r5j.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

wait_for_tunnel() {
  for i in $(seq 1 30); do
    if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "tunnel live (probe $i)"; return 0
    fi
    echo "tunnel dark (probe $i), waiting 120s"
    sleep 120
  done
  echo "tunnel still dark after all probes; proceeding anyway"
}

wait_for_tunnel
echo
echo "#### $(date -u +%H:%M:%S) python bench.py"
timeout 5400 python bench.py
echo "#### rc=$? $(date -u +%H:%M:%S)"

echo QUEUE_DONE
