#!/bin/bash
# Round-3 chip-job queue, take 17 — 16-slot serving burst: flat-head
# made the b16 decode marginal nearly batch-flat, so a 16-slot
# continuous batcher should nearly double useful tok/s on a deep burst
# (48 mixed-length requests; static 16-wide baseline for the pair).
#   nohup setsid bash scripts/chipq_r3q.sh > /tmp/chipq_r3q.log 2>&1 &
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

run() {
  wait_for_tunnel
  echo
  echo "#### $(date -u +%H:%M:%S) $*"
  timeout 3600 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

run python scripts/bench_llm.py --case serving_static_7b_s16 --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b_s16 --watchdog 2400

echo QUEUE_DONE
