#!/bin/bash
# Round-4 chip-job queue, take 9 — chains after chipq_r4h.
# Re-measure the speculative-decoding endpoints after the bonus-token
# change ((B,k+1) verify, a+1 tokens per round): expected oracle k4
# ~316 -> ~395 (x5/4), k8 ~563 -> ~634 (x9/8); self32 0.72x -> ~0.83x
# (emits k+1 per round at ~equal per-round cost); draft1b floor dips
# slightly (k+1 draft steps per round at acceptance 0).
#   nohup setsid bash scripts/chipq_r4i.sh > /tmp/chipq_r4i.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r4h QUEUE_DONE"
until grep -qx QUEUE_DONE /tmp/chipq_r4h.log 2>/dev/null; do sleep 60; done
echo "r4h done; starting r4i"

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
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

run python scripts/bench_llm.py --case spec_decode_7b_oracle_k8 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_oracle_k4 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_self32_k4 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_draft1b_k4 --watchdog 2400

echo QUEUE_DONE
