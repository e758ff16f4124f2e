#!/bin/bash
# Round-4 chip-job queue, take 6 — chains after chipq_r4e.
#   1. Retry the spec-decode oracle endpoints: the r4e legs died on a
#      hard `oracle == plain greedy` assert that bf16 breaks (the
#      1-token decode path and the (B,k) verify forward flip a few
#      near-tie argmaxes — the flat-head flip class). bench_spec_decode
#      now bootstraps a FIXED-POINT oracle (replay the spec path's own
#      output until stable) and reports greedy_match_vs_plain instead
#      of asserting.
#   2. Self-draft endpoints: self16 (half-depth real draft cost,
#      acceptance ~0 on random weights) and self32 (the draft IS the
#      target — acceptance ~1 with REAL draft-loop cost, the honest
#      upper bracket vs the oracle's zero-cost ceiling). Zero extra
#      weight HBM either way (shared arrays).
#   nohup setsid bash scripts/chipq_r4f.sh > /tmp/chipq_r4f.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r4e QUEUE_DONE"
until grep -qx QUEUE_DONE /tmp/chipq_r4e.log 2>/dev/null; do sleep 60; done
echo "r4e done; starting r4f"

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
run python scripts/bench_llm.py --case spec_decode_7b_self16_k4 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_self32_k4 --watchdog 2400

echo QUEUE_DONE
