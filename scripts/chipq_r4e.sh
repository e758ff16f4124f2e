#!/bin/bash
# Round-4 chip-job queue, take 5 — chains after chipq_r4d.
#   1. Speculative decoding on chip (7B int8+kv8, b1): oracle-replay
#      ceiling at k=8/k=4 (acceptance 1 — how fast the verify path can
#      emit), and the 1B-bf16-draft floor at k=4 (acceptance ~0 on
#      fabricated weights — the all-overhead endpoint).  Plain-greedy
#      baseline is measured inside each case, same process/window.
#   2. PREGO_Q8_DENSE=xla at 13B b1 (control first) — the b1 win at 7B
#      (9.93 vs 10.32/10.52) should grow with weight-stream dominance.
#   3. PREGO_Q8_DENSE=xla on the 7B anticipation step (prefill + mixed
#      shapes through the XLA dense path).
#   nohup setsid bash scripts/chipq_r4e.sh > /tmp/chipq_r4e.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r4d QUEUE_DONE"
until grep -qx QUEUE_DONE /tmp/chipq_r4d.log 2>/dev/null; do sleep 60; done
echo "r4d done; starting r4e"

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

# speculative decoding endpoints at the 7B serving shape
run python scripts/bench_llm.py --case spec_decode_7b_oracle_k8 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_oracle_k4 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_draft1b_k4 --watchdog 2400

# q8 dense backend at 13B b1
run python scripts/bench_llm.py --case decode_13b_int8 --watchdog 2400
run env PREGO_Q8_DENSE=xla python scripts/bench_llm.py --case decode_13b_int8 --watchdog 2400

# q8 dense backend on the 7B anticipation step (sb2)
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 2400
run env PREGO_Q8_DENSE=xla python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 2400

echo QUEUE_DONE
