#!/bin/bash
# Round-4 chip-job queue, take 8 — chains after chipq_r4g.
# (1) HEAD-defaults confirmation at the batch shapes r4g skipped: the
# recorded b16/b32/b64 and 13B-b8 numbers (15.11 / 20.10 / 32.32 /
# 27.92 ms/step) all predate the xla-dense default flip, so the table
# rows need re-reads at HEAD.  (2) The one unmeasured gate: the int8x8
# activation path keeps pallas unless env-forced — a control/xla pair
# at 7B b8 either flips or seals that carve-out (the xla route is the
# int32-dot reference dequant-fused form).
#   nohup setsid bash scripts/chipq_r4h.sh > /tmp/chipq_r4h.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r4g QUEUE_DONE"
until grep -qx QUEUE_DONE /tmp/chipq_r4g.log 2>/dev/null; do sleep 60; done
echo "r4g done; starting r4h"

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

run python scripts/bench_llm.py --case decode_7b_b16_int8_kv8 --watchdog 2400
run python scripts/bench_llm.py --case decode_7b_b32_int8_kv8 --watchdog 2400
run python scripts/bench_llm.py --case decode_7b_b64_int8_kv8 --watchdog 2400
run python scripts/bench_llm.py --case decode_13b_b8_int8_kv8 --watchdog 2400
# int8x8 A/B: control (pallas default) then env-forced xla, one window
run python scripts/bench_llm.py --case decode_7b_b8_int8x8 --watchdog 2400
run env PREGO_Q8_DENSE=xla python scripts/bench_llm.py --case decode_7b_b8_int8x8 --watchdog 2400

echo QUEUE_DONE
