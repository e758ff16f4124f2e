#!/bin/bash
# Round-4 chip-job queue, take 7 — chains after chipq_r4f.
# HEAD-defaults confirmation after the two default flips (int8 dense ->
# xla at >=4096-dim projections; CB overlap_fetch -> ON for device
# backends): each case runs UN-enved and should reproduce the winning
# A/B legs (7B b1 ~9.9, b8 ~11.7, 13B b1 ~19.6, step sb2 ~128,
# CB s16 ~480), proving the default wiring end-to-end. Then one full
# bench.py validation with the round-4 extras set (incl. the new
# spec_decode_7b_oracle_k4 row).
#   nohup setsid bash scripts/chipq_r4g.sh > /tmp/chipq_r4g.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r4f QUEUE_DONE"
until grep -qx QUEUE_DONE /tmp/chipq_r4f.log 2>/dev/null; do sleep 60; done
echo "r4f done; starting r4g"

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

run python scripts/bench_llm.py --case decode_7b_int8 --watchdog 2400
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run python scripts/bench_llm.py --case decode_13b_int8 --watchdog 2400
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400
run python bench.py

echo QUEUE_DONE
