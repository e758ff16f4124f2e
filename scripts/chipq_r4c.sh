#!/bin/bash
# Round-4 chip-job queue, take 3 — chains after chipq_r4b. The e2e
# PREGO_Q8_NBLOCK A/B/A (the op-level sweep is RTT-bound over the
# tunnel; the decision instrument is the full decode step), the CB
# overlap/chunk knobs on the flagship ctx burst, the CB-routed 7B
# anticipation step, the 13B T_BLOCK check, and a full bench.py
# validation at HEAD.
#   nohup setsid bash scripts/chipq_r4c.sh > /tmp/chipq_r4c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r4b QUEUE_DONE"
until grep -qx QUEUE_DONE /tmp/chipq_r4b.log 2>/dev/null; do sleep 60; done
echo "r4b done; starting r4c"

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

# e2e n_block A/B/A at the 7B b8 serving config
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run env PREGO_Q8_NBLOCK=256 python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run env PREGO_Q8_NBLOCK=1024 python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400

# CB knobs on the flagship ctx burst
run env PREGO_CB_OVERLAP=1 python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400
run env PREGO_CB_CHUNK=16 python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400

# the 7B anticipation step through the CB backend (vs r4b's sb2 control)
run python scripts/bench_llm.py --case anticipation_step_7b_cb_sb2 --watchdog 2400

# 13B b8: control + T_BLOCK=128
run python scripts/bench_llm.py --case decode_13b_b8_int8_kv8 --watchdog 2400
run env PREGO_T_BLOCK=128 python scripts/bench_llm.py --case decode_13b_b8_int8_kv8 --watchdog 2400

# full driver-shaped bench validation at HEAD (headline + all extras)
run python bench.py

echo QUEUE_DONE
