#!/bin/bash
# Round-3 chip-job queue, take 11 — serving-loop + sweep-edge cases:
#   1. Continuous batching vs reference-style static batching on the
#      same 32-request mixed-length burst (serving_cb_7b vs
#      serving_static_7b), control then flat-attention variant.
#   2. b64 throughput edge (4.3 GB int8 KV + 6.6 GB weights), control
#      then flat — does tok/s keep climbing past b32's 1,592?
#   3. The q8-fusion b1 e2e decision pair the r3g weather killed:
#      A/B/A back-to-back in one window.
# Strictly SEQUENTIAL; waits for chipq_r3j's QUEUE_DONE sentinel.
#   bash scripts/chipq_r3k.sh 2>&1 | tee /tmp/chipq_r3k.log
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 720); do
  grep -q QUEUE_DONE /tmp/chipq_r3j.log 2>/dev/null && break
  sleep 30
done
grep -q QUEUE_DONE /tmp/chipq_r3j.log 2>/dev/null || {
  echo "r3j never finished; aborting"; exit 1; }

wait_for_tunnel() {
  for i in $(seq 1 60); do
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

# 1. the serving burst: static baseline, then CB, then CB+flat
run python scripts/bench_llm.py --case serving_static_7b --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b --watchdog 2400
run env PREGO_HEAD_GROUP=32 \
    python scripts/bench_llm.py --case serving_cb_7b --watchdog 2400

# 2. b64 edge: control then flat
run python scripts/bench_llm.py --case decode_7b_b64_int8_kv8 --watchdog 1800
run env PREGO_HEAD_GROUP=32 \
    python scripts/bench_llm.py --case decode_7b_b64_int8_kv8 --watchdog 1800

# 3. q8-fusion b1 e2e A/B/A in one weather window
run python scripts/bench_llm.py --case decode_7b_int8 --watchdog 1200
run env PREGO_FUSED_FFN_Q8=1 PREGO_FUSED_LAYER=1 PREGO_FUSED_DENSE_Q8=1 \
    python scripts/bench_llm.py --case decode_7b_int8 --watchdog 1200
run python scripts/bench_llm.py --case decode_7b_int8 --watchdog 1200

echo QUEUE_DONE
