#!/bin/bash
# Round-3 chip-job queue, take 12 — post-default-flip validation + the
# take-11 jobs the VM reboot killed:
#   1. anticipation_step_7b_int8_kv8_sb2 at HEAD (flat-head now the
#      default: expect ~135 ms vs the 184.9 pre-flat best).
#   2. The q8-fusion b1 e2e decision pair, A/B/A in one window
#      (decode_7b_int8 is now flat-by-default in both legs).
#   3. Serving burst: reference-style static batching vs continuous
#      batching on the same 32-request mixed-length burst.
#   4. b64 throughput edge (4.3 GB int8 KV + 6.6 GB weights).
# Strictly SEQUENTIAL, one job per process, sleep 20 between (async HBM
# free), tunnel probe before each job.
#   bash scripts/chipq_r3l.sh 2>&1 | tee /tmp/chipq_r3l.log
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

# 1. the driver-attested 7B anticipation case at HEAD defaults
run python scripts/bench_llm.py --case anticipation_step_7b_int8_kv8_sb2 --watchdog 2400

# 2. q8-fusion b1 e2e A/B/A in one weather window
run python scripts/bench_llm.py --case decode_7b_int8 --watchdog 1200
run env PREGO_FUSED_FFN_Q8=1 PREGO_FUSED_LAYER=1 PREGO_FUSED_DENSE_Q8=1 \
    python scripts/bench_llm.py --case decode_7b_int8 --watchdog 1200
run python scripts/bench_llm.py --case decode_7b_int8 --watchdog 1200

# 3. the serving burst: static baseline, then CB (both flat-by-default)
run python scripts/bench_llm.py --case serving_static_7b --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b --watchdog 2400

# 4. b64 edge at HEAD defaults
run python scripts/bench_llm.py --case decode_7b_b64_int8_kv8 --watchdog 1800

echo QUEUE_DONE
