#!/bin/bash
# Round-4 chip-job queue, take 1 — the CB v2 serving burst (prefix-sharing
# admission, warmed compiles), the PREGO-shaped shared-context variants,
# the int8 matmul n_block sweep (VERDICT r3 #3), and the flat-head
# verdict-level A/B spot check (VERDICT r3 #7).
#   nohup setsid bash scripts/chipq_r4a.sh > /tmp/chipq_r4a.log 2>&1 &
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

# CB v2 vs static, PREGO-shaped (4 shared 300-token contexts) and mixed
run python scripts/bench_llm.py --case serving_cb_7b_ctx --watchdog 2400
run python scripts/bench_llm.py --case serving_static_7b_ctx --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b --watchdog 2400
run python scripts/bench_llm.py --case serving_static_7b --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400

# int8 matmul tile sweep at the 7B decode shapes (b8 and b1)
run python scripts/sweep_q8_nblock.py --batch 8 --shape 7b
run python scripts/sweep_q8_nblock.py --batch 1 --shape 7b

# flat-vs-perhead VERDICT-level A/B at the 7B serving config (greedy)
run python scripts/ab_flat_verdicts.py --fabricated 7b --quantize --kv_quant --videos 12

echo QUEUE_DONE
