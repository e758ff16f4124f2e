#!/bin/bash
# Round-4 chip-job queue, take 4 — starts immediately (r4c hit QUEUE_DONE).
#   1. PREGO_Q8_DENSE=xla A/B/A: the untried lever against the b8
#      matmul-core launch-overhead gap — route every int8 projection
#      through the TP path's dequant-fused jnp.dot (zero pallas launches)
#      instead of the pallas dequant matmul.  At 7B the xla leg may OOM
#      if XLA hoists the int8->bf16 convert out of the decode while_loop
#      (that is itself the answer); the 1B leg always fits and isolates
#      the fusion-vs-materialize question.
#   2. Same-window CB overlap A/B/A at the flagship s16 ctx burst — the
#      r4c 477.9 tok/s reading was cross-window vs the 458.9/407.8
#      baselines, so the overlap-default decision needs this.
#   3. CB anticipation step at PREGO_CB_CHUNK=4 — probe the ~20% per-step
#      CB premium (budget-retirement slack within chunks).
#   nohup setsid bash scripts/chipq_r4d.sh > /tmp/chipq_r4d.log 2>&1 &
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
  timeout 5400 "$@"
  echo "#### rc=$? $(date -u +%H:%M:%S)"
  sleep 20
}

# q8 dense backend A/B/A at 7B b1 (weight-stream-bound: fusion behavior
# shows directly; xla leg may OOM — that is a result, not a failure)
run python scripts/bench_llm.py --case decode_7b_int8 --watchdog 2400
run env PREGO_Q8_DENSE=xla python scripts/bench_llm.py --case decode_7b_int8 --watchdog 2400
run python scripts/bench_llm.py --case decode_7b_int8 --watchdog 2400

# q8 dense backend A/B/A at the 7B b8 serving config (the 1.24 ms gap)
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run env PREGO_Q8_DENSE=xla python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400
run python scripts/bench_llm.py --case decode_7b_b8_int8_kv8 --watchdog 2400

# 1B-shape leg (always fits beside a bf16 copy of the weights)
run env PREGO_Q8_DENSE=xla python scripts/bench_llm.py --case decode_b8_int8 --watchdog 2400
run python scripts/bench_llm.py --case decode_b8_int8 --watchdog 2400

# CB overlap same-window A/B/A on the flagship ctx burst
run python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400
run env PREGO_CB_OVERLAP=1 python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400

# CB anticipation-step premium: control + chunk 4
run python scripts/bench_llm.py --case anticipation_step_7b_cb_sb2 --watchdog 2400
run env PREGO_CB_CHUNK=4 python scripts/bench_llm.py --case anticipation_step_7b_cb_sb2 --watchdog 2400

echo QUEUE_DONE
