#!/bin/bash
# Round-5 chip-job queue, take 1.
# (1) reconcile_7b_b1: the BENCH_r04 self-contradiction read as an
#     interleaved same-process pair (VERDICT r5 task 1).
# (2) CB piggyback-admission same-window A/B/A at the flagship s16 ctx
#     burst (VERDICT task 2): control (PREGO_CB_PIGGYBACK=0, dedicated
#     prefill) / piggyback default / control.
# (3) spec re-reads at reps=5 with weather + spread (task 7): oracle k4
#     and full-depth self-draft.
# (4) speculation composed with the anticipation step (task 3): self32
#     ceiling + self16 deployable bracket, plain leg in-process.
# (5) batched-oracle spec at b8/b16 (task 3's CB-x-spec decision input).
# (6) int8x8 xla-dense A/B at b1 (task 6; the b8 pair landed in r4h:
#     12.93 pallas -> 11.80 xla).
#   nohup setsid bash scripts/chipq_r5a.sh > /tmp/chipq_r5a.log 2>&1 &
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

run python scripts/bench_llm.py --case reconcile_7b_b1 --watchdog 2400

# CB piggyback A/B/A, one weather window
run env PREGO_CB_PIGGYBACK=0 python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400
run python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400
run env PREGO_CB_PIGGYBACK=0 python scripts/bench_llm.py --case serving_cb_7b_s16_ctx --watchdog 2400

run python scripts/bench_llm.py --case spec_decode_7b_oracle_k4 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_self32_k4 --watchdog 2400

run python scripts/bench_llm.py --case anticipation_step_7b_spec_self32_k4 --watchdog 2400
run python scripts/bench_llm.py --case anticipation_step_7b_spec_self16_k4 --watchdog 2400

run python scripts/bench_llm.py --case spec_decode_7b_b8_oracle_k4 --watchdog 2400
run python scripts/bench_llm.py --case spec_decode_7b_b16_oracle_k4 --watchdog 2400

# int8x8 b1: control (pallas default) then env-forced xla, one window
run python scripts/bench_llm.py --case decode_7b_int8x8 --watchdog 2400
run env PREGO_Q8_DENSE=xla python scripts/bench_llm.py --case decode_7b_int8x8 --watchdog 2400

echo QUEUE_DONE
