#!/bin/bash
# Round-5 chip-job queue, take 2.  Waits for chipq_r5a's QUEUE_DONE.
# (1) composed spec step self32 RERUN: the r5a leg OOM'd (21.3G>15.75G)
#     because the full-depth self-draft allocated a bf16 draft KV cache;
#     the draft now inherits int8-KV.
# (2) piggyback threshold sweep on the ALIGNED ctx burst (suffix = bare
#     5-40-token tails, the claimed win regime): 0 / 40 / 0 / 16, one
#     weather window.  Decides whether the default stays 4 or moves.
# (3) on-chip SAMPLED verdict A/B (VERDICT r4 #5): spec + CB legs vs a
#     reseeded plain noise floor, product settings (T=0.6, num_samples^2).
# (4) full bench.py validation (round-end rehearsal with the new extras).
#   nohup setsid bash scripts/chipq_r5b.sh > /tmp/chipq_r5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "waiting for chipq_r5a QUEUE_DONE"
for i in $(seq 1 200); do
  grep -qx QUEUE_DONE /tmp/chipq_r5a.log 2>/dev/null && break
  sleep 60
done
grep -qx QUEUE_DONE /tmp/chipq_r5a.log 2>/dev/null || echo "r5a sentinel missing; proceeding"

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

run python scripts/bench_llm.py --case anticipation_step_7b_spec_self32_k4 --watchdog 2400

# piggyback sweep, aligned-ctx burst, one weather window
run env PREGO_CB_PIGGYBACK=0 python scripts/bench_llm.py --case serving_cb_7b_s16_ctxa --watchdog 2400
run env PREGO_CB_PIGGYBACK=40 python scripts/bench_llm.py --case serving_cb_7b_s16_ctxa --watchdog 2400
run env PREGO_CB_PIGGYBACK=0 python scripts/bench_llm.py --case serving_cb_7b_s16_ctxa --watchdog 2400
run env PREGO_CB_PIGGYBACK=16 python scripts/bench_llm.py --case serving_cb_7b_s16_ctxa --watchdog 2400

run python scripts/ab_sampled_verdicts.py --fabricated 7b --quantize --kv_quant --videos 8

run python bench.py

echo QUEUE_DONE
