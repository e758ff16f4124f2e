#!/bin/bash
# Round-3 chip-job queue, take 7 — retries on the post-a4b4463 build:
# 13B+kv8 now compiles with fori_loop heads (40-head unrolled body is
# the stall suspect); b16/b32 run UNfolded (auto-gate restricted to
# batch<=8); train b16 re-measured outside the earlier slow patch.
#   bash scripts/chipq_r3g.sh 2>&1 | tee /tmp/chipq_r3g.log
set -u
cd "$(dirname "$0")/.."


wait_for_tunnel() {
  # the tunnel has multi-hour dark patches; do not burn per-job timeouts
  # against a dead backend — probe with a tiny op until it answers
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

run python scripts/bench_llm.py --case decode_13b_int8_kv8 --watchdog 1800
run python scripts/bench_llm.py --case decode_7b_b16_int8_kv8 --watchdog 1200
run python scripts/bench_llm.py --case decode_7b_b32_int8_kv8 --watchdog 1200
run python scripts/bench_train.py --batch 16 --reps 50

# b1 q8-fusion END-TO-END A/B (the ladder measured -2.7% marginal for
# +allq8 at b1; decide the default flip only if e2e also wins)
run python scripts/bench_llm.py --case decode_7b_int8
run env PREGO_FUSED_FFN_Q8=1 PREGO_FUSED_DENSE_Q8=1 \
    python scripts/bench_llm.py --case decode_7b_int8

# driver-shaped bench.py at HEAD (validates the sb2 extra end-to-end;
# the r3e slot for this died against the dark tunnel)
run python bench.py

echo QUEUE_DONE
